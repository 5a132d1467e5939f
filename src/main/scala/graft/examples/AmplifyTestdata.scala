package graft.examples

import org.apache.spark.sql.functions._
import graft.Verify

/** Materialize an sf1-equivalent dataset (10× sf0.1) on disk so the FULL
  * query suite can be rehearsed at the next scale step: dimension tables
  * copied verbatim, fact tables unioned `copies`× with key shifts that
  * preserve referential integrity (order keys shift in orders AND
  * lineitem; customer/part/supplier FKs stay valid), documents amplified
  * with per-copy alphabet rotation (keeps the near-dup pair structure per
  * copy CONSTANT — verbatim copies would grow true-pair counts
  * quadratically and ruin the recall-gate comparison), embeddings with
  * per-copy perturbation (near- but not exact duplicates across copies).
  * Doc ids stay far below the 10⁶ marker-injection offset the gated
  * queries use. Usage: `runMain graft.examples.AmplifyTestdata <outDir>`.
  */
object AmplifyTestdata {
  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val out = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val copies = 10
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[amplify] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(t)(read(t)))

    val keyShift = 10000000L // far above any sf0.1 order key
    write("orders")((0 until copies).map { i =>
      read("orders").withColumn("o_orderkey", col("o_orderkey") + lit(i * keyShift))
    }.reduce(_ unionByName _))
    write("lineitem")((0 until copies).map { i =>
      read("lineitem").withColumn("l_orderkey", col("l_orderkey") + lit(i * keyShift))
    }.reduce(_ unionByName _))

    // events: ts surfaces as nanos-long (Verify.session sets nanosAsLong);
    // writing the long back keeps Tables.t's conversion path identical.
    // Each copy shifts event ids and offsets user ids so per-user event
    // volume (the sessionize/window grain) stays constant.
    val ev = read("events")
    val nUsers = ev.agg(max(col("user_id"))).collect()(0).getLong(0) + 1
    write("events")((0 until copies).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i * keyShift))
        .withColumn("user_id", col("user_id") + lit(i * nUsers))
    }.reduce(_ unionByName _))

    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val docs = read("documents")
    val nDocs = docs.count()
    write("documents")((0 until copies).map { i =>
      val rot = alpha.drop(i % 26) + alpha.take(i % 26)
      docs.select((col("doc_id") + lit(i * nDocs)).as("doc_id"),
        translate(lower(col("text")), alpha, rot).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _))

    val emb = read("embeddings")
    val nEmb = emb.count()
    write("embeddings")((0 until copies).map { i =>
      emb.select((col("vec_id") + lit(i * nEmb)).as("vec_id"),
        transform(col("embedding"), x => (x + lit(i * 0.001)).cast("float"))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _))
    spark.stop()
  }
}
