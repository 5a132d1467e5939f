package graft.examples

import org.apache.spark.sql.functions._
import graft.Verify

/** Materialize an sf1-equivalent dataset (10× sf0.1) on disk so the FULL
  * query suite can be rehearsed at the next scale step: dimension tables
  * copied verbatim, fact tables unioned `copies`× with key shifts that
  * preserve referential integrity (order keys shift in orders AND
  * lineitem; customer/part/supplier FKs stay valid), documents amplified
  * with a per-copy alphabet PERMUTATION (keeps the near-dup pair structure
  * per copy CONSTANT at any copy count — verbatim copies would grow
  * true-pair counts quadratically and ruin the recall-gate comparison;
  * rotations, the r10 scheme, collide past 26 copies), embeddings with
  * per-copy perturbation (near- but not exact duplicates across copies).
  * Marker-injection offsets are DERIVED from max(doc_id) everywhere
  * (LlmShared.markerOffset, r11), so amplified ids can grow without
  * colliding with planted markers at any scale.
  * Usage: `runMain graft.examples.AmplifyTestdata <outDir> [copies] [srcDir]`
  * — default 10× sf0.1 (= sf1); `100` gives sf10. */
object AmplifyTestdata {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val copies = if (args.length > 1) args(1).toInt else 10
    val src = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[amplify] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(t)(read(t)))

    // every per-copy shift is max(id)+1 FROM THE SOURCE, never an assumed
    // bound or a count(): non-contiguous or larger-than-expected ids would
    // silently collide across copies and corrupt the amplified dataset's
    // dedup/join structure
    def nextAbove(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.agg(max(col(c)).cast("long")).collect()(0).getLong(0) + 1

    // order keys shift by the SAME stride in orders and lineitem
    // (referential integrity), so the stride must clear both key domains
    val orderShift = math.max(nextAbove(read("orders"), "o_orderkey"),
      nextAbove(read("lineitem"), "l_orderkey"))
    write("orders")((0 until copies).map { i =>
      read("orders").withColumn("o_orderkey", col("o_orderkey") + lit(i * orderShift))
    }.reduce(_ unionByName _))
    write("lineitem")((0 until copies).map { i =>
      read("lineitem").withColumn("l_orderkey", col("l_orderkey") + lit(i * orderShift))
    }.reduce(_ unionByName _))

    // events: ts surfaces as nanos-long (Verify.session sets nanosAsLong);
    // writing the long back keeps Tables.t's conversion path identical.
    // Each copy shifts event ids and offsets user ids so per-user event
    // volume (the sessionize/window grain) stays constant.
    val ev = read("events")
    val nUsers = nextAbove(ev, "user_id")
    val eventShift = nextAbove(ev, "event_id")
    write("events")((0 until copies).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i * eventShift))
        .withColumn("user_id", col("user_id") + lit(i * nUsers))
    }.reduce(_ unionByName _))

    val alpha = "abcdefghijklmnopqrstuvwxyz"
    // Per-copy alphabet PERMUTATION (deterministic xorshift Fisher–Yates),
    // not the old rotation: rotations offer only 26 distinct transforms, so
    // at copies > 26 every ~26th copy mapped the same source text to an
    // IDENTICAL string — 100 copies planted 25 hidden verbatim-quadruple
    // groups, the exact quadratic true-pair growth this transform exists to
    // prevent (measured: d05 at sf10 ran 19× sf1 instead of ~10× — the
    // inflation was DATA, not plan). 26! permutations keep cross-copy
    // shingle overlap ≈ 0 at any copy count; uniqueness asserted below.
    // Copy 0 stays identity so the source rows survive verbatim.
    def permOf(i: Int): String =
      if (i == 0) alpha
      else {
        val a = alpha.toCharArray
        var s = 0x9e3779b97f4a7c15L ^ (i * 0x100000001b3L)
        def nxt(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
        var j = a.length - 1
        while (j > 0) {
          val k = ((nxt() >>> 1) % (j + 1)).toInt
          val t = a(j); a(j) = a(k); a(k) = t; j -= 1
        }
        new String(a)
      }
    val perms = (0 until copies).map(permOf)
    require(perms.distinct.size == copies,
      "per-copy alphabet permutations must be pairwise distinct")
    val docs = read("documents")
    val docShift = nextAbove(docs, "doc_id")
    // marker-injection offsets are derived from max(doc_id) in every gated
    // query (LlmShared.markerOffset), so amplified ids cannot collide with
    // planted markers — the old 1e6-guard is gone with the old constant
    write("documents")((0 until copies).map { i =>
      docs.select((col("doc_id") + lit(i * docShift)).as("doc_id"),
        translate(lower(col("text")), alpha, perms(i)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _))

    val emb = read("embeddings")
    val embShift = nextAbove(emb, "vec_id")
    write("embeddings")((0 until copies).map { i =>
      emb.select((col("vec_id") + lit(i * embShift)).as("vec_id"),
        transform(col("embedding"), x => (x + lit(i * 0.001)).cast("float"))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _))
    spark.stop()
  }
}
