package graft.examples
import graft.{Verify, LlmShared}
import org.apache.spark.sql.functions._
/** Stage decomposition of d02 at scale: exact twin, approx pairs, gate join. */
object D02Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10000000L).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d02prof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      r
    }
    val docs = time("corpus+ckpt") {
      val d = LlmShared.docsWithNearDups(spark, sfDir).localCheckpoint(); d.count(); d
    }
    val exact = time("exact twin (ckpt)") {
      val e = graft.llm.Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5,
        maxDf = 1000).select(col("id_a"), col("id_b")).localCheckpoint()
      e.count(); e
    }
    val approx = time("minhash pairs (ckpt)") {
      val a = graft.llm.Dedup.minhashNearDupPairs(docs, threshold = 0.5,
        k = 64, bands = 16).select(col("id_a"), col("id_b"), lit(1).as("hit"))
        .localCheckpoint()
      a.count(); a
    }
    time("gate join+agg") {
      exact.join(approx, Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1))
            >= 0.7).as("recall_ok")).collect()
    }
    spark.stop()
  }
}
