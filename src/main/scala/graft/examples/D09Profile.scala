package graft.examples

import graft.Verify
import graft.llm.{Dedup, TextOps}
import graft.LlmShared
import org.apache.spark.sql.functions._

/** Stage-level timing of d09 (cluster canonicalization) — VERDICT r10 watch
  * item 3: steady cost crept 4.3 → ~5.4 s at sf0.1. Breaks the query into
  * its stages against the SAME checkpointed corpus the query uses, so the
  * report shows where the seconds go: corpus construction + checkpoint,
  * shingle-pair generation (the skew-guarded self-join), connected
  * components (iterative joins), and the final argmax aggregate.
  * Args: sfDir (default /root/testdata/sf0.1), reps (default 3). */
object D09Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10000000L).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d09prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"[d09prof] --- rep $rep ---")
      val docs = time("corpus + checkpoint") {
        val d = LlmShared.docsWithNearDups(spark, sfDir).localCheckpoint()
        d.count(); d
      }
      val pairs = time("shingle pairs (persist+cnt)") {
        val p = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5,
          maxDf = 1000).localCheckpoint()
        p.count(); p
      }
      val cc = time("connected components") {
        val c = Dedup.connectedComponents(pairs).localCheckpoint()
        c.count(); c
      }
      time("quality + argmax keeper") {
        val q = docs.select(col("doc_id"),
          TextOps.qualityScore(col("text")).as("quality"))
        cc.select(col("node").as("doc_id"), col("comp").as("cluster_id"))
          .join(q, Seq("doc_id"))
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("cluster_size"),
            max(struct(col("quality").as("q"), (-col("doc_id")).as("negid")))
              .as("__best"))
          .count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
