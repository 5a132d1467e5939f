package graft.examples

import org.apache.spark.sql.functions._
import graft.{Tables, Verify}
import graft.llm.{Dedup, TextOps}

/** Stage-level timing of the slowest bench queries (run at sf0.1). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[perf] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warmup
    spark.range(10000000L).selectExpr("sum(id)").collect()

    val d = Tables.t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val docs = d.unionByName(d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" graftmarker")).as("text")))

    time("docs count")(docs.count())
    time("tokens explode count")(
      docs.select(explode(TextOps.tokens(col("text")))).count())
    time("shingleHashes explode count")(
      Dedup.explodedShingleHashes(docs, 3, "doc_id", "text").count())
    time("minhash signatures (k=64)")(
      Dedup.minhashSignatures(docs, 64).count())
    time("d02 full (2nd run of sig via persist)")(
      Dedup.minhashNearDupPairs(docs, 0.5, 64, 16).count())
    time("d03 simhash fp only")(Dedup.simhash(docs).count())
    time("d03 full")(Dedup.simhashNearDupPairs(docs, 3).count())
    time("d04 full")(Dedup.ngramJaccardPairs(docs, 3, 0.5, 1000).count())
    time("d04 full again (warm)")(
      Dedup.ngramJaccardPairs(docs, 3, 0.5, 1000).count())
    time("t02 fps only")(TextOps.winnowFingerprints(docs).count())
    time("t02 full")(TextOps.winnowNearDupPairs(docs, 20, maxDf = 50).count())
    time("t02 full again (warm)")(
      TextOps.winnowNearDupPairs(docs, 20, maxDf = 50).count())
    time("d02 again (warm)")(
      Dedup.minhashNearDupPairs(docs, 0.5, 64, 16).count())
    spark.stop()
  }
}
