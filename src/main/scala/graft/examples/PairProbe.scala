package graft.examples
import graft.Verify
import graft.LlmShared
import org.apache.spark.sql.functions._
object PairProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = Verify.session("32")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10000000L).selectExpr("sum(id)").collect()
    val docs = LlmShared.docsWithNearDups(spark, sfDir).localCheckpoint()
    docs.count()
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val n = graft.llm.Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5, maxDf = 1000).count()
      println(f"[pairprobe] rep$rep pairs=$n ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
