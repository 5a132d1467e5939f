package graft.examples
import graft.{Verify, LlmShared}
import org.apache.spark.sql.functions._
/** Decompose minhashNearDupPairs cost: signature build, band-bucket
  * candidate count, and full pair time — the dial evidence for the LSH
  * band geometry at scale (args: sfDir [k] [bands]). */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val bands = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10000000L).selectExpr("sum(id)").collect()
    val docs = LlmShared.docsWithNearDups(spark, sfDir).localCheckpoint()
    println(s"[mh] docs=${docs.count()} k=$k bands=$bands r=${k / bands}")
    var t0 = System.nanoTime()
    val sig = graft.llm.Dedup.minhashSignatures(docs, k).localCheckpoint()
    println(f"[mh] signatures: ${sig.count()} in ${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val banded = sig.select(col("doc_id"),
        posexplode(graft.functions.BandHashes(col("sig"), bands)))
      .select(col("pos").as("band"), col("col").as("bh"), col("doc_id"))
    val a = banded.select(col("band"), col("bh"), col("doc_id").as("id_a"))
    val b = banded.select(col("band"), col("bh"), col("doc_id").as("id_b"))
    val nCand = a.join(b, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().count()
    println(f"[mh] distinct candidate pairs: $nCand in ${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val n = graft.llm.Dedup.minhashNearDupPairs(docs, threshold = 0.5,
      k = k, bands = bands).count()
    println(f"[mh] surviving pairs: $n, full pipeline ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
