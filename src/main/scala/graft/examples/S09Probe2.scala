package graft.examples

import org.apache.spark.sql.functions._
import graft.Verify
import graft.llm.Similarity

/** Stage-level s09 diagnosis: coarse cell membership and ADC scores of the
  * TRUE neighbors vs the returned band, for query 1 at sf10. */
object S09Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = emb.filter(col("vec_id") === 1)
    val interesting = Seq(1L, 2001L, 4001L, 6001L, 8001L, 16001L, 18001L, 20001L)

    // mirror ivfTopKPQ's internals via its public pieces
    val cb = Similarity.pqCodebooks(emb, dim = 64, m = 8, codebookSize = 16,
      seed = 42L)
    // coarse cells: same fit as ivfAssignProbe (nlist=8, seed 42)
    val cents = Similarity.kmeansCentroids(emb, 8, 42L, "vec_id", "embedding", 100000)
    val assigned = Similarity.nearestCentroids(emb, cents)
    println("=== coarse cell of interesting ids ===")
    assigned.filter(col("corpus_id").isin(interesting: _*))
      .select("corpus_id", "centroid_id").orderBy("corpus_id").show(20, false)
    println("=== probe cells of query 1 (top 3) ===")
    Similarity.assignTopCentroids(q, cents, 3, "vec_id", "embedding")
      .select("corpus_id", "centroid_id").show(10, false)
    println("=== PQ codes of interesting ids ===")
    emb.filter(col("vec_id").isin(interesting: _*))
      .select(col("vec_id"),
        Similarity.pqEncode(Similarity.l2Normalize(col("embedding")), cb)
          .as("codes"))
      .orderBy("vec_id").show(20, false)
    spark.stop()
  }
}
