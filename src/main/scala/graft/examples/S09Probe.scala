package graft.examples

import org.apache.spark.sql.functions._
import graft.Verify
import graft.llm.Similarity

/** Diagnose s09's sf10 recall RED: per-query exact-vs-approx top-5 with
  * cosines, to distinguish a genuine dial failure from rounded-cosine
  * TIE degeneracy on amplified (+0.001·copy) data. */
object S09Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
    val approx = Similarity.ivfTopKPQ(spark, emb, q, k = 5, dim = 64,
      nlist = 8, nprobe = 3, m = 8, codebookSize = 16, rerank = 8)
    println("=== exact top5 (query 0,1) ===")
    exact.filter(col("query_id") < 2)
      .orderBy(col("query_id"), col("rank")).show(20, false)
    println("=== approx top5 (query 0,1) ===")
    approx.filter(col("query_id") < 2)
      .orderBy(col("query_id"), col("rank")).show(20, false)
    // id-recall per query
    val hit = exact.select(col("query_id"), col("corpus_id"))
      .join(approx.select(col("query_id"), col("corpus_id"), lit(1).as("h")),
        Seq("query_id", "corpus_id"), "left")
      .groupBy("query_id").agg(sum(coalesce(col("h"), lit(0))).as("hits"))
    println("=== per-query id-hits of 5 ===")
    hit.orderBy("query_id").show(12, false)
    spark.stop()
  }
}
