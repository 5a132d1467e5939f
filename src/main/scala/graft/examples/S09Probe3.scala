package graft.examples

import org.apache.spark.sql.functions._
import graft.Verify
import graft.llm.Similarity

/** Dial experiment: does a finer PQ (codebookSize / m) restore s09's
  * recall on the sf10 amplified corpus? args: sfDir [codebookSize] [m] [rerank] */
object S09Probe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val cbs = if (args.length > 1) args(1).toInt else 256
    val m = if (args.length > 2) args(2).toInt else 8
    val rr = if (args.length > 3) args(3).toInt else 8
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select(col("query_id"), col("corpus_id"))
    val approx = Similarity.ivfTopKPQ(spark, emb, q, k = 5, dim = 64,
      nlist = 8, nprobe = 3, m = m, codebookSize = cbs, rerank = rr)
      .select(col("query_id"), col("corpus_id"), lit(1).as("h"))
    val r = exact.join(approx, Seq("query_id", "corpus_id"), "left")
      .agg((sum(coalesce(col("h"), lit(0))).cast("double") /
        count(lit(1))).as("recall")).collect()(0).getDouble(0)
    println(f"[probe3] codebookSize=$cbs m=$m rerank=$rr recall=$r%.3f")
    spark.stop()
  }
}
