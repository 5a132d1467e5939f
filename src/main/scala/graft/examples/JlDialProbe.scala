package graft.examples

import org.apache.spark.sql.functions._

/** Dial sweep for the JL-prefilter top-k (s11): recall@5 vs brute force
  * across (outDim, rerank) on the sf embeddings. Uniform embeddings are
  * the JL worst case — no cluster margin between true neighbors and the
  * pack — so these numbers LOWER-bound what a real embedding corpus gets.
  * Run: sbt 'runMain graft.examples.JlDialProbe [sfDir]'. */
object JlDialProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Verify.session("8")
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val exact = graft.llm.Similarity.bruteForceTopK(emb, q, 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (od <- Seq(16, 24, 32); rr <- Seq(4, 8, 16)) {
      val a = graft.llm.Similarity.jlTopK(emb, q, 5, 64, od, rr)
        .select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"=== outDim=$od rerank=$rr " +
        f"recall=${a.intersect(exact).size.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}
