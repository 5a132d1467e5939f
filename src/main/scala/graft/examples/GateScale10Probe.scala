package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables, Verify}
import graft.llm.Similarity

/** Recall-gate rehearsal at 10× the bench corpus: amplify sf0.1 into a
  * 50k-document / 20k-embedding corpus on disk, then run the SELF-GATED
  * dedup/similarity queries (d02–d05, s02) against it UNCHANGED — same
  * dials tuned at sf0.01–0.1 — and report whether each in-query recall
  * gate still holds plus the wall-clock. s04's corpus cap (500, the
  * quadratic-twin guard) is lifted to 5000 inline here so its gate is
  * also rehearsed at 10×.
  *
  * Amplification preserves the gate semantics: doc ids stay < 10⁶ (the
  * marker-injection offset of the gated queries), per-copy alphabet
  * rotation keeps the near-dup structure per copy constant (verbatim
  * copies would quadratically grow the true pair count), and embedding
  * copies are perturbed per copy so cross-copy vectors are near- but not
  * exact duplicates. */
object GateScale10Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val amp = "/tmp/graft_amp10"
    val copies = 10
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10000000L).selectExpr("sum(id)").collect()

    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val docs = Tables.t(spark, dir, "documents")
    val nDocs = docs.count()
    (0 until copies).map { i =>
      val rot = alpha.drop(i % 26) + alpha.take(i % 26)
      docs.select((col("doc_id") + lit(i * nDocs)).as("doc_id"),
        translate(lower(col("text")), alpha, rot).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$amp/documents.parquet")
    val emb = Tables.t(spark, dir, "embeddings")
    val nEmb = emb.count()
    (0 until copies).map { i =>
      emb.select((col("vec_id") + lit(i * nEmb)).as("vec_id"),
        transform(col("embedding"), x => (x + lit(i * 0.001)).cast("float"))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$amp/embeddings.parquet")
    println(s"[gate10] amplified corpus: ${nDocs * copies} docs, " +
      s"${nEmb * copies} embeddings")

    def show(name: String, df: DataFrame, dt: Double): Unit = {
      val row = df.limit(1).collect().headOption.map(_.toString).getOrElse("∅")
      println(f"[gate10] $name%-26s $dt%6.1f s  $row")
    }
    for (name <- Seq("d02_minhash_lsh_pairs", "d03_simhash_pairs",
        "d04_ngram_jaccard_pairs", "d05_dup_clusters", "s02_cosine_topk_lsh")) {
      val t0 = System.nanoTime()
      val out = SparkEntry.queries(name)(spark, amp)
      val n = out.count()
      val dt = (System.nanoTime() - t0) / 1e9
      show(s"$name (rows=$n)", out, dt)
      spark.catalog.clearCache()
    }

    // s04 at 10×: lift the quadratic-twin cap from 500 to 5000 vectors
    val t0 = System.nanoTime()
    val e = Tables.t(spark, amp, "embeddings").filter(col("vec_id") < 5000)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val withDups = e.unionByName(e.filter(col("vec_id") % 4 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.05)).as("embedding")))
      .localCheckpoint()
    val exact = Similarity.nearDupPairsExact(withDups, threshold = 0.9)
      .select(col("id_a"), col("id_b"))
    val approx = Similarity.nearDupPairs(withDups, threshold = 0.9, dim = 64,
        bits = 6, tables = 4)
      .select(col("id_a"), col("id_b"), lit(1).as("hit"))
    val gate = exact.join(approx, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_exact"),
        (sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1))
          >= 0.6).as("recall_ok"),
        round(sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)), 3)
          .as("recall"))
    show("s04_embed_neardup_lsh@5000", gate, (System.nanoTime() - t0) / 1e9)
    spark.stop()
  }
}
