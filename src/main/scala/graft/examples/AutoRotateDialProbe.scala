package graft.examples

import org.apache.spark.sql.functions._

/** Measures the statistics behind [[graft.llm.IndexStore.ingestWithDriftGuard]]'s
  * dial at a given scale dir, in the m32 slab shape (boot = ids %4==0,
  * same-dist = %4==1, drifted = %4>=2 shifted +0.5/dim):
  *
  *   - `vs_store(slab2)`   — the same-distribution batch's chi² against the
  *     store. Under amplified (100-copy) corpora this is NOT ≈ dof: every
  *     copy of an original shares its id-mod class, so the between-slab
  *     original-sampling noise is multiplied by the duplication factor
  *     (dt07's measured lesson: 1469.6 at sf10 vs ~5 clean).
  *   - `within(slab2)`     — the id-hash half-vs-half yardstick. Hash
  *     halves split every copy-cluster evenly, so this stays ≈ dof at any
  *     duplication level — which is exactly why it under-calibrates the
  *     between-batch statistic on duplicated data.
  *   - `vs_store(slab3)`   — the genuinely drifted batch's chi².
  *
  * The dial the guard needs: fire only when vs_store beats BOTH the iid
  * yardstick (within) AND the prior accepted batch's recorded vs_store —
  * the second factor is what absorbs duplicate inflation. Measured
  * numbers live in BENCH_LOCAL_r15.md §12 (this probe produced them).
  *
  * Run: tools/run.sh graft.examples.AutoRotateDialProbe <sfDir> */
object AutoRotateDialProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.Similarity
    val emb = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val s1 = emb.filter(col("vec_id") % 4 === 0)
    val s2 = emb.filter(col("vec_id") % 4 === 1)
    val s3 = emb.filter(col("vec_id") % 4 >= 2).select(col("vec_id"),
      transform(col("embedding"), x => x + lit(0.5f)).as("embedding"))
    val rq = Similarity.fitResidualQuantizer(s1, dim = 64, nlist = 8,
      m = 8, codebookSize = 16, seed = 42L)
    def cells(df: org.apache.spark.sql.DataFrame) =
      Similarity.encodeResidual(df, rq).select(col("centroid_id"))
        .localCheckpoint()
    def chi2(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Double =
      graft.exec.DataTests.driftChi2(a, b, "centroid_id")
        .agg(max(col("chi2_stat"))).collect()(0).getDouble(0)
    val store = cells(s1)
    val b2 = cells(s2)
    val b3 = cells(s3)
    // within-halves on the id hash, exactly like the guard computes it
    def withinOf(src: org.apache.spark.sql.DataFrame): Double = {
      val c = Similarity.encodeResidual(src, rq).localCheckpoint()
      chi2(c.filter(pmod(xxhash64(col("corpus_id")), lit(2)) === 0)
          .select(col("centroid_id")),
        c.filter(pmod(xxhash64(col("corpus_id")), lit(2)) === 1)
          .select(col("centroid_id")))
    }
    println(f"[dial] $dir")
    println(f"[dial] slab2 vs_store = ${chi2(store, b2)}%.1f")
    println(f"[dial] slab2 within   = ${withinOf(s2)}%.1f")
    println(f"[dial] slab3 vs_store = ${chi2(store.union(b2), b3)}%.1f")
    println(f"[dial] slab3 within   = ${withinOf(s3)}%.1f")
    spark.stop()
  }
}
