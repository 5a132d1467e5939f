package graft.examples

import org.apache.spark.sql.functions._

/** Measures whether TOTAL-VARIATION distance over cell shares separates
  * "duplication-inflated but same-distribution" batches from genuinely
  * DRIFTED batches — the ambiguity [[graft.llm.IndexStore.ingestWithDriftGuard]]'s
  * chi²-only warm-up cannot break (BENCH_LOCAL_r16.md §3: a chi² clamp
  * false-fired at sf10 because duplication inflates a same-distribution
  * batch's chi² by the duplication factor). TV is scale-free: duplication
  * widens its noise floor by √dup but leaves it centered on the true
  * distributional distance.
  *
  * Same slab shape as [[AutoRotateDialProbe]] (boot = ids %4==0,
  * same-dist = %4==1, drifted = %4>=2 shifted +0.5/dim). Reports, per
  * batch: chi² vs store, TV vs store, and new-cell mass (batch share in
  * cells holding < 1/(4·nlist) of store mass).
  *
  * Run: tools/run.sh graft.examples.DriftSeparatorProbe <sfDir> */
object DriftSeparatorProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.Similarity
    val nlist = 8
    val emb = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val s1 = emb.filter(col("vec_id") % 4 === 0)
    val s2 = emb.filter(col("vec_id") % 4 === 1)
    val s3 = emb.filter(col("vec_id") % 4 >= 2).select(col("vec_id"),
      transform(col("embedding"), x => x + lit(0.5f)).as("embedding"))
    val rq = Similarity.fitResidualQuantizer(s1, dim = 64, nlist = nlist,
      m = 8, codebookSize = 16, seed = 42L)
    def cells(df: org.apache.spark.sql.DataFrame) =
      Similarity.encodeResidual(df, rq).select(col("centroid_id"))
        .localCheckpoint()
    def chi2(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Double =
      graft.exec.DataTests.driftChi2(a, b, "centroid_id")
        .agg(max(col("chi2_stat"))).collect()(0).getDouble(0)
    def tv(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Double =
      graft.exec.DataTests.driftTv(a, b, "centroid_id")
        .agg(max(col("tv_stat"))).collect()(0).getDouble(0)
    def newMass(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Double =
      graft.exec.DataTests.driftTv(a, b, "centroid_id")
        .agg(sum(when(col("share_base") < 1.0 / (4 * nlist),
          col("share_cur")).otherwise(0.0)).as("nm"))
        .collect()(0).getDouble(0)
    val store = cells(s1)
    val b2 = cells(s2)
    val b3 = cells(s3)
    println(f"[sep] $dir")
    println(f"[sep] slab2(same-dist): chi2=${chi2(store, b2)}%.1f " +
      f"tv=${tv(store, b2)}%.4f newmass=${newMass(store, b2)}%.4f")
    println(f"[sep] slab3(drifted):   chi2=${chi2(store, b3)}%.1f " +
      f"tv=${tv(store, b3)}%.4f newmass=${newMass(store, b3)}%.4f")
    spark.stop()
  }
}
