package graft.examples

import org.apache.spark.sql.functions._

/** Dial probe for dt07's calibrated drift gate: prints the raw chi² of
  * the same-distribution calibration split vs the planted +0.5 shift at
  * a given scale directory, so the separation factor is chosen from
  * MEASURED values (not an assumed multinomial regime — duplicate
  * clusters in the amplified corpora inflate the calibration statistic
  * by the copy factor).
  * Run: tools/run.sh graft.examples.DriftDialProbe <sfDir> */
object DriftDialProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val s = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    s.sparkContext.setLogLevel("WARN")
    import graft.llm.{IndexStore, Similarity}
    val emb = graft.Tables.t(s, dir, "embeddings")
    val root = java.nio.file.Files.createTempDirectory("driftprobe").toString
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 === 1)
    val shifted = odd.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(0.5f)).as("embedding"))
    IndexStore.train(s, root, even, dim = 64, nlist = 8, m = 8,
      codebookSize = 16, seed = 42L)
    IndexStore.appendCodes(s, root, 0L, even)
    val rq = IndexStore.loadQuantizer(s, root)
    val storeCells = IndexStore.readCodes(s, root).select(col("centroid_id"))
    def stat(batch: org.apache.spark.sql.DataFrame): Double =
      graft.exec.DataTests.driftChi2(storeCells,
          Similarity.encodeResidual(batch, rq).select(col("centroid_id")),
          "centroid_id")
        .agg(max(col("chi2_stat"))).head.getDouble(0)
    val same = stat(odd)
    val shift = stat(shifted)
    val cells = IndexStore.cellOccupancy(s, root).count()
    println(f"[driftprobe] dir=$dir cells=$cells chi2_same=$same%.2f " +
      f"chi2_shift=$shift%.2f ratio=${shift / same}%.1f")
    s.stop()
  }
}
