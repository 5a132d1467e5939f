package graft.examples

import org.apache.spark.sql.functions._

/** Times [[graft.exec.Maintenance.compactExport]]'s two paths on a real
  * batched export (the p06 shape): row-group STITCH vs classic
  * shuffle-and-rewrite, same input, membership compared. Run:
  * tools/run.sh graft.examples.CompactExportProbe <sfDir> */
object CompactExportProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("cxp").toString
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        graft.llm.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        pmod(conv(substring(md5(concat(lit("p05"), col("text"))), 1, 4),
          16, 10).cast("long"), lit(8L)).cast("int").as("shard"))
    // simulate 8 micro-batch writes, each partitionBy(shard)
    (0 until 8).foreach { b =>
      docs.filter(col("doc_id") % 8 === b).repartition(4)
        .write.partitionBy("shard").mode("overwrite")
        .parquet(s"$base/out/batch=$b")
    }
    val files = graft.exec.Maintenance.dataFileCount(spark, s"$base/out")
    println(s"[cxp] batched export files: $files")
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cxp] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val st = timed("stitch  ") {
      graft.exec.Maintenance.compactExport(spark, s"$base/out",
        s"$base/c1", 8) }
    // classic: force the fallback by asking with an impossible gate — do
    // it directly (same code the fallback runs)
    val cl = timed("classic ") {
      spark.read.parquet(s"$base/out").drop("batch")
        .repartition(8, col("shard"))
        .write.partitionBy("shard").mode("overwrite").parquet(s"$base/c2")
      spark.read.parquet(s"$base/c2") }
    val a = st.agg(count(lit(1)), sum(col("doc_id"))).collect()(0)
    val b = cl.agg(count(lit(1)), sum(col("doc_id"))).collect()(0)
    println(s"[cxp] membership equal: ${a == b}  ($a vs $b)")
    println(s"[cxp] stitched files: ${
      graft.exec.Maintenance.dataFileCount(spark, s"$base/c1")} classic: ${
      graft.exec.Maintenance.dataFileCount(spark, s"$base/c2")}")
    spark.stop()
  }
}
