package graft.examples

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Verify
import graft.catalog.{PartitionSpec, TableRef}
import graft.mat.Materializer
import graft.mat.Materializer.IncrementalStrategy

/** Dump the `.explain("formatted")` of the zorderCompact WRITE FRAMES —
  * the single-task-per-partition shape (pre-r18, still the small-partition
  * path) and the r18 tile-parallel shape — mirrored exactly as
  * `Maintenance.zorderCompact` + `Committer.stageAndCommit` build them
  * (the same mirroring discipline as ZorderTableSpec's plan-pin test; the
  * spec additionally pins the REAL path's task counts and per-file
  * contents). Usage: runMain graft.examples.ZorderFrameDump <outDir>. */
object ZorderFrameDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "plans/r18"
    val spark = Verify.session("8")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.sql("DROP DATABASE IF EXISTS zfd CASCADE")
    spark.sql("CREATE DATABASE zfd")
    val ref = TableRef("zfd.events_z")
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    val rows4 = (0 until 4096).map { i =>
      val pt = if (i % 16 == 0) "c" else if ((i / 4) % 2 == 0) "a" else "b"
      (i.toLong, (i % 64).toLong, ((i * 37 / 64) % 64).toLong, pt)
    }.toDF("id", "x", "y", "pt")
    Materializer.table(spark, ref, rows4.filter(col("id") % 4 === 0), part)
    (1 to 3).foreach(q => Materializer.incremental(spark, ref,
      rows4.filter(col("id") % 4 === q && col("pt") =!= "c"),
      IncrementalStrategy.Append, partition = part))

    val z = graft.exec.Layout.zValue(
      col("x"), lit(0L), lit(63L), col("y"), lit(0L), lit(63L), 6)
    val m = 640L
    val rows = spark.table(ref.render)
      .filter(col("pt").cast("string") === "a" ||
        col("pt").cast("string") === "b")

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name"), p)
      println(s"[framedump] wrote $outDir/$name")
    }

    // BEFORE (and still the small-partition path): one hash exchange on
    // the partition columns -> ONE sorting+writing task per partition
    dump("zorder_rewrite_frame_before.txt",
      rows.repartition(col("pt")).sortWithinPartitions(col("pt"), z, col("id")))

    // AFTER (hot partitions over the byte gate): exact z-rank computed
    // distributively, repartition on (pt, file) -> MANY tasks per partition
    val rowsZ = rows.withColumn("__graft_zcell", z)
    val cells = rowsZ.groupBy(col("pt"), col("__graft_zcell"))
      .agg(count(lit(1)).as("__graft_zn"))
    val wOff = Window.partitionBy(col("pt")).orderBy(col("__graft_zcell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = cells.withColumn("__graft_zoff",
      coalesce(sum(col("__graft_zn")).over(wOff), lit(0L))).drop("__graft_zn")
    val wCell = Window.partitionBy(col("pt"), col("__graft_zcell"))
      .orderBy(col("id"))
    val withFile = rowsZ.join(offsets, Seq("pt", "__graft_zcell"))
      .withColumn("__graft_zfile",
        col("__graft_zoff") + row_number().over(wCell) - lit(1L))
      .withColumn("__graft_zfile", expr(s"__graft_zfile DIV ${m}L"))
      .drop("__graft_zcell", "__graft_zoff")
    dump("zorder_rewrite_frame_after.txt",
      withFile.repartition(col("pt"), col("__graft_zfile"))
        .sortWithinPartitions(col("pt"), z, col("id"))
        .drop("__graft_zfile"))

    spark.sql("DROP DATABASE IF EXISTS zfd CASCADE")
    spark.stop()
  }
}
