package graft.examples

import org.apache.spark.sql.functions._
import graft.Verify
import graft.catalog.{PartitionSpec, TableRef}
import graft.mat.Materializer
import graft.mat.Materializer.IncrementalStrategy

/** Dump the `.explain("formatted")` of the zorderCompact WRITE FRAMES —
  * the single-task-per-partition shape (the small-partition path) and the
  * tile-parallel hot-partition shape. The single-task frame is mirrored
  * exactly as `Maintenance.zorderCompact` + `Committer.stageAndCommit`
  * build it; the tile frame calls the REAL
  * [[graft.exec.Maintenance.tileParallelFrame]] (r19 — no mirror drift;
  * ZorderTableSpec additionally pins the path's task counts and per-file
  * contents). Usage: runMain graft.examples.ZorderFrameDump <outDir>. */
object ZorderFrameDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "plans/r19"
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
    // distributively, repartition on (pt, file) -> MANY tasks per partition.
    // The REAL frame builder (r19): pinned-broadcast offsets join +
    // boundary-cell split — only cells straddling a file boundary pay the
    // (pt, cell) window exchange.
    val withFile = graft.exec.Maintenance.tileParallelFrame(
      rows, Seq("pt"), z, Seq("id"), m)
    dump("zorder_rewrite_frame_after.txt",
      withFile.repartition(col("pt"), col("__graft_zfile"))
        .sortWithinPartitions(col("pt"), z, col("id"))
        .drop("__graft_zfile"))

    spark.sql("DROP DATABASE IF EXISTS zfd CASCADE")
    spark.stop()
  }
}
