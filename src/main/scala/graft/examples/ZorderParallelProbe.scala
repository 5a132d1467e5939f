package graft.examples

import org.apache.spark.sql.functions._
import graft.Verify
import graft.catalog.{PartitionSpec, TableRef}
import graft.exec.Maintenance
import graft.mat.Materializer
import graft.mat.Materializer.IncrementalStrategy

/** Measure the r18 tile-parallel zorderCompact against the single-task
  * path on a HOT-partition fixture (the 100 TB straggler shape VERDICT
  * r17 flagged: a date-partitioned table where one partition holds most
  * of the bytes, rewritten by ONE sorting+writing task).
  *
  * Usage: runMain graft.examples.ZorderParallelProbe
  *          [rowsPerHot] [cpus] [hotParts]
  * Builds two identical tables — `hotParts` hot partitions of `rowsPerHot`
  * rows (default 8M × 2) + 1 small untouched — degraded by 3 appends;
  * compacts one with the byte gate at its default (single-task) and one
  * with the gate forced low (tile-parallel), and prints wall seconds + the
  * per-file chunk-equality check. hotParts=1 is the VERDICT r17 straggler
  * shape exactly: the whole rewrite in ONE task vs many. */
object ZorderParallelProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 8000000L
    val spark = Verify.session(
      if (args.length > 1) args(1) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val hot = if (args.length > 2) args(2).toInt else 2
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val part = PartitionSpec.Static(Seq("pt" -> "string"))

    def fixture = spark.range((hot + 1L) * n).select(
      col("id"),
      (col("id") % 8191).as("x"),
      ((col("id") * 37) % 8191).as("y"),
      // (id/4) decouples the partition residue from the okey-quarter
      // append structure, so every quarter feeds every hot partition
      when((col("id") / 4).cast("long") % (hot + 1) === hot, "c")
        .otherwise(concat(lit("p"),
          (col("id") / 4).cast("long") % (hot + 1))).as("pt"))
      // the "c" partition is thinned to stay small and untouched
      .filter(col("pt") =!= "c" || col("id") % 1024 === 2)

    def build(name: String): TableRef = {
      val ref = TableRef(s"zpp.$name")
      def quarter(q: Int) = fixture.filter(col("id") % 4 === q)
      Materializer.table(spark, ref, quarter(0), part)
      (1 to 3).foreach(q => Materializer.incremental(spark, ref,
        quarter(q).filter(col("pt") =!= "c"),
        IncrementalStrategy.Append, partition = part))
      ref
    }
    spark.sql("DROP DATABASE IF EXISTS zpp CASCADE")
    spark.sql("CREATE DATABASE zpp")
    println(s"[probe] building two degraded tables, ~$n rows/hot partition")
    val single = build("events_s")
    val par = build("events_p")
    val nmax = spark.table(single.render).filter(col("pt") =!= "c")
      .groupBy("pt").count().as[(String, Long)].collect().map(_._2).max
    val m = (nmax + 7L) / 8L // 8 rolled files per hot partition

    def timed[T](what: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(what)
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    timed("zorderCompact SINGLE-TASK (default gate)") {
      Maintenance.zorderCompact(spark, single, part, "x", "y",
        maxFiles = 3, bits = 8, maxRecordsPerFile = m,
        tiebreak = Seq("id"))
    }
    spark.conf.set("spark.graft.zorder.parallelMinBytes", "1")
    timed("zorderCompact TILE-PARALLEL (gate forced low)") {
      Maintenance.zorderCompact(spark, par, part, "x", "y",
        maxFiles = 3, bits = 8, maxRecordsPerFile = m,
        tiebreak = Seq("id"))
    }
    spark.conf.unset("spark.graft.zorder.parallelMinBytes")
    // contract: identical per-file chunking (file k = z-ranks [k·m,(k+1)·m))
    def fileSets(ref: TableRef): Set[(Long, Long, Long)] =
      spark.table(ref.render).filter(col("pt") =!= "c")
        .groupBy(input_file_name())
        .agg(count(lit(1)).as("n"), sum(col("id")).as("s"),
          min(col("id")).as("mn"))
        .select(col("n"), col("s"), col("mn"))
        .as[(Long, Long, Long)].collect().toSet
    val ok = fileSets(single) == fileSets(par)
    println(s"[probe] per-file chunk equality (n,sum,min id): $ok")
    require(ok, "parallel path changed file contents")
    val counts = Maintenance.partitionFileCounts(spark, par, part)
    println(s"[probe] files after: $counts")
    spark.sql("DROP DATABASE IF EXISTS zpp CASCADE")
    spark.stop()
  }
}
