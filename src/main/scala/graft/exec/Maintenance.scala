package graft.exec

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}

/** Table-maintenance operators a 100 TB lakehouse needs around the
  * materialization lifecycle (not in the reference, which delegates storage
  * management to MaxCompute):
  *
  *  - `compact`: small-file compaction — rewrite partitions whose file
  *    count exceeds a threshold, bounding output file size via
  *    `maxRecordsPerFile`. Incremental strategies append/rewrite per-delta;
  *    after many cycles a partition accumulates files, and scan cost at
  *    scale is dominated by file-open overhead. Only offending partitions
  *    are rewritten (partition-scoped, same one-data-pass discipline as
  *    AtomicWriter).
  *  - `analyze`: table + column statistics (ANALYZE TABLE) so the
  *    cost-based optimizer has row counts / NDVs for broadcast and join
  *    reorder decisions.
  */
object Maintenance {

  /** File count per partition (relative partition path → #data files). */
  def partitionFileCounts(spark: SparkSession, target: TableRef,
      partition: PartitionSpec): Map[String, Int] = {
    val ident = spark.sessionState.sqlParser
      .parseTableIdentifier(target.render.replace("`", ""))
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    val root = new org.apache.hadoop.fs.Path(meta.location)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val depth = partition.partitionColumns.size
    def walk(p: org.apache.hadoop.fs.Path, d: Int, rel: String): Seq[(String, Int)] = {
      val stats =
        try fs.listStatus(p).toSeq
        catch { case _: java.io.FileNotFoundException => Nil }
      if (d == 0)
        Seq(rel -> stats.count(s => s.isFile && !s.getPath.getName.startsWith("_")))
      else stats.filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap(s => walk(s.getPath, d - 1,
          if (rel.isEmpty) s.getPath.getName else rel + "/" + s.getPath.getName))
    }
    walk(root, depth, "").toMap
  }

  private val HiveDefaultPartition = AtomicWriter.HiveDefaultPartition

  /** Compact partitions with more than `maxFiles` data files. Each is
    * rewritten through the atomic partition swap; untouched partitions keep
    * their files byte-identical. One writing task per partition (that IS
    * the compaction — parallelism comes from compacting many partitions at
    * once), with file size bounded by `maxRecordsPerFile` (0 = single file
    * per partition). Directory names are Hive-unescaped and the
    * null-partition sentinel maps to IS NULL, so escaped values (':', '%')
    * and NULL partitions compact correctly. Returns the compacted paths. */
  def compact(spark: SparkSession, target: TableRef, partition: PartitionSpec,
      maxFiles: Int = 8, maxRecordsPerFile: Long = 0L): Seq[String] = {
    require(partition.partitionColumns.nonEmpty, "compact needs a partitioned table")
    val offending = partitionFileCounts(spark, target, partition)
      .filter(_._2 > maxFiles).keys.toSeq.sorted
    if (offending.nonEmpty) {
      // k1=v1/k2=v2 → row filter on the partition columns
      val conds = offending.map { rel =>
        rel.split("/").map { seg =>
          val Array(k, v) = seg.split("=", 2)
          val uv = AtomicWriter.unescapePathName(v)
          // Spark routes BOTH null and '' partition values into the
          // default-partition dir — compacting it must pick up both, or the
          // swap discards the ''-valued rows
          if (uv == HiveDefaultPartition)
            col(k).isNull || col(k).cast("string") === ""
          else col(k).cast("string") === uv
        }.reduce(_ && _)
      }.reduce(_ || _)
      val rows = spark.table(target.render).filter(conds)
      val confKey = "spark.sql.files.maxRecordsPerFile"
      val prev = spark.conf.get(confKey, "0")
      try {
        spark.conf.set(confKey, maxRecordsPerFile.toString)
        AtomicWriter.overwritePartitions(spark, rows, target, partition)
      } finally spark.conf.set(confKey, prev)
    }
    offending
  }

  /** ANALYZE TABLE (+ all columns): feeds the cost-based optimizer. */
  def analyze(spark: SparkSession, target: TableRef,
      withColumns: Boolean = true): Unit = {
    spark.sql(s"ANALYZE TABLE ${target.render} COMPUTE STATISTICS")
    if (withColumns)
      spark.sql(s"ANALYZE TABLE ${target.render} COMPUTE STATISTICS FOR ALL COLUMNS")
  }
}
