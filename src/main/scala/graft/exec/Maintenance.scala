package graft.exec

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}

/** Table-maintenance operators a 100 TB lakehouse needs around the
  * materialization lifecycle (not in the reference, which delegates storage
  * management to MaxCompute):
  *
  *  - `compact`: small-file compaction — rewrite partitions whose file
  *    count exceeds a threshold into ~`targetFileBytes` files. Incremental
  *    strategies append/rewrite per-delta; after many cycles a partition
  *    accumulates files, and scan cost at scale is dominated by file-open
  *    overhead. Only offending partitions are rewritten (partition-scoped,
  *    same one-data-pass discipline as AtomicWriter).
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

  /** Compact partitions with more than `maxFiles` data files. Each is
    * rewritten through the atomic partition swap; untouched partitions keep
    * their files byte-identical. Returns the compacted partition paths. */
  def compact(spark: SparkSession, target: TableRef, partition: PartitionSpec,
      maxFiles: Int = 8): Seq[String] = {
    require(partition.partitionColumns.nonEmpty, "compact needs a partitioned table")
    val pcols = partition.partitionColumns
    val offending = partitionFileCounts(spark, target, partition)
      .filter(_._2 > maxFiles).keys.toSeq.sorted
    if (offending.nonEmpty) {
      // k1=v1/k2=v2 → row filter on the partition columns
      val conds = offending.map { rel =>
        rel.split("/").map { seg =>
          val Array(k, v) = seg.split("=", 2)
          col(k).cast("string") === v
        }.reduce(_ && _)
      }.reduce(_ || _)
      val rows = spark.table(target.render).filter(conds)
      AtomicWriter.overwritePartitions(spark, rows, target, partition)
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
