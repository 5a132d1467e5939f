package graft.exec

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.catalog.{PartitionSpec, TableRef}

/** All table mutation goes through this writer. OSS parquet has no row-level
  * ACID, so mutation = rewrite-then-swap:
  *
  *  - whole-table ops write a staging table, then swap it in (drop + rename —
  *    a metadata + file-move operation, no data rewrite);
  *  - partition-scoped ops stage only the touched partitions and use Spark's
  *    dynamic partition-overwrite (`partitionOverwriteMode=dynamic`), so a
  *    100 TB table with a 3-partition delta rewrites 3 partitions, not 100 TB.
  *
  * Reading from the table being overwritten is illegal in Spark, hence the
  * staging hop: result plans that scan the target are first materialized into
  * `<t>__graft_stg`, breaking lineage before the overwrite.
  *
  * Ref semantics: transactional-table MERGE/DELETE/UPDATE
  * (reference relations/table/create.sql:44-49, test_core.py:1128-1140)
  * re-expressed as deterministic rewrites.
  */
object AtomicWriter {

  private def stgName(t: TableRef): TableRef =
    t.copy(name = t.name + "__graft_stg")

  /** Create-or-replace the table with `df` (CTAS path — target not read). */
  def createOrReplace(spark: SparkSession, df: DataFrame, target: TableRef,
      partition: PartitionSpec = PartitionSpec.None,
      bucketBy: Option[(Int, Seq[String])] = None): Unit = {
    val out = withPartitionCols(df, partition)
    spark.sql(s"DROP TABLE IF EXISTS ${target.render}")
    var w = out.write.mode(SaveMode.Overwrite).format("parquet")
    val pcols = partition.partitionColumns
    if (pcols.nonEmpty) w = w.partitionBy(pcols: _*)
    bucketBy.foreach { case (n, cols) => w = w.bucketBy(n, cols.head, cols.tail: _*).sortBy(cols.head, cols.tail: _*) }
    w.saveAsTable(target.render)
  }

  /** Atomically replace `target`'s contents with `df`, where `df` may scan
    * `target` itself (merge/delete rewrites). Stages then swaps. */
  def overwriteTable(spark: SparkSession, df: DataFrame, target: TableRef,
      partition: PartitionSpec = PartitionSpec.None): Unit = {
    val stg = stgName(target)
    createOrReplace(spark, df, stg, partition)
    spark.sql(s"DROP TABLE IF EXISTS ${target.render}")
    spark.sql(s"ALTER TABLE ${stg.render} RENAME TO ${target.render}")
  }

  /** Replace ONLY the partitions present in `df` (dynamic partition
    * overwrite); other partitions of `target` are untouched — this is the
    * at-scale path for merge/insert_overwrite on partitioned tables. */
  def overwritePartitions(spark: SparkSession, df: DataFrame, target: TableRef,
      partition: PartitionSpec): Unit = {
    require(partition.partitionColumns.nonEmpty, "overwritePartitions needs partition columns")
    val stg = stgName(target)
    // Stage to break lineage (df may scan target).
    createOrReplace(spark, df, stg, partition)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // insertInto is position-based with partition columns LAST — the same
      // contract as the reference's dynamic-partition INSERT
      // (merge.sql:100-116: data cols then partition cols).
      val tgtCols = spark.table(target.render).columns
      spark.table(stg.render)
        .select(tgtCols.map(org.apache.spark.sql.functions.col): _*)
        .write.mode(SaveMode.Overwrite).insertInto(target.render)
    } finally {
      prev.foreach(spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
      spark.sql(s"DROP TABLE IF EXISTS ${stg.render}")
    }
  }

  /** Plain append (`INSERT INTO`), position-based, partition cols last. */
  def append(spark: SparkSession, df: DataFrame, target: TableRef,
      partition: PartitionSpec = PartitionSpec.None): Unit = {
    val tgtCols = spark.table(target.render).columns
    withPartitionCols(df, partition)
      .select(tgtCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Append).insertInto(target.render)
  }

  /** Inject the generated auto-partition column if the spec calls for one
    * (engine-side `trunc_time`; ref relations/partition.sql:4-9). */
  def withPartitionCols(df: DataFrame, partition: PartitionSpec): DataFrame =
    partition match {
      case a: PartitionSpec.Auto if !df.columns.contains(a.genCol) =>
        df.withColumn(a.genCol, a.genExpr(df))
      case _ => df
    }
}
