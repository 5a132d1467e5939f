package graft

import org.apache.spark.sql.functions._
import graft.catalog.{CatalogOps, PartitionSpec, TableRef}
import graft.mat.Materializer
import graft.mat.Materializer.{IncrementalStrategy, OnSchemaChange}

/** on_schema_change matrix (ref incremental/test_incremental.py:44-45 +
  * adapters/columns.sql:6-25). */
class SchemaChangeSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(): TableRef = {
    n += 1
    val ref = TableRef(s"default.osc_$n")
    Materializer.table(spark, ref, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    ref
  }
  private def widened() = Seq((2L, "b2", 99L), (3L, "c", 100L))
    .toDF("id", "v", "extra")

  test("ignore (default): source-only columns dropped, target schema kept") {
    val ref = fresh()
    Materializer.incremental(spark, ref, widened(),
      IncrementalStrategy.Merge(), uniqueKey = Seq("id"))
    val t = spark.table(ref.render)
    assert(t.columns.toSeq == Seq("id", "v"))
    assert(t.count() == 3)
  }

  test("append_new_columns: ALTER TABLE ADD COLUMNS, old rows NULL") {
    val ref = fresh()
    Materializer.incremental(spark, ref, widened(),
      IncrementalStrategy.Merge(), uniqueKey = Seq("id"),
      onSchemaChange = OnSchemaChange.AppendNewColumns)
    val t = spark.table(ref.render)
    assert(t.columns.toSeq == Seq("id", "v", "extra"))
    val rows = t.orderBy($"id").collect()
    assert(rows(0).isNullAt(2))            // id=1 untouched, extra NULL
    assert(rows(1).getLong(2) == 99L)      // id=2 merged
    assert(rows(2).getLong(2) == 100L)     // id=3 inserted
  }

  test("sync_all_columns: adds new and drops removed columns") {
    val ref = fresh()
    val narrowedPlusNew = Seq((2L, 99L), (3L, 100L)).toDF("id", "extra") // v removed
    Materializer.incremental(spark, ref, narrowedPlusNew,
      IncrementalStrategy.Merge(), uniqueKey = Seq("id"),
      onSchemaChange = OnSchemaChange.SyncAllColumns)
    val t = spark.table(ref.render)
    assert(t.columns.toSeq == Seq("id", "extra"))
    assert(t.count() == 3)
  }

  test("sync_all_columns on a PARTITIONED target preserves partitioning") {
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    val ref = TableRef("default.osc_part")
    Materializer.table(spark, ref,
      Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "v", "pt"), part)
    val widenedP = Seq((2L, "b2", 99L, "p2"), (3L, "c", 100L, "p2"))
      .toDF("id", "v", "extra", "pt")
    Materializer.incremental(spark, ref, widenedP,
      IncrementalStrategy.Merge(), uniqueKey = Seq("id"), partition = part,
      onSchemaChange = OnSchemaChange.SyncAllColumns)
    val t = spark.table(ref.render)
    assert(t.columns.toSet == Set("id", "v", "extra", "pt"))
    assert(t.count() == 3)
    // table must STILL be partitioned by pt
    val parts = spark.sql(s"SHOW PARTITIONS ${ref.render}")
      .collect().map(_.getString(0)).toSeq
    assert(parts.exists(_.contains("pt=p1")) && parts.exists(_.contains("pt=p2")),
      s"partitioning lost: $parts")
  }

  test("sync_all_columns refuses to drop a partition column") {
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    val ref = TableRef("default.osc_part_lost")
    Materializer.table(spark, ref,
      Seq((1L, "a", "p1")).toDF("id", "v", "pt"), part)
    val noPt = Seq((2L, "b")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Materializer.incremental(spark, ref, noPt,
        IncrementalStrategy.Merge(), uniqueKey = Seq("id"), partition = part,
        onSchemaChange = OnSchemaChange.SyncAllColumns)
    }
  }

  test("fail: raises on any schema difference") {
    val ref = fresh()
    intercept[IllegalStateException] {
      Materializer.incremental(spark, ref, widened(),
        IncrementalStrategy.Merge(), uniqueKey = Seq("id"),
        onSchemaChange = OnSchemaChange.Fail)
    }
  }

  test("getColumnsInRelation excludes generated auto-partition columns (ref impl.py:197-215)") {
    val part = PartitionSpec.Auto("ts", "day", Some("pt"))
    val ref = TableRef("default.osc_autopart")
    val df = Seq((1L, "2024-01-01 00:00:00")).toDF("id", "ts")
      .withColumn("ts", $"ts".cast("timestamp"))
    Materializer.table(spark, ref,
      graft.exec.AtomicWriter.withPartitionCols(df, part), part)
    val cols = CatalogOps.getColumnsInRelation(spark, ref, part).map(_._1)
    assert(cols.contains("id") && cols.contains("ts"))
    assert(!cols.contains("pt"))
    // static partition columns ARE included (non-auto rule)
    val spart = PartitionSpec.Static(Seq("pt" -> "string"))
    val ref2 = TableRef("default.osc_staticpart")
    Materializer.table(spark, ref2,
      Seq((1L, "p1")).toDF("id", "pt"), spart)
    assert(CatalogOps.getColumnsInRelation(spark, ref2, spart).map(_._1).contains("pt"))
  }
}
