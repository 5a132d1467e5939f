package graft

import org.apache.spark.sql.functions._
import graft.catalog.TableRef
import graft.exec.SnapshotExec

/** SCD-2 snapshot behavior pinned by the reference's core suite
  * (test_core.py:1204-1209 via FIXTURES.md §1): 3-row seed, update id=1 →
  * 4 rows with 2 versions of id 1. */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def base() = Seq(
    (1L, "Alice", 100L, "2024-01-01 00:00:00"),
    (2L, "Bob", 200L, "2024-01-01 00:00:00"),
    (3L, "Carol", 300L, "2024-01-01 00:00:00"))
    .toDF("id", "name", "value", "updated_at")
    .withColumn("updated_at", col("updated_at").cast("timestamp"))

  private var n = 0
  private def freshRef(): TableRef = { n += 1; TableRef(s"default.snap_spec_$n") }

  test("timestamp strategy: update creates a second version and closes the first") {
    val ref = freshRef()
    SnapshotExec.run(spark, ref, base(), Seq("id"),
      SnapshotExec.TimestampStrategy("updated_at"), ts("2024-01-01 00:00:00"))
    assert(spark.table(ref.render).count() == 3)

    val v2 = base().withColumn("value",
        when($"id" === 1, lit(999L)).otherwise($"value"))
      .withColumn("updated_at",
        when($"id" === 1, lit("2024-02-01 00:00:00").cast("timestamp"))
          .otherwise($"updated_at"))
    SnapshotExec.run(spark, ref, v2, Seq("id"),
      SnapshotExec.TimestampStrategy("updated_at"), ts("2024-02-01 00:00:00"))

    val snap = spark.table(ref.render)
    assert(snap.count() == 4)
    val id1 = snap.filter($"id" === 1).orderBy($"dbt_valid_from").collect()
    assert(id1.length == 2)
    assert(id1(0).getAs[java.sql.Timestamp]("dbt_valid_to") == ts("2024-02-01 00:00:00"))
    assert(id1(0).getAs[Long]("value") == 100L)
    assert(id1(1).getAs[java.sql.Timestamp]("dbt_valid_to") == null)
    assert(id1(1).getAs[Long]("value") == 999L)
    // unchanged rows: still exactly one open version
    assert(snap.filter($"id" === 2).count() == 1)
    // scd ids unique
    assert(snap.select($"dbt_scd_id").distinct().count() == 4)
  }

  test("NULL-key rows version correctly (no duplicate/stale open versions)") {
    val ref = freshRef()
    val v1 = Seq((Option(1L), "Alice", 100L, "2024-01-01 00:00:00"),
      (Option.empty[Long], "NoKey", 50L, "2024-01-01 00:00:00"))
      .toDF("id", "name", "value", "updated_at")
      .withColumn("updated_at", col("updated_at").cast("timestamp"))
    SnapshotExec.run(spark, ref, v1, Seq("id"),
      SnapshotExec.TimestampStrategy("updated_at"), ts("2024-01-01 00:00:00"))
    val v2 = v1.withColumn("value",
        when($"id".isNull, lit(51L)).otherwise($"value"))
      .withColumn("updated_at",
        when($"id".isNull, lit("2024-02-01 00:00:00").cast("timestamp"))
          .otherwise($"updated_at"))
    SnapshotExec.run(spark, ref, v2, Seq("id"),
      SnapshotExec.TimestampStrategy("updated_at"), ts("2024-02-01 00:00:00"))
    val nulls = spark.table(ref.render).filter($"id".isNull)
      .orderBy($"dbt_valid_from").collect()
    // exactly one closed + one open version — not closed-and-stale-open-and-double-inserted
    assert(nulls.length == 2, s"got ${nulls.length} NULL-key versions")
    assert(nulls(0).getAs[java.sql.Timestamp]("dbt_valid_to") != null)
    assert(nulls(0).getAs[Long]("value") == 50L)
    assert(nulls(1).getAs[java.sql.Timestamp]("dbt_valid_to") == null)
    assert(nulls(1).getAs[Long]("value") == 51L)
  }

  test("idempotent re-run: same source second time is a no-op") {
    val ref = freshRef()
    SnapshotExec.run(spark, ref, base(), Seq("id"),
      SnapshotExec.TimestampStrategy("updated_at"), ts("2024-01-01 00:00:00"))
    SnapshotExec.run(spark, ref, base(), Seq("id"),
      SnapshotExec.TimestampStrategy("updated_at"), ts("2024-01-02 00:00:00"))
    assert(spark.table(ref.render).count() == 3)
    assert(spark.table(ref.render).filter($"dbt_valid_to".isNotNull).count() == 0)
  }

  test("invalidate_hard_deletes closes rows missing from the source") {
    val ref = freshRef()
    SnapshotExec.run(spark, ref, base(), Seq("id"),
      SnapshotExec.TimestampStrategy("updated_at"), ts("2024-01-01 00:00:00"))
    SnapshotExec.run(spark, ref, base().filter($"id" =!= 3), Seq("id"),
      SnapshotExec.TimestampStrategy("updated_at"), ts("2024-03-01 00:00:00"),
      invalidateHardDeletes = true)
    val snap = spark.table(ref.render)
    assert(snap.count() == 3)
    val id3 = snap.filter($"id" === 3).collect().head
    assert(id3.getAs[java.sql.Timestamp]("dbt_valid_to") == ts("2024-03-01 00:00:00"))
    assert(snap.filter($"dbt_valid_to".isNull).count() == 2)
  }

  test("check strategy: change detected on checked columns only") {
    val ref = freshRef()
    val t1lit = lit("2024-01-01 00:00:00").cast("timestamp")
    SnapshotExec.run(spark, ref, base().drop("updated_at"), Seq("id"),
      SnapshotExec.CheckStrategy(Seq("name", "value"), t1lit),
      ts("2024-01-01 00:00:00"))
    val t2lit = lit("2024-02-01 00:00:00").cast("timestamp")
    val v2 = base().drop("updated_at").withColumn("value",
      when($"id" === 2, lit(777L)).otherwise($"value"))
    SnapshotExec.run(spark, ref, v2, Seq("id"),
      SnapshotExec.CheckStrategy(Seq("name", "value"), t2lit),
      ts("2024-02-01 00:00:00"))
    val snap = spark.table(ref.render)
    assert(snap.count() == 4)
    assert(snap.filter($"id" === 2).count() == 2)
  }
}
