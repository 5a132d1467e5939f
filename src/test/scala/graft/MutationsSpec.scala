package graft

import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}
import graft.exec.Mutations
import graft.mat.Materializer

/** Transactional-table DELETE/UPDATE/TRUNCATE (ref test_core.py:1128-1140). */
class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(part: PartitionSpec): TableRef = {
    n += 1
    val ref = TableRef(s"default.mut_spec_$n")
    val df = Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"), (4L, "d", "p2"))
      .toDF("id", "v", "pt")
    Materializer.table(spark, ref, df, part,
      tblProperties = Map("transactional" -> "true"))
    ref
  }

  test("delete on unpartitioned table") {
    val ref = fresh(PartitionSpec.None)
    Mutations.delete(spark, ref, $"id" === 2)
    assert(spark.table(ref.render).select("id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 3L, 4L))
  }

  test("delete on partitioned table rewrites only touched partitions") {
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    val ref = fresh(part)
    val p2Before = graft.catalog.CatalogOps.lastModified(spark, ref)
    Mutations.delete(spark, ref, $"id" === 1, part)
    assert(spark.table(ref.render).count() == 3)
    assert(spark.table(ref.render).filter($"pt" === "p2").count() == 2)
  }

  test("update with assignment; partition columns protected") {
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    val ref = fresh(part)
    Mutations.update(spark, ref, Map("v" -> lit("Z")), $"id" === 3, part)
    val got = spark.table(ref.render).orderBy($"id").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("a", "b", "Z", "d"))
    intercept[IllegalArgumentException] {
      Mutations.update(spark, ref, Map("pt" -> lit("p9")), $"id" === 3, part)
    }
  }

  test("delete with no matching rows is a no-op") {
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    val ref = fresh(part)
    Mutations.delete(spark, ref, $"id" === 99, part)
    assert(spark.table(ref.render).count() == 4)
  }

  test("truncate empties the table") {
    val ref = fresh(PartitionSpec.None)
    Mutations.truncate(spark, ref)
    assert(spark.table(ref.render).count() == 0)
  }
}
