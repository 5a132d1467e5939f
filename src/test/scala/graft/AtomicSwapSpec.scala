package graft

import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}
import graft.exec.AtomicWriter
import graft.mat.Materializer
import graft.mat.Materializer.IncrementalStrategy

/** Lifecycle hygiene of the staged-swap machinery: no leaked helper
  * relations (the reference's 1.11.1 `__dbt_tmp` regression,
  * CHANGELOG f708822 / test_incremental_temp_cleanup.py), and recovery
  * from leftovers of a crashed previous run. */
class AtomicSwapSpec extends SparkSpec {
  import spark.implicits._

  private def tables(): Set[String] =
    spark.catalog.listTables("default").collect().map(_.name).toSet

  test("incremental run that reads the target drops its __dbt_tmp staging") {
    val ref = TableRef("default.swap_tmpclean")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable(ref.render)
    // model reads {{ this }} → the tmp-staging path is exercised
    val src = spark.table(ref.render)
      .select($"id" + 10 as "id", upper($"v") as "v")
    Materializer.incremental(spark, ref, src,
      IncrementalStrategy.Merge(), uniqueKey = Seq("id"))
    assert(spark.table(ref.render).count() == 4)
    val leaked = tables().filter(t => t.contains("dbt_tmp") ||
      t.contains("graft_stg") || t.contains("graft_old"))
    assert(leaked.isEmpty, s"leaked helper relations: $leaked")
  }

  test("overwriteTable recovers when a crashed run left stg and old tables") {
    val ref = TableRef("default.swap_recover")
    Seq((1L, "keep")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable(ref.render)
    // simulate a previous run that died mid-swap
    Seq((99L, "stale_stg")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("default.swap_recover__graft_stg")
    Seq((98L, "stale_old")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("default.swap_recover__graft_old")
    AtomicWriter.overwriteTable(spark,
      spark.table(ref.render).withColumn("v", lit("new")), ref)
    val got = spark.table(ref.render).as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "new")))
    val leftover = tables().filter(_.startsWith("swap_recover__"))
    assert(leftover.isEmpty, s"stale helpers survived: $leftover")
  }

  test("partitioned overwrite recovers from a stale staging table") {
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    val ref = TableRef("default.swap_recover_part")
    Materializer.table(spark, ref,
      Seq((1L, "p1"), (2L, "p2")).toDF("id", "pt"), part)
    Seq((99L, "px")).toDF("id", "pt").write.mode("overwrite")
      .partitionBy("pt").saveAsTable("default.swap_recover_part__graft_stg")
    AtomicWriter.overwritePartitions(spark,
      Seq((10L, "p1")).toDF("id", "pt"), ref, part)
    val got = spark.table(ref.render).select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 10L))
    assert(!tables().contains("swap_recover_part__graft_stg"))
    // untouched partition p2 intact, no px contamination
    assert(spark.table(ref.render).filter($"pt" === "px").count() == 0)
  }
}
