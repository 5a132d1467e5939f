package graft

import org.apache.spark.sql.functions._
import graft.catalog.{CatalogOps, PartitionSpec, TableRef}
import graft.mat.{Materializer, SeedLoader}
import org.apache.spark.sql.types._

class MaterializerSpec extends SparkSpec {
  import spark.implicits._

  test("contract enforcement rejects schema drift (ref create.sql contract path)") {
    val df = Seq((1L, "a")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      Materializer.table(spark, TableRef("default.mat_contract"), df,
        contract = Some(Seq("id" -> "bigint", "name" -> "int")))
    }
    Materializer.table(spark, TableRef("default.mat_contract"), df,
      contract = Some(Seq("id" -> "bigint", "name" -> "string")))
    assert(spark.table("default.mat_contract").count() == 1)
  }

  test("NOT NULL is enforced on write (Spark file sources don't enforce it)") {
    val df = Seq((1L, Some("a")), (2L, None)).toDF("id", "name")
    intercept[IllegalArgumentException] {
      Materializer.table(spark, TableRef("default.mat_nn"), df,
        notNullColumns = Seq("name"))
    }
  }

  test("materialized view refresh recomputes from the stored definition") {
    Seq((1, 10), (2, 20)).toDF("k", "v").createOrReplaceTempView("mv_src_a")
    Materializer.table(spark, TableRef("default.mv_base"),
      spark.table("mv_src_a"))
    Materializer.materializedView(spark, TableRef("default.mv_agg"),
      "SELECT CAST(SUM(v) AS BIGINT) AS total FROM default.mv_base")
    assert(spark.table("default.mv_agg").collect().head.getLong(0) == 30L)
    // mutate base, refresh, observe the new state
    Materializer.table(spark, TableRef("default.mv_base"),
      Seq((1, 100)).toDF("k", "v"))
    Materializer.refreshMaterializedView(spark, TableRef("default.mv_agg"))
    assert(spark.table("default.mv_agg").collect().head.getLong(0) == 100L)
  }

  test("clone copies content; rename and drop work") {
    Materializer.table(spark, TableRef("default.cl_src"),
      Seq((1, "x")).toDF("a", "b"))
    Materializer.clone(spark, TableRef("default.cl_src"), TableRef("default.cl_dst"))
    assert(spark.table("default.cl_dst").count() == 1)
    CatalogOps.rename(spark, TableRef("default.cl_dst"), TableRef("default.cl_dst2"))
    assert(CatalogOps.exists(spark, TableRef("default.cl_dst2")))
    assert(!CatalogOps.exists(spark, TableRef("default.cl_dst")))
    CatalogOps.dropRelation(spark, TableRef("default.cl_dst2"))
    assert(!CatalogOps.exists(spark, TableRef("default.cl_dst2")))
  }

  test("raw applies spark.* SET headers and ignores engine hints") {
    val before = spark.conf.get("spark.sql.cbo.enabled", "false")
    val out = Materializer.raw(spark,
      """set odps.sql.allow.fullscan=true;
        |set spark.sql.cbo.enabled=true;
        |SELECT 1 AS one""".stripMargin)
    assert(out.collect().head.getInt(0) == 1)
    assert(spark.conf.get("spark.sql.cbo.enabled") == "true")
    spark.conf.set("spark.sql.cbo.enabled", before)
  }

  test("relation LIKE pattern matching (ref impl.py:671-724)") {
    Materializer.table(spark, TableRef("default.pat_abc"), Seq(1).toDF("x"))
    Materializer.table(spark, TableRef("default.pat_abd"), Seq(1).toDF("x"))
    Materializer.table(spark, TableRef("default.zat_abc"), Seq(1).toDF("x"))
    val got = CatalogOps.matchRelations(spark, "default", "pat_ab%").sorted
    assert(got.contains("pat_abc") && got.contains("pat_abd") && !got.contains("zat_abc"))
    val one = CatalogOps.matchRelations(spark, "default", "pat_ab_")
    assert(one.toSet == Set("pat_abc", "pat_abd"))
  }

  test("schemaOfQuery is analysis-only; validateSql catches bad SQL") {
    val sch = CatalogOps.schemaOfQuery(spark, "SELECT 1 AS a, 'x' AS b")
    assert(sch == Seq("a" -> "int", "b" -> "string"))
    assert(CatalogOps.validateSql(spark, "SELECT bogus_col FROM (SELECT 1 AS a)").isLeft)
    assert(CatalogOps.validateSql(spark, "SELECT a FROM (SELECT 1 AS a)").isRight)
  }

  test("seed inference: bigint / decimal / timestamp / string (ref impl.py:381-401)") {
    assert(SeedLoader.inferColumnType(Seq("1", "2", "-3")) == LongType)
    assert(SeedLoader.inferColumnType(Seq("1.5", "2")) == DecimalType(38, 18))
    assert(SeedLoader.inferColumnType(Seq("2024-01-01", "2024-02-03")) == TimestampType)
    assert(SeedLoader.inferColumnType(Seq("2024-01-01 10:30:00")) == TimestampType)
    assert(SeedLoader.inferColumnType(Seq("abc", "1")) == StringType)
    assert(SeedLoader.inferColumnType(Seq()) == StringType)
  }

  test("seed loader honors column_types overrides (ref seeds.sql:1-25)") {
    val dir = java.nio.file.Files.createTempDirectory("seed_spec")
    val f = dir.resolve("s.csv")
    java.nio.file.Files.writeString(f, "id,amount\n1,2.5\n2,3.5\n")
    val df = SeedLoader.load(spark, f.toString,
      columnTypes = Map("amount" -> "double"))
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("amount").dataType == DoubleType)
  }

  test("ephemeral composition is lazy temp-view chaining") {
    Materializer.ephemeral(spark, "eph_a", Seq((1, "x"), (2, "y")).toDF("k", "v"))
    Materializer.ephemeral(spark, "eph_b",
      spark.table("eph_a").filter($"k" === 1))
    assert(spark.table("eph_b").count() == 1)
  }

  test("MV apply: unchanged config refreshes, changed config replaces (ref impl.py:113-158)") {
    import graft.mat.Materializer
    Materializer.table(spark, TableRef("default.mvd_base"),
      Seq((1, 10)).toDF("k", "v"))
    val sql1 = "SELECT CAST(SUM(v) AS BIGINT) AS total FROM default.mvd_base"
    assert(Materializer.materializedViewApply(spark, TableRef("default.mvd"), sql1) == "created")
    assert(Materializer.materializedViewApply(spark, TableRef("default.mvd"), sql1) == "refreshed")
    val sql2 = "SELECT CAST(SUM(v * 2) AS BIGINT) AS total FROM default.mvd_base"
    assert(Materializer.materializedViewApply(spark, TableRef("default.mvd"), sql2) == "replaced")
    assert(spark.table("default.mvd").collect().head.getLong(0) == 20L)
    // property change also replaces
    assert(Materializer.materializedViewApply(spark, TableRef("default.mvd"), sql2,
      Map("graft.lifecycle.days" -> "7")) == "replaced")
    assert(Materializer.materializedViewApply(spark, TableRef("default.mvd"), sql2,
      Map("graft.lifecycle.days" -> "7")) == "refreshed")
  }

  test("incremental rollup: additive partial-agg merges equal the full aggregate") {
    import graft.exec.AtomicWriter
    spark.sql("DROP TABLE IF EXISTS default.rollup_t")
    val ref = TableRef("default.rollup_t")
    val rows = (1L to 300L).map(i => (i, s"k${i % 4}", i.toDouble))
      .toDF("id", "k", "v")
    // three batches, the middle one EMPTY (a no-op refresh must not
    // corrupt counts); merge = union + re-aggregate, never a history scan
    val batches = Seq(rows.filter($"id" % 2 === 0),
      rows.filter(lit(false)), rows.filter($"id" % 2 === 1))
    batches.zipWithIndex.foreach { case (b, i) =>
      val part = b.groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"v").as("tot"))
      val merged =
        if (i == 0) part
        else spark.table("default.rollup_t").unionByName(part)
          .groupBy($"k").agg(sum($"n").as("n"), sum($"tot").as("tot"))
      AtomicWriter.overwriteTable(spark, merged, ref)
    }
    val got = spark.table("default.rollup_t")
      .select($"k", $"n", $"tot").collect().map(_.toSeq).toSet
    val want = rows.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("tot"))
      .select($"k", $"n", $"tot").collect().map(_.toSeq).toSet
    assert(got == want)
  }
}
