package graft

import org.apache.spark.sql.types._
import graft.catalog.{CatalogOps, TableRef}
import graft.mat.Materializer
import graft.types.TypeMapper

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("type label normalization (ref column.py:16-22)") {
    assert(TypeMapper.normalize("text") == "STRING")
    assert(TypeMapper.normalize("Integer") == "INT")
    assert(TypeMapper.normalize("BOOL") == "BOOLEAN")
    assert(TypeMapper.normalize("numeric") == "DECIMAL")
    assert(TypeMapper.normalize("real") == "FLOAT")
  }

  test("reference types round-trip to Spark types") {
    assert(TypeMapper.toSpark("bigint") == LongType)
    assert(TypeMapper.toSpark("DECIMAL(12,3)") == DecimalType(12, 3))
    assert(TypeMapper.toSpark("decimal") == DecimalType(38, 18))
    assert(TypeMapper.toSpark("varchar(20)") == StringType)
    assert(TypeMapper.toSpark("datetime") == TimestampType)
    assert(TypeMapper.toSpark("array<int>") == ArrayType(IntegerType))
    assert(TypeMapper.toSpark("map<string, bigint>") == MapType(StringType, LongType))
    assert(TypeMapper.toRef(DecimalType(12, 3)) == "DECIMAL(12,3)")
    assert(TypeMapper.toRef(ArrayType(FloatType)) == "ARRAY<FLOAT>")
    intercept[IllegalArgumentException](TypeMapper.toSpark("blob"))
  }

  test("tblproperties, lifecycle and comment persist on create") {
    Materializer.table(spark, TableRef("default.cat_props"),
      Seq((1, "x")).toDF("a", "b"),
      tblProperties = Map("transactional" -> "true"),
      lifecycleDays = Some(30), comment = Some("a table"))
    val props = spark.sql("SHOW TBLPROPERTIES default.cat_props")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("transactional") == "true")
    assert(props("graft.lifecycle.days") == "30")
    // 'comment' is reserved: Spark surfaces it as the table description
    assert(spark.catalog.getTable("default.cat_props").description == "a table")
  }

  test("column comments persist and are listable") {
    Materializer.table(spark, TableRef("default.cat_cols"),
      Seq((1, "x")).toDF("id", "name"))
    CatalogOps.setColumnComment(spark, TableRef("default.cat_cols"), "id", "the key")
    val got = CatalogOps.getColumnComments(spark, TableRef("default.cat_cols"))
    assert(got.get("id").contains("the key"))
  }

  test("grants shim stores grants as table properties (ref impl.py:509-558)") {
    Materializer.table(spark, TableRef("default.cat_grants"),
      Seq((1, "x")).toDF("a", "b"))
    CatalogOps.applyGrants(spark, TableRef("default.cat_grants"),
      Map("select" -> Seq("alice", "bob"), "insert" -> Seq("carol")))
    val props = spark.sql("SHOW TBLPROPERTIES default.cat_grants")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("graft.grant.select") == "alice,bob")
    assert(props("graft.grant.insert") == "carol")
  }

  test("catalog crawl returns one metadata row per table") {
    Materializer.table(spark, TableRef("default.cat_crawl_a"), Seq(1).toDF("x"))
    val crawl = CatalogOps.crawl(spark, "default")
    val row = crawl.filter($"table_name" === "cat_crawl_a").collect()
    assert(row.length == 1)
    assert(row.head.getAs[String]("columns") == "x:int")
  }

  test("source freshness reads storage mtimes (ref impl.py:447-462)") {
    Materializer.table(spark, TableRef("default.cat_fresh"), Seq(1).toDF("x"))
    val t = CatalogOps.lastModified(spark, TableRef("default.cat_fresh"))
    assert(t.isDefined)
    assert(math.abs(t.get.getTime - System.currentTimeMillis()) < 120000)
  }

  test("schemas: create, list, drop cascade") {
    CatalogOps.createSchema(spark, "cat_spec_db")
    assert(CatalogOps.listSchemas(spark).contains("cat_spec_db"))
    Materializer.table(spark, TableRef("cat_spec_db.t1"), Seq(1).toDF("x"))
    CatalogOps.dropSchema(spark, "cat_spec_db")
    assert(!CatalogOps.listSchemas(spark).contains("cat_spec_db"))
  }

  test("bucketed tables co-locate joins: no shuffle exchange on the join keys") {
    Materializer.table(spark, TableRef("default.bkt_a"),
      (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va"),
      bucketBy = Some((4, Seq("k"))))
    Materializer.table(spark, TableRef("default.bkt_b"),
      (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb"),
      bucketBy = Some((4, Seq("k"))))
    val joined = spark.table("default.bkt_a")
      .hint("merge") // force SMJ so broadcast doesn't mask bucketing
      .join(spark.table("default.bkt_b"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 1000)
  }

  test("TableRef three-part names collapse project+schema (not dot-in-identifier)") {
    val r = TableRef("proj.schema.tbl")
    assert(r == TableRef(Some("proj_schema"), "tbl"))
    assert(r.render == "`proj_schema`.`tbl`")
    intercept[IllegalArgumentException] { TableRef("a.b.c.d") }
  }

  test("identifiers that need quoting survive exists/drop (no backtick strip)") {
    // hyphens are rejected by the session catalog itself at CREATE; the
    // probe must still answer false, not throw on the unparseable raw name
    assert(!CatalogOps.exists(spark, TableRef(Some("default"), "cat-hyphen")))
    // a reserved word is creatable but NEEDS its backticks end-to-end
    val r = TableRef(Some("default"), "select")
    spark.sql(s"CREATE TABLE ${r.render} (id BIGINT) USING parquet")
    assert(CatalogOps.exists(spark, r))
    CatalogOps.dropRelation(spark, r)
    assert(!CatalogOps.exists(spark, r))
  }

  test("applyGrants revokes grants absent from the new config (diff-based)") {
    val r = TableRef(Some("default"), "cat_grants_rev")
    spark.sql(s"CREATE TABLE ${r.render} (id BIGINT) USING parquet")
    CatalogOps.applyGrants(spark, r, Map("select" -> Seq("alice"), "insert" -> Seq("bob")))
    CatalogOps.applyGrants(spark, r, Map("insert" -> Seq("bob")))
    val props = spark.sql(s"SHOW TBLPROPERTIES ${r.render}").collect()
      .map(row => row.getString(0) -> row.getString(1)).toMap
    assert(!props.contains("graft.grant.select"), props)
    assert(props.get("graft.grant.insert").contains("bob"))
    CatalogOps.applyGrants(spark, r, Map.empty)
    val props2 = spark.sql(s"SHOW TBLPROPERTIES ${r.render}").collect()
      .map(row => row.getString(0)).filter(_.startsWith("graft.grant."))
    assert(props2.isEmpty, props2.mkString(","))
  }

  test("TypeMapper parses parameterized map keys, structs, and round-trips toRef") {
    import org.apache.spark.sql.types._
    assert(TypeMapper.toSpark("MAP<DECIMAL(10,2),STRING>")
      == MapType(DecimalType(10, 2), StringType))
    val st = StructType(Seq(
      StructField("a", IntegerType), StructField("bQ", ArrayType(
        MapType(StringType, DecimalType(12, 3))))))
    assert(TypeMapper.toSpark(TypeMapper.toRef(st)) == st)
    assert(TypeMapper.toSpark("STRUCT<x:INT,y:STRUCT<z:DOUBLE>>")
      == StructType(Seq(StructField("x", IntegerType),
        StructField("y", StructType(Seq(StructField("z", DoubleType)))))))
  }
}
