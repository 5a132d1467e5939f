package graft

import graft.catalog.TableRef
import graft.pipeline.SqlModels

class SqlModelsSpec extends SparkSpec {
  import spark.implicits._

  test("ref/source/this placeholders render to relations") {
    val sql = "SELECT * FROM {{ ref('stg_orders') }} o " +
      "JOIN {{ source('raw', 'customers') }} c ON o.k = c.k " +
      "WHERE o.id > (SELECT max(id) FROM {{ this }})"
    val out = SqlModels.render(sql, TableRef("db.me"),
      r => TableRef(s"db.$r"), (s, t) => TableRef(s"${s}_lake.$t"))
    assert(out.contains("`db`.`stg_orders`"))
    assert(out.contains("`raw_lake`.`customers`"))
    assert(out.contains("`db`.`me`"))
    assert(SqlModels.refsOf(sql) == Seq("stg_orders"))
  }

  test("a dbt-style SQL model runs end-to-end: view over a ref'd table") {
    spark.sql("CREATE DATABASE IF NOT EXISTS sqlm")
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "grp", "amount")
      .write.mode("overwrite").saveAsTable("sqlm.stg_pay")
    SqlModels.runSqlModel(spark, "sqlm", "pay_by_grp",
      """set spark.sql.adaptive.enabled=true;
        |SELECT grp, CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM {{ ref('stg_pay') }} GROUP BY grp""".stripMargin)
    val got = spark.table("sqlm.pay_by_grp").orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("a", 40.0), ("b", 20.0)))
  }

  test("incremental merge model with {{ this }} subquery predicate (ref test_core.py:237-248)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS sqlm2")
    Seq((1L, 100L), (2L, 200L)).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("sqlm2.src_rows")
    // first run: CTAS
    SqlModels.runSqlModel(spark, "sqlm2", "inc",
      "SELECT * FROM {{ ref('src_rows') }}", "incremental_merge", Seq("id"))
    assert(spark.table("sqlm2.inc").count() == 2)
    // second run: only rows beyond max(id) of {{ this }}, plus an update
    Seq((2L, 999L), (3L, 300L)).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("sqlm2.src_rows")
    SqlModels.runSqlModel(spark, "sqlm2", "inc",
      "SELECT * FROM {{ ref('src_rows') }} WHERE id >= (SELECT max(id) FROM {{ this }})",
      "incremental_merge", Seq("id"))
    val got = spark.table("sqlm2.inc").orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 100L), (2L, 999L), (3L, 300L)))
  }

  test("double-quoted and two-argument ref forms render; unknown jinja fails loudly") {
    import graft.pipeline.SqlModels
    val self = TableRef("db.m")
    val out = SqlModels.render(
      """SELECT * FROM {{ ref("stg_orders") }} JOIN {{ ref('pkg', 'stg_cust') }}""",
      self, r => TableRef(s"db.$r"), (s, t) => TableRef(s"$s.$t"))
    assert(out.contains("`db`.`stg_orders`") && out.contains("`db`.`stg_cust`"))
    assert(SqlModels.refsOf("""{{ ref("a") }} {{ ref('p','b') }}""") == Seq("a", "b"))
    val e = intercept[IllegalArgumentException] {
      SqlModels.render("SELECT {{ config(x=1) }}", self,
        r => TableRef(r), (s, t) => TableRef(t))
    }
    assert(e.getMessage.contains("unsupported jinja"))
  }

  test("model SET-header settings are scoped to the run and restored") {
    import graft.pipeline.SqlModels
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val before = spark.conf.get(key)
    spark.sql("CREATE DATABASE IF NOT EXISTS sm_scope")
    SqlModels.runSqlModel(spark, "sm_scope", "scoped",
      s"SET $key=12345;\nSELECT 1 AS x")
    assert(spark.conf.get(key) == before,
      "model header setting leaked into the shared session")
  }
}
