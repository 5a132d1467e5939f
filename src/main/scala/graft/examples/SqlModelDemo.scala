package graft.examples
/** Example: dbt-style SQL model bodies run unchanged against the engine. */
object SqlModelDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.Verify.session("4")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("CREATE DATABASE IF NOT EXISTS demo_sql")
    graft.Tables.t(spark, dir, "orders").write.mode("overwrite")
      .saveAsTable("demo_sql.stg_orders")
    graft.pipeline.SqlModels.runSqlModel(spark, "demo_sql", "daily",
      """set odps.sql.type.system.odps2=true;
        |SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
        |FROM {{ ref('stg_orders') }} GROUP BY 1""".stripMargin)
    println("SQL_MODEL_ROWS=" + spark.table("demo_sql.daily").count())
    graft.pipeline.SqlModels.runSqlModel(spark, "demo_sql", "daily_inc",
      "SELECT * FROM {{ ref('daily') }}", "incremental_merge", Seq("d"))
    graft.pipeline.SqlModels.runSqlModel(spark, "demo_sql", "daily_inc",
      "SELECT d, n + 1 AS n FROM {{ ref('daily') }} WHERE d >= (SELECT max(d) FROM {{ this }})",
      "incremental_merge", Seq("d"))
    println("INC_ROWS=" + spark.table("demo_sql.daily_inc").count())
    spark.stop()
  }
}
