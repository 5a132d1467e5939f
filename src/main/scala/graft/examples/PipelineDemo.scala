package graft.examples

import org.apache.spark.sql.functions._
import graft.catalog.TableRef
import graft.mat.Materializer
import graft.mat.Materializer.IncrementalStrategy
import graft.pipeline.ModelGraph
import graft.pipeline.ModelGraph.Model
import graft.settings.EngineConf

/** End-to-end model-DAG run (the SURVEY §7.2 slice-0 pipeline, driven by the
  * topo-parallel runner): staging views → table → incremental → final view. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("ERROR")
    EngineConf.applyDefaults(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS demo")

    val models = Seq(
      Model("stg_orders")(s =>
        Materializer.ephemeral(s, "stg_orders",
          graft.Tables.t(s, dir, "orders").filter(col("o_totalprice") > 0))),
      Model("stg_customers")(s =>
        Materializer.ephemeral(s, "stg_customers", graft.Tables.t(s, dir, "customer"))),
      Model("customers", deps = Seq("stg_orders", "stg_customers"))(s =>
        Materializer.table(s, TableRef("demo.customers"),
          s.table("stg_customers").join(
            s.table("stg_orders").groupBy(col("o_custkey")).agg(
              count(lit(1)).as("number_of_orders"),
              sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total")),
            col("c_custkey") === col("o_custkey"), "left")
            .drop("o_custkey"))),
      Model("orders_inc", deps = Seq("stg_orders"))(s =>
        Materializer.incremental(s, TableRef("demo.orders_inc"),
          s.table("stg_orders"), IncrementalStrategy.Merge(),
          uniqueKey = Seq("o_orderkey"))),
      Model("summary", deps = Seq("customers", "orders_inc"))(s =>
        Materializer.view(s, TableRef("demo.summary"),
          """SELECT c_mktsegment, COUNT(*) AS n_customers,
            |CAST(SUM(total) AS DOUBLE) AS revenue
            |FROM demo.customers GROUP BY c_mktsegment""".stripMargin)))

    val statuses = ModelGraph.run(spark, models, parallelism = 4)
    statuses.toSeq.sortBy(_._1).foreach { case (n, s) => println(s"MODEL $n -> $s") }
    println("SUMMARY_ROWS=" + spark.table("demo.summary").count())
    spark.stop()
  }
}
