package graft.examples

import org.apache.spark.sql.functions._
import graft.{Tables, Verify}
import graft.catalog.{PartitionSpec, TableRef}
import graft.mat.Materializer
import graft.mat.Materializer.IncrementalStrategy

/** Phase timings for the m07 insert_overwrite_dyn scenario (args: sfDir). */
object M07Profile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[m07probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def eventsAgg = Tables.t(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("pt"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
    spark.sql("DROP DATABASE IF EXISTS g_m07p CASCADE")
    spark.sql("CREATE DATABASE g_m07p")
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    val tgt = TableRef("g_m07p.daily")
    timed("table-create")(Materializer.table(spark, tgt, eventsAgg, part))
    val days = timed("firstDays")(
      Tables.t(spark, dir, "events").select(date_format(col("ts"), "yyyy-MM-dd").as("pt"))
        .distinct().orderBy(col("pt")).limit(3).collect().map(_.getString(0)).toSeq)
    val src = eventsAgg.filter(col("pt").isin(days: _*))
      .withColumn("total_value", col("total_value") * 2)
    timed("incremental")(Materializer.incremental(spark, tgt, src,
      IncrementalStrategy.InsertOverwrite, partition = part))
    timed("read-final")(spark.table(tgt.render).orderBy(col("pt"), col("event_type")).collect())
    println("[m07probe] npartitions=" +
      spark.sql(s"SHOW PARTITIONS ${tgt.render}").count())
    spark.stop()
  }
}
