package graft.examples

import org.apache.spark.sql.functions._

/** Where does partitioned-CTAS time go: shuffle+file write vs saveAsTable
  * catalog registration? */
object CtasProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Verify.session("32")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ctas] $label%-38s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val orders = graft.Tables.t(spark, "/root/testdata/sf0.1", "orders")
      .filter(col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
      .withColumn("pt", date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM"))
    orders.count() // warm read
    val rep = orders.repartition(col("pt"))
    val tmp = java.nio.file.Files.createTempDirectory("ctas_prof")
    time("plain dir write (42 partitions)") {
      rep.write.mode("overwrite").partitionBy("pt").parquet(s"$tmp/plain")
    }
    time("plain dir write again") {
      rep.write.mode("overwrite").partitionBy("pt").parquet(s"$tmp/plain2")
    }
    spark.sql("CREATE DATABASE IF NOT EXISTS ctasprof")
    time("saveAsTable (42 partitions)") {
      rep.write.mode("overwrite").partitionBy("pt")
        .format("parquet").saveAsTable("ctasprof.t1")
    }
    time("saveAsTable again (overwrite)") {
      rep.write.mode("overwrite").partitionBy("pt")
        .format("parquet").saveAsTable("ctasprof.t2")
    }
    time("unpartitioned saveAsTable") {
      orders.write.mode("overwrite").format("parquet")
        .saveAsTable("ctasprof.t3")
    }
    spark.stop()
  }
}
