package graft.examples
import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}
import graft.mat.Materializer
import graft.mat.Materializer.IncrementalStrategy
object M04Profile {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.Verify.session("32")
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.sql("CREATE DATABASE IF NOT EXISTS prof")
    val part = PartitionSpec.Auto("o_orderdate", "month", Some("pt"))
    val tgt = TableRef("prof.orders_part")
    val orders = graft.Tables.t(spark, dir, "orders")
    time("ctas") {
      Materializer.table(spark, tgt, graft.exec.AtomicWriter.withPartitionCols(
        orders.filter(col("o_orderdate") < lit("1995-07-01").cast("timestamp")), part), part)
    }
    val src = orders.filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    // phase simulation of merge internals
    val srcP = graft.exec.AtomicWriter.withPartitionCols(src, part)
      .persist()
    val tgtDf = spark.table(tgt.render)
    time("src persist+count")(srcP.count())
    val touched = time("touched partitions") {
      val fromSrc = srcP.select(col("pt").cast("string")).distinct()
      val matched = tgtDf.join(srcP.select(col("o_orderkey")).distinct(),
        Seq("o_orderkey"), "left_semi").select(col("pt").cast("string")).distinct()
      fromSrc.union(matched).distinct().collect().map(_.getString(0)).toSet
    }
    println("TOUCHED=" + touched.size)
    val scopedTgt = tgtDf.filter(col("pt").cast("string").isin(touched.toSeq: _*))
    time("scoped tgt count")(scopedTgt.count())
    time("merge") {
      Materializer.incremental(spark, tgt, src, IncrementalStrategy.Merge(),
        uniqueKey = Seq("o_orderkey"), partition = part)
    }
    time("count")(println("ROWS=" + spark.table(tgt.render).count()))
    spark.stop()
  }
}
