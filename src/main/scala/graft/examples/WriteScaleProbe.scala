package graft.examples

import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}
import graft.mat.Materializer
import graft.mat.Materializer.IncrementalStrategy

/** Write-path scaling probe: partitioned MERGE at 1× vs 10× target size
  * with a FIXED-size delta. The property that matters at 100 TB is that
  * merge cost tracks the DELTA's touched partitions, not the table: the
  * target scan is partition-pruned before the join, the delta broadcasts,
  * and the swap moves only touched directories. Growing the table 10×
  * while holding the delta fixed should therefore grow wall time far less
  * than 10× (ideally ~flat once fixed overhead dominates at this SF). */
object WriteScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Verify.session("32")
    spark.sparkContext.setLogLevel("ERROR")
    val part = PartitionSpec.Auto("o_orderdate", "month", Some("pt"))
    val orders = graft.Tables.t(spark, dir, "orders")
    // fixed delta: three months of UPDATES plus the same rows re-keyed as
    // INSERTS (new o_orderkey range) — 3 touched partitions, both merge
    // branches exercised
    val window = orders
      .filter(col("o_orderdate") >= lit("1995-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-06-01").cast("timestamp"))
    val updates = window
      .select(col("o_orderkey"), col("o_custkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") + 1).as("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    val inserts = updates
      .select((col("o_orderkey") + 900000000L).as("o_orderkey"), col("o_custkey"),
        lit("I").as("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    val delta = updates.unionByName(inserts)
    for (mult <- Seq(1, 10)) {
      spark.sql("CREATE DATABASE IF NOT EXISTS wsp")
      val tgt = TableRef(s"wsp.orders_x$mult")
      // 10×: replicate rows with shifted keys, SAME partition layout —
      // table grows, touched-partition count does not
      val base = (0 until mult).map(i =>
        orders.select((col("o_orderkey") + lit(i * 10000000L)).as("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority")))
        .reduce(_ unionByName _)
      Materializer.table(spark, tgt,
        graft.exec.AtomicWriter.withPartitionCols(base, part), part)
      val nParts = spark.sql(s"SHOW PARTITIONS ${tgt.render}").count()
      // warm run (applies the inserts too); the MEASURED run is then a
      // 3-partition all-update merge — same shape at both multipliers
      Materializer.incremental(spark, tgt, delta, IncrementalStrategy.Merge(),
        uniqueKey = Seq("o_orderkey"), partition = part)
      val t0 = System.nanoTime()
      Materializer.incremental(spark, tgt, delta, IncrementalStrategy.Merge(),
        uniqueKey = Seq("o_orderkey"), partition = part)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"mult=${mult}%2dx rows=${spark.table(tgt.render).count()}%9d " +
        f"partitions=$nParts%3d merge=$dt%5.2f s")
    }
    spark.stop()
  }
}
