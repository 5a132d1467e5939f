package graft.examples

import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}
import graft.mat.Materializer
import graft.streaming.Streaming

/** Example: the streaming execution mode end-to-end on the driver testdata.
  * Prints the windowed-aggregation row count and checks the streaming
  * microbatch reaches the same table state as its batch twin. */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val events = graft.Tables.t(spark, dir, "events")
    val tmp = java.nio.file.Files.createTempDirectory("demo_stream")
    events.write.mode("overwrite").parquet(tmp.toString)

    // 1. watermarked windowed aggregation
    val stream = Streaming.parquetStream(spark, tmp.toString)
    val agg = Streaming.windowedCounts(stream, "ts", "1 hour", "1 day")
    val q1 = agg.writeStream.format("memory").queryName("demo_win")
      .outputMode("complete").start()
    q1.processAllAvailable(); q1.stop()
    println(s"windowed_agg_rows=${spark.table("demo_win").count()}")

    // 2. streaming microbatch == batch state
    val base = events.select($"event_id", $"event_type", $"value",
      date_trunc("second", $"ts").as("ts_sec"))
    val part = PartitionSpec.Auto("ts_sec", "day", Some("pt"))
    val batchRef = TableRef("default.demo_mb_batch")
    Materializer.table(spark, batchRef,
      graft.exec.AtomicWriter.withPartitionCols(base, part), part)
    val streamRef = TableRef("default.demo_mb_stream")
    Materializer.table(spark, streamRef,
      graft.exec.AtomicWriter.withPartitionCols(base, part).limit(0), part)
    val tmp2 = java.nio.file.Files.createTempDirectory("demo_mb_src")
    base.write.mode("overwrite").parquet(tmp2.toString)
    val ckpt = java.nio.file.Files.createTempDirectory("demo_ckpt")
    val q2 = Streaming.microbatchStream(spark,
      Streaming.parquetStream(spark, tmp2.toString), streamRef, part, ckpt.toString)
    Streaming.runToCompletion(q2)
    val a = spark.table(batchRef.render).count()
    val b = spark.table(streamRef.render).count()
    println(s"microbatch_batch_rows=$a streaming_rows=$b equal=${a == b}")
    spark.stop()
  }
}
