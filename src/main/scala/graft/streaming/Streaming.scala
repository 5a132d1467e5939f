package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.catalog.{PartitionSpec, TableRef}
import graft.exec.Incremental

/** Optional Structured-Streaming execution mode. The reference has no
  * streaming engine (SURVEY.md §2.6): its "microbatch" is batch-over-event-
  * time-windows. This module offers the streaming equivalents Spark makes
  * natural, without changing any batch semantics:
  *
  *  - `microbatchStream`: file-source stream → dynamic partition overwrite
  *    per micro-batch via foreachBatch, `Trigger.AvailableNow` (process the
  *    backlog, then stop) — the streaming twin of Incremental.microbatch;
  *  - `windowedCounts`: watermarked event-time windowed aggregation;
  *  - appends to a catalog table with exactly-once file-sink semantics.
  */
object Streaming {

  /** Read a parquet path as a stream with the schema of its static twin
    * (file streams require an explicit schema). */
  def parquetStream(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(path)
  }

  /** Watermarked sliding/tumbling windowed aggregation over an event stream:
    * (window_start, window_end, event_type, n, total_value). */
  def windowedCounts(events: DataFrame, tsCol: String, watermark: String,
      windowLen: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming microbatch: every micro-batch is applied as a dynamic
    * partition overwrite of the partitions it touches — identical final
    * state to the batch `Incremental.microbatch`, driven by the stream.
    * `Trigger.AvailableNow` drains the available backlog then stops, which
    * is the deterministic-batch behavior the reference's microbatch pins. */
  def microbatchStream(spark: SparkSession, src: DataFrame, target: TableRef,
      partition: PartitionSpec, checkpointDir: String): StreamingQuery =
    src.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Incremental.insertOverwriteDynamic(spark, target, batch, partition)
      }
      .start()

  /** Drive a streaming query to completion of the available data. */
  def runToCompletion(q: StreamingQuery): Unit = {
    q.awaitTermination()
  }
}
