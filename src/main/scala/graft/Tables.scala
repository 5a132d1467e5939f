package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Testdata access. The `events` table is nanosecond-precision parquet,
  * which Spark's vectorized reader rejects; with
  * `spark.sql.legacy.parquet.nanosAsLong=true` it surfaces as a LongType of
  * nanos-since-epoch, which we convert to a microsecond timestamp here
  * (floor division — matches DuckDB's ns→µs truncation). */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema.fields.exists(f =>
        f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
