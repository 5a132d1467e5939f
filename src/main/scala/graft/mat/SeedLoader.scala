package graft.mat

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog.TableRef
import graft.exec.AtomicWriter

/** M11 `seed`: CSV → typed table, reproducing the reference's inference
  * rules exactly (impl.py:381-401):
  *   - text → string
  *   - numeric with any decimal point → decimal(38,18)
  *   - all-integer numeric → bigint
  *   - datetime/time → timestamp  (NOT timestamp_ntz — impl.py:394-401 pins
  *     this deliberately)
  * Per-column overrides (`column_types`) win over inference
  * (seeds.sql:1-25). Spark's own `inferSchema` yields IntegerType/DoubleType
  * which diverges, so we read everything as string and run our own pass.
  */
object SeedLoader {

  private val intRx = """[+-]?\d+""".r
  private val decRx = """[+-]?\d*\.\d+|[+-]?\d+\.\d*""".r
  private val tsRx =
    """\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2})?(\.\d+)?)?""".r

  def inferColumnType(values: Seq[String]): DataType = {
    val nonNull = values.filter(v => v != null && v.nonEmpty)
    if (nonNull.isEmpty) StringType
    else if (nonNull.forall(v => intRx.matches(v))) LongType
    else if (nonNull.forall(v => intRx.matches(v) || decRx.matches(v)))
      DecimalType(38, 18)
    else if (nonNull.forall(v => tsRx.matches(v))) TimestampType
    else StringType
  }

  /** Read a CSV with header; infer per-column types from a bounded sample
    * (the whole seed is small by dbt convention); apply overrides; cast. */
  def load(spark: SparkSession, path: String,
      columnTypes: Map[String, String] = Map.empty,
      sampleRows: Int = 10000): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val sample = raw.limit(sampleRows).collect()
    val casts = raw.columns.map { c =>
      val idx = raw.columns.indexOf(c)
      val ty: String = columnTypes.getOrElse(c,
        inferColumnType(sample.toSeq.map(r =>
          if (r.isNullAt(idx)) null else r.getString(idx))).simpleString)
      col(c).cast(ty).as(c)
    }
    raw.select(casts.toIndexedSeq: _*)
  }

  def seed(spark: SparkSession, path: String, target: TableRef,
      columnTypes: Map[String, String] = Map.empty): Unit =
    AtomicWriter.createOrReplace(spark, load(spark, path, columnTypes), target)
}
