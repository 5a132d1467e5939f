package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink facade. The reference reads MaxCompute tables and CSV seeds;
  * the engine's native storage is parquet in the session catalog
  * (`spark.table` / `saveAsTable` via Materializer). This facade adds the
  * file formats Spark makes free — all columnar-scanned, predicate-pushed
  * where the format supports it (parquet/orc), schema-explicit for the
  * text formats (csv/json) so reads are deterministic. */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
      header: Boolean = true, delimiter: String = ","): DataFrame = {
    var r = spark.read.option("header", header.toString).option("sep", delimiter)
    schema.foreach(s => r = r.schema(s))
    r.csv(path)
  }

  def json(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    var r = spark.read
    schema.foreach(s => r = r.schema(s))
    r.json(path)
  }

  /** JSONL ingest with corrupt-line QUARANTINE — the arrival format of
    * web-scale text corpora, where a crawl batch always contains some
    * malformed lines and silently dropping them (FAILFAST's sibling
    * DROPMALFORMED) hides the first data-quality signal of the batch.
    * PERMISSIVE mode parses every line, captures unparseable ones verbatim
    * in `corruptCol` (all data columns NULL), and leaves clean rows with a
    * NULL `corruptCol` — one scan yields both streams. At scale, split the
    * result once into data and quarantine sinks (or cache before a dual
    * aggregate: Spark refuses plans that reference ONLY the internal
    * corrupt column of a live JSON scan). */
  def jsonl(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** Parquet read with ROW PROVENANCE attached: `_file_path` /
    * `_file_size` from Spark's hidden `_metadata` struct — the lineage
    * stamp a training pipeline carries so any bad example can be traced
    * back to the exact ingest file (and the file re-quarantined). Free at
    * scan time: the metadata struct is populated per split, no extra IO. */
  def parquetWithProvenance(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    df.select((df.columns.map(org.apache.spark.sql.functions.col) ++ Seq(
      org.apache.spark.sql.functions.col("_metadata.file_path").as("_file_path"),
      org.apache.spark.sql.functions.col("_metadata.file_size").as("_file_size"))): _*)
  }

  /** Union parquet slabs whose schemas EVOLVED across ingest generations —
    * columns added over time and integral/floating types widened (the two
    * changes a long-lived feed actually makes). Each slab is read with its
    * OWN schema, every shared column is cast to the WIDEST type any slab
    * uses (byte < short < int < long < float < double — parquet's own
    * `mergeSchema` hard-fails on an int→long widen), and the slabs fold
    * with `unionByName(allowMissingColumns = true)` so columns missing
    * from older slabs back-fill NULL. Incompatible redefinitions (string →
    * numeric, nested changes) fail loudly at plan time rather than
    * corrupting rows. Per-slab work is a projection — no shuffle; the
    * union is a plan concatenation, so the whole ingest stays one scan per
    * slab at any history length. */
  def unionEvolved(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    require(paths.nonEmpty, "unionEvolved needs at least one slab")
    val dfs = paths.map(p => spark.read.parquet(p))
    val rank: Map[DataType, Int] = Map(ByteType -> 1, ShortType -> 2,
      IntegerType -> 3, LongType -> 4, FloatType -> 5, DoubleType -> 6)
    val widest = dfs.flatMap(_.schema.fields).groupBy(_.name).map {
      case (name, fields) =>
        val types = fields.map(_.dataType).distinct
        val w = types.reduce { (a, b) =>
          if (a == b) a
          else (rank.get(a), rank.get(b)) match {
            case (Some(ra), Some(rb)) => if (ra >= rb) a else b
            case _ => throw new IllegalArgumentException(
              s"column '$name' redefined incompatibly across slabs: $a vs $b")
          }
        }
        name -> w
    }
    dfs.map { df =>
      df.select(df.columns.map(c =>
        org.apache.spark.sql.functions.col(c).cast(widest(c)).as(c)).toSeq: _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  def write(df: DataFrame, path: String, format: String,
      mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil): Unit = {
    var w = df.write.mode(mode).format(format)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.save(path)
  }
}
