package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with a typed metadata struct, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` produces a deterministic fake feature vector
  * derived from the payload bytes. Everything around it — schema, batch
  * iteration via `mapPartitions`, partition-parallel execution, typed output
  * schema — is real and is what matters for the Spark-side contract. Swap
  * `decodeStub` for a real codec (e.g. javacv) without touching the plan.
  */
object Multimodal {

  /** media struct: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),        // image | audio | video
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Build a synthetic media column from any source frame (payload = utf8
    * bytes of a text column; metadata derived deterministically). Used to
    * exercise the pipeline without binary fixtures. */
  def synthesize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      struct(
        encode(col(textCol), "UTF-8").as("payload"),
        struct(
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(xxhash64(col(idCol)), lit(3)) + 1).cast("int")).as("kind"),
          (pmod(xxhash64(col(idCol), lit(1)), lit(1920)) + 1).cast("int").as("width"),
          (pmod(xxhash64(col(idCol), lit(2)), lit(1080)) + 1).cast("int").as("height"),
          lit(16000).as("sample_rate"),
          (pmod(xxhash64(col(idCol), lit(3)), lit(60000)) + 1000).as("duration_ms")
        ).as("meta")).as("media"))

  /** ======= STUB ======= deterministic fake decode: 8 "features" from a
    * rolling hash over payload bytes. A real implementation would decode the
    * image/audio here; the signature and batch shape are the contract. */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(j) = (h % 1000L).toFloat / 1000.0f
      j += 1
    }
    out
  }

  /** Synthetic images with REAL bytes: each payload is a structurally
    * valid PNG/JPEG/GIF/BMP (format cycles with the id; dimensions derive
    * deterministically from it), built by [[ImageHeaders]]. Unlike
    * [[synthesize]]'s opaque text-byte payloads, these exercise an actual
    * header decode. */
  def synthesizeImages(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("id")).mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(0)) Row(null, null)
        else {
          val id = r.getLong(0)
          val w = 1 + (id % 31).toInt
          val h = 1 + (id % 17).toInt
          val payload = (id % 4) match {
            case 0 => ImageHeaders.png(w, h)
            case 1 => ImageHeaders.jpeg(w, h)
            case 2 => ImageHeaders.gif(w, h)
            case _ => ImageHeaders.bmp(w, h)
          }
          Row(id, payload)
        }
      }
    }(enc)
  }

  /** The real header decode: (id, format, width, height) parsed from the
    * payload BYTES via [[ImageHeaders.dims]] — not taken from metadata.
    * Unrecognized/truncated payloads yield NULL columns, not failures
    * (corrupt members are the norm in crawled media at scale). */
  def imageDims(media: DataFrame, idCol: String = "id",
      payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
          // positional access: upstream mapPartitions rows may be schemaless
          ImageHeaders.dims(r.getAs[Array[Byte]](1)) match {
            case Some((f, w, h)) =>
              Row(id, f, Integer.valueOf(w), Integer.valueOf(h))
            case None => Row(id, null, null, null)
          }
        }
      }(enc)
  }

  /** Feature extraction over media payloads: partition-parallel
    * `mapPartitions` (the Scala analogue of `mapInPandas` batch UDFs — one
    * iterator per partition, no per-row SerDe setup). Output:
    * (id, kind, features array<float>). */
  def extractFeatures(spark: SparkSession, media: DataFrame, idCol: String,
      dim: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("kind", StringType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col(idCol).cast("long").as("id"),
        col("media.payload").as("payload"), col("media.meta.kind").as("kind"))
      .mapPartitions { rows =>
        // per-partition init would open the codec ONCE here (batch shape).
        // Null-safe per row: a null id or payload yields null features
        // instead of an NPE that kills the whole extraction job.
        rows.map { r =>
          val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
          val payload = r.getAs[Array[Byte]]("payload")
          val feats = if (payload == null) null else decodeStub(payload, dim).toSeq
          Row(id, if (r.isNullAt(2)) null else r.getString(2), feats)
        }
      }(enc)
  }

  /** Resize metadata op (pure column math — a real pipeline would also remap
    * the payload; the stub keeps payload opaque). */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("media.meta.width")
    val h = col("media.meta.height")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    media.withColumn("resized_width", floor(w * scale).cast("int"))
      .withColumn("resized_height", floor(h * scale).cast("int"))
  }

  /** Frame sampling for video rows: one output row per sampled frame index
    * at `fps` over the clip duration (pure explode — partition-parallel). */
  def sampleFrames(media: DataFrame, idCol: String, fps: Double): DataFrame =
    media.filter(col("media.meta.kind") === "video")
      .select(col(idCol),
        explode(sequence(lit(0L),
          greatest(floor(col("media.meta.duration_ms") / lit(1000.0 / fps)).cast("long") - 1, lit(0L))))
          .as("frame_idx"))
      .withColumn("frame_ts_ms",
        (col("frame_idx") * lit(1000.0 / fps)).cast("long"))
}
