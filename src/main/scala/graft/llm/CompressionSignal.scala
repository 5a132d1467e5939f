package graft.llm

import java.util.zip.Deflater

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compression-ratio quality signal: how well a document deflates is a
  * cheap, language-agnostic repetition detector (boilerplate and template
  * spam compress far better than natural prose) — the classic complement
  * to [[TextOps.bigramRepetition]] in crawl-filtering pipelines.
  *
  * Deflate cannot be expressed as a Catalyst expression, so this is a
  * `mapPartitions` batch kernel like the [[Multimodal]] codecs: one pass,
  * payloads never cross a shuffle, partition-parallel at any scale. Each
  * row deflates the text once and the text doubled — the doubled form's
  * marginal cost is what exposes self-similarity (a second copy of the
  * same content is nearly free under LZ77).
  */
object CompressionSignal {

  /** Raw-deflate length (no zlib header) at BEST_COMPRESSION. */
  private def deflateLen(bytes: Array[Byte]): Long = {
    val d = new Deflater(Deflater.BEST_COMPRESSION, true)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    n
  }

  /** Per-document compression signals: utf-8 byte length `n_raw`, deflate
    * length `n_deflate`, and `n_deflate2` = deflate length of the text
    * concatenated with itself. Null text ⇒ null signals. */
  def signals(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_raw", LongType),
      StructField("n_deflate", LongType),
      StructField("n_deflate2", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
          if (r.isNullAt(1)) Row(id, null, null, null)
          else {
            val b = r.getString(1).getBytes("UTF-8")
            Row(id, java.lang.Long.valueOf(b.length.toLong),
              java.lang.Long.valueOf(deflateLen(b)),
              java.lang.Long.valueOf(deflateLen(b ++ b)))
          }
        }
      }(enc)
  }
}
