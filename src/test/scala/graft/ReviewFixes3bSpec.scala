package graft

import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}
import graft.functions.Fns
import graft.llm.{Multimodal, Similarity, TextOps}
import graft.streaming.Streaming
import graft.types.TypeMapper

/** Regression suite for the llm/streaming/functions review findings. */
class ReviewFixes3bSpec extends SparkSpec {
  import spark.implicits._

  test("split_part: out-of-range index returns '' (no ANSI throw)") {
    def one(c: org.apache.spark.sql.Column): String =
      spark.range(1).select(c).as[String].head()
    val s = lit("a#b#c")
    assert(one(Fns.splitPart(s, "#", 5)) == "")
    assert(one(Fns.splitPart(s, "#", -5)) == "")
    assert(one(Fns.splitPart(s, "#", 2)) == "b")
  }

  test("qualityScore: NULL text scores 0, not the fall-through 0.85") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("")),
      (3L, Some("the quick brown fox and the lazy dog run for it was good " * 4)))
      .toDF("id", "text")
    val got = df.select($"id", TextOps.qualityScore($"text").as("q"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.0)
    assert(got(2L) < 0.7)
    assert(got(3L) > 0.7)
  }

  test("TypeMapper: parameterized aliases and bare char types") {
    assert(TypeMapper.toSpark("NUMERIC(10,2)") ==
      org.apache.spark.sql.types.DecimalType(10, 2))
    assert(TypeMapper.toSpark("varchar") == org.apache.spark.sql.types.StringType)
    assert(TypeMapper.toSpark("CHAR") == org.apache.spark.sql.types.StringType)
    assert(TypeMapper.toSpark("VARCHAR(20)") == org.apache.spark.sql.types.StringType)
  }

  test("cosine similarity: mismatched dimensions yield NULL, not a prefix score") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f), Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("id", "a", "b")
    val got = df.select($"id", Similarity.cosine($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L).contains(1.0))
    assert(got(2L).isEmpty)
  }

  test("multimodal feature extraction survives null payload/id rows") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType, nullable = true),
      StructField("media", StructType(Seq(
        StructField("payload", BinaryType, nullable = true),
        StructField("meta", StructType(Seq(StructField("kind", StringType)))))))))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L,
        org.apache.spark.sql.Row("x".getBytes, org.apache.spark.sql.Row("image"))),
      org.apache.spark.sql.Row(null,
        org.apache.spark.sql.Row(null, org.apache.spark.sql.Row("audio"))))
    val media = spark.createDataFrame(rows, schema)
    val out = Multimodal.extractFeatures(spark, media, "doc_id", dim = 4).collect()
    assert(out.length == 2)
    assert(out.exists(r => !r.isNullAt(0) && !r.isNullAt(2)))
    assert(out.exists(r => r.isNullAt(0) && r.isNullAt(2)))
  }

  test("streaming microbatch keeps earlier batches' rows of a shared partition") {
    spark.sql("DROP TABLE IF EXISTS default.rf3b_mb")
    val part = PartitionSpec.Auto("ts", "day", Some("pt"))
    val ref = TableRef("default.rf3b_mb")
    val mk = (h: Int, id: Long) => (java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:00:00"), id)
    val rows = Seq(mk(6, 1L), mk(18, 2L)).toDF("ts", "v")
    graft.mat.Materializer.table(spark, ref,
      graft.exec.AtomicWriter.withPartitionCols(rows.limit(0), part), part)
    // two files → with maxFilesPerTrigger=1, TWO micro-batches hit the
    // same day partition; the old per-batch overwrite kept only batch 2
    val tmp = java.nio.file.Files.createTempDirectory("rf3b_src")
    rows.filter($"v" === 1L).write.parquet(tmp.toString + "/f1")
    rows.filter($"v" === 2L).write.parquet(tmp.toString + "/f2")
    val stream = spark.readStream.schema(rows.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(tmp.toString + "/f*")
    val ckpt = java.nio.file.Files.createTempDirectory("rf3b_ckpt")
    val q = Streaming.microbatchStream(spark, stream, ref, part, ckpt.toString)
    Streaming.runToCompletion(q)
    val got = spark.table(ref.render).select("v").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("SQL model with malformed SET header fails loudly") {
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.SqlModels.runSqlModel(spark, "default", "rf3b_bad",
        "SET spark.sql.shuffle.partitions 16;\nSELECT 1 AS x")
    }
    assert(e.getMessage.contains("SET-header"))
  }
}
