package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
    .toDF("id", "name", "x")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("src_spec").toString + "/data"

  test("parquet round-trip preserves schema and values") {
    val p = tmp()
    Sources.write(df, p, "parquet")
    val got = Sources.parquet(spark, p)
    // file sources relax nullability; compare names+types
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(got.orderBy($"id").collect().toSeq == df.orderBy($"id").collect().toSeq)
  }

  test("orc round-trip preserves schema and values") {
    val p = tmp()
    Sources.write(df, p, "orc")
    val got = Sources.orc(spark, p)
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(got.count() == 3)
  }

  test("csv round-trip with explicit schema") {
    val p = tmp()
    Sources.write(df, p, "csv", partitionBy = Nil)
    val got = Sources.csv(spark, p, Some(df.schema), header = false)
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(got.orderBy($"id").collect().toSeq == df.orderBy($"id").collect().toSeq)
  }

  test("json round-trip with explicit schema") {
    val p = tmp()
    Sources.write(df, p, "json")
    val got = Sources.json(spark, p, Some(df.schema))
    assert(got.orderBy($"id").collect().toSeq == df.orderBy($"id").collect().toSeq)
  }

  test("jsonl ingest quarantines corrupt lines instead of dropping them") {
    import org.apache.spark.sql.types._
    val p = tmp()
    val lines = Seq(
      """{"id":1,"t":"ok"}""",
      """{"id":2,"t":"also ok"}""",
      """{"id":3,"t":"truncat""", // invalid: unterminated string/object
      """not json at all""")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
    java.nio.file.Files.write(java.nio.file.Paths.get(p, "part.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType)))
    val got = Sources.jsonl(spark, p, schema).cache()
    assert(got.count() == 4, "no line may be silently dropped")
    val clean = got.filter($"_corrupt_record".isNull)
    assert(clean.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val corrupt = got.filter($"_corrupt_record".isNotNull)
      .select($"_corrupt_record").as[String].collect().sorted.toSeq
    assert(corrupt == lines.drop(2).sorted, "corrupt lines kept verbatim")
    got.unpersist()
  }

  test("partitioned file sink lays out partition directories") {
    val p = tmp()
    Sources.write(df.withColumn("pt", $"id" % 2), p, "parquet",
      partitionBy = Seq("pt"))
    val dirs = new java.io.File(p).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == Set("pt=0", "pt=1"))
    // partition pruning reaches the scan
    val plan = Sources.parquet(spark, p).filter($"pt" === 1)
      .queryExecution.executedPlan.toString
    assert(spark.read.parquet(p).filter($"pt" === 1).count() == 2)
  }

  test("unionEvolved widens types, back-fills added columns, rejects redefinitions") {
    val base = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1, 10)).toDF("id", "n")
      .write.parquet(s"$base/a")                       // id INT, n INT
    Seq((2L, 20.5, "en")).toDF("id", "n", "lang")
      .write.parquet(s"$base/b")                       // id LONG, n DOUBLE, +lang
    val u = Sources.unionEvolved(spark, Seq(s"$base/a", s"$base/b"))
    // widest types win: id → long, n → double; lang back-fills NULL
    assert(u.schema("id").dataType.typeName == "long")
    assert(u.schema("n").dataType.typeName == "double")
    val rows = u.select($"id", $"n", $"lang").collect()
      .map(_.toSeq).sortBy(_.head.toString)
    assert(rows.toSeq == Seq(Seq(1L, 10.0, null), Seq(2L, 20.5, "en")))
    // a string→numeric redefinition must fail loudly, not corrupt rows
    Seq(Tuple1("oops")).toDF("n").write.parquet(s"$base/c")
    val e = intercept[IllegalArgumentException] {
      Sources.unionEvolved(spark, Seq(s"$base/a", s"$base/c"))
    }
    assert(e.getMessage.contains("redefined incompatibly"))
  }
}
