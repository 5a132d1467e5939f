package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import graft.streaming.Streaming

/** The testdata's naive-µs parquet surfaces event times as TIMESTAMP_NTZ,
  * and Spark's event-time builtins (`unix_millis`, watermarks, `window`)
  * accept only TIMESTAMP — round 8 lost q26 to exactly that. This matrix
  * runs every time-driven operator over BOTH flavors and pins the shared
  * contract: no operator throws on NTZ, results are value-identical across
  * flavors, and outputs come back in the source column's flavor. */
class TsFlavorSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Small events slice in each flavor (value-identical wall clocks; the
    * session is pinned UTC so the cast is a reinterpretation). */
  private def events(flavor: String): DataFrame =
    Tables.t(spark, dir, "events").filter($"user_id" <= 40)
      .select($"user_id", $"ts".cast(flavor).as("ts"),
        $"event_id", $"event_type", $"value")

  private val flavors = Seq("timestamp", "timestamp_ntz")

  private def tsType(flavor: String) =
    if (flavor == "timestamp_ntz") TimestampNTZType else TimestampType

  /** Flavor-blind row image: timestamps rendered as strings. */
  private def image(df: DataFrame): Seq[Seq[String]] =
    df.select(df.columns.map(c => col(c).cast("string").as(c)): _*)
      .collect().toSeq.map(_.toSeq.map(String.valueOf))
      .sortBy(_.mkString("|"))

  // ------------------------------------------------------- sessionizeBatch

  for (fl <- flavors) test(s"sessionizeBatch accepts $fl and keeps its flavor") {
    val out = Streaming.sessionizeBatch(
      events(fl).select($"user_id", $"ts"), gapMinutes = 30)
    assert(out.schema("session_start").dataType == tsType(fl))
    assert(out.schema("session_end").dataType == tsType(fl))
    assert(out.count() > 0)
  }

  test("sessionizeBatch: both flavors yield identical sessions") {
    val Seq(a, b) = flavors.map(fl => image(Streaming.sessionizeBatch(
      events(fl).select($"user_id", $"ts"), gapMinutes = 30)))
    assert(a == b)
  }

  // ------------------------------------------------ streaming windowed agg

  // Each stream-run is memoized behind a helper the per-flavor tests AND
  // the cross-flavor comparison tests call, so a comparison never depends
  // on an earlier test having populated the memory table (ADVICE r9: under
  // a test filter or after an abort the table was simply missing). The
  // helper returns the pre-start schema for the flavor assertions.
  private val winSchemas =
    scala.collection.mutable.Map.empty[String, org.apache.spark.sql.types.StructType]
  private def runWindowed(fl: String): org.apache.spark.sql.types.StructType =
    winSchemas.getOrElseUpdate(fl, {
      val src = events(fl)
      val tmp = java.nio.file.Files.createTempDirectory(s"flav_win_$fl")
      src.write.mode("overwrite").parquet(tmp.toString)
      val agg = Streaming.windowedCounts(
        Streaming.parquetStream(spark, tmp.toString), "ts", "1 hour", "1 day")
      val q = agg.writeStream.format("memory").queryName(s"flav_win_$fl")
        .outputMode("complete").start()
      q.processAllAvailable(); q.stop()
      agg.schema
    })

  for (fl <- flavors) test(s"windowedCounts streams $fl and returns $fl bounds") {
    val sch = runWindowed(fl)
    assert(sch("window_start").dataType == tsType(fl))
    assert(spark.table(s"flav_win_$fl").count() > 0)
  }

  test("windowedCounts: both flavors yield identical windows") {
    val imgs = flavors.map { fl =>
      runWindowed(fl)
      image(spark.table(s"flav_win_$fl"))
    }
    assert(imgs.head == imgs(1))
  }

  // ----------------------------------------------------------- dedupStream

  for (fl <- flavors) test(s"dedupStream accepts $fl and keeps its flavor") {
    val src = events(fl).select($"event_id", $"ts")
    val dup = src.unionByName(src.limit(20))
    val tmp = java.nio.file.Files.createTempDirectory(s"flav_dedup_$fl")
    dup.write.mode("overwrite").parquet(tmp.toString)
    val out = Streaming.dedupStream(
      Streaming.parquetStream(spark, tmp.toString),
      tsCol = "ts", watermark = "1 hour", keys = Seq("event_id"))
    assert(out.schema("ts").dataType == tsType(fl))
    val q = out.writeStream.format("memory").queryName(s"flav_dedup_$fl")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table(s"flav_dedup_$fl").count() == src.count())
  }

  // --------------------------------------- intervalJoin, MIXED flavors too

  private val ijSchemas =
    scala.collection.mutable.Map.empty[(String, String), org.apache.spark.sql.types.StructType]
  private def runIntervalJoin(lf: String, rf: String): org.apache.spark.sql.types.StructType =
    ijSchemas.getOrElseUpdate((lf, rf), {
      val clicks = events(lf).filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id")
      val purchases = events(rf).filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id", $"value")
      val t1 = java.nio.file.Files.createTempDirectory(s"flav_ij_l_$lf$rf")
      val t2 = java.nio.file.Files.createTempDirectory(s"flav_ij_r_$lf$rf")
      clicks.write.mode("overwrite").parquet(t1.toString)
      purchases.write.mode("overwrite").parquet(t2.toString)
      val joined = Streaming.intervalJoin(
        Streaming.parquetStream(spark, t1.toString),
        Streaming.parquetStream(spark, t2.toString),
        key = "user_id", tsCol = "ts", watermark = "0 seconds",
        before = "1 HOUR", after = "1 HOUR")
      val q = joined.writeStream.format("memory")
        .queryName(s"flav_ij_$lf$rf").outputMode("append").start()
      q.processAllAvailable(); q.stop()
      joined.schema
    })

  for (lf <- flavors; rf <- flavors)
    test(s"intervalJoin left=$lf right=$rf restores each side's own flavor") {
      val sch = runIntervalJoin(lf, rf)
      // the output flavor of each side follows ITS OWN input, not the left's
      assert(sch("l_ts").dataType == tsType(lf))
      assert(sch("r_ts").dataType == tsType(rf))
      assert(spark.table(s"flav_ij_$lf$rf").count() > 0)
    }

  test("intervalJoin: all four flavor combinations join identically") {
    val imgs = for (lf <- flavors; rf <- flavors) yield {
      runIntervalJoin(lf, rf)
      image(spark.table(s"flav_ij_$lf$rf")
        .select($"user_id", $"l_ts", $"r_ts", $"l_event_id", $"r_event_id"))
    }
    assert(imgs.distinct.size == 1)
  }

  // --------------------------------------------------- streaming sessionize

  private val sessSchemas =
    scala.collection.mutable.Map.empty[String, org.apache.spark.sql.types.StructType]
  private def runSessionize(fl: String): org.apache.spark.sql.types.StructType =
    sessSchemas.getOrElseUpdate(fl, {
      val src = events(fl).filter($"user_id" <= 10).select($"user_id", $"ts")
      val tmp = java.nio.file.Files.createTempDirectory(s"flav_sess_$fl")
      src.write.mode("overwrite").parquet(tmp.toString)
      val sessions = Streaming.sessionizeStream(
        Streaming.parquetStream(spark, tmp.toString),
        java.time.Duration.ofMinutes(30), watermark = "0 seconds")
      val q = sessions.writeStream.format("memory").queryName(s"flav_sess_$fl")
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
      sessions.schema
    })

  for (fl <- flavors)
    test(s"sessionizeStream accepts a $fl source and keeps its flavor") {
      val sch = runSessionize(fl)
      assert(sch("session_start").dataType == tsType(fl))
      assert(sch("session_end").dataType == tsType(fl))
      assert(spark.table(s"flav_sess_$fl").count() > 0)
    }

  test("sessionizeStream: both flavors emit identical closed sessions") {
    val imgs = flavors.map { fl =>
      runSessionize(fl); image(spark.table(s"flav_sess_$fl"))
    }
    assert(imgs.head == imgs(1))
  }

  test("sessionizeStream keeps MICROSECOND bounds — exact parity with the batch twin") {
    // raw µs event times, no truncation: every closed streaming session
    // must equal a batch session bit-for-bit (getTime-based state would
    // shave the sub-ms part off every bound)
    val src = events("timestamp_ntz").filter($"user_id" <= 10)
      .select($"user_id", $"ts")
    runSessionize("timestamp_ntz")
    val streamed = image(spark.table("flav_sess_timestamp_ntz"))
    val batch = image(Streaming.sessionizeBatch(src, gapMinutes = 30))
    assert(streamed.nonEmpty)
    val missing = streamed.filterNot(batch.contains)
    assert(missing.isEmpty,
      s"streaming sessions absent from the batch twin: ${missing.take(3)}")
    // and the testdata really exercises sub-millisecond precision
    assert(streamed.exists(r => r.exists(v =>
      v.matches(".*\\.\\d{3}\\d+.*"))), "no sub-ms timestamps in sample")
  }

  // ------------------------------------------------------------ as-of join

  test("as-of join: both flavors yield identical matches (no ts builtins)") {
    val imgs = flavors.map { fl =>
      val ev = events(fl)
      val left = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id")
      val right = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value")
      image(graft.exec.AsOfJoin.backward(left, right,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts"))
    }
    assert(imgs.head.nonEmpty)
    assert(imgs.head == imgs(1))
  }

  // -------------------------------------------- UTC guard (ADVICE, round 8)

  test("NTZ event-time ops fail loudly in a non-UTC session") {
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    spark.conf.set(tzKey, "America/New_York")
    try {
      val e = intercept[IllegalArgumentException] {
        Streaming.sessionizeBatch(
          events("timestamp_ntz").select($"user_id", $"ts"), 30)
      }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set(tzKey, saved)
  }

  // --------------------------------- Verify: thrown queries stay visible

  test("a thrown query leaves an _error.txt artifact, never a silent gap") {
    val out = java.nio.file.Files.createTempDirectory("verify_err").toString
    val boom = (s: org.apache.spark.sql.SparkSession, d: String) => {
      throw new RuntimeException("deliberate failure for the artifact test")
      spark.emptyDataFrame
    }
    val err = Verify.runOne(spark, "qx_broken", boom, dir, out)
    assert(err.exists(_.contains("deliberate failure")))
    val errFile = java.nio.file.Paths.get(out, "qx_broken", "_error.txt")
    assert(java.nio.file.Files.exists(errFile))
    assert(java.nio.file.Files.readString(errFile).contains("deliberate failure"))
    // no parquet output alongside the marker
    assert(!new java.io.File(s"$out/qx_broken").listFiles()
      .exists(_.getName.endsWith(".parquet")))
    // a later SUCCESSFUL run replaces the error artifact with real output
    val ok = (s: org.apache.spark.sql.SparkSession, d: String) =>
      s.range(3).toDF("v")
    assert(Verify.runOne(spark, "qx_broken", ok, dir, out).isEmpty)
    assert(!java.nio.file.Files.exists(errFile))
    assert(new java.io.File(s"$out/qx_broken").listFiles()
      .exists(_.getName.endsWith(".parquet")))
  }

  // a FAILED run after a successful one must not leave the stale parquet
  // readable as a pass
  test("a failure after a prior success clears the stale parquet") {
    val out = java.nio.file.Files.createTempDirectory("verify_stale").toString
    val ok = (s: org.apache.spark.sql.SparkSession, d: String) =>
      s.range(3).toDF("v")
    assert(Verify.runOne(spark, "qy", ok, dir, out).isEmpty)
    val boom = (s: org.apache.spark.sql.SparkSession, d: String) => {
      throw new RuntimeException("late failure")
      spark.emptyDataFrame
    }
    assert(Verify.runOne(spark, "qy", boom, dir, out).isDefined)
    val files = new java.io.File(s"$out/qy").listFiles().map(_.getName).toSet
    assert(files == Set("_error.txt"))
  }
}
