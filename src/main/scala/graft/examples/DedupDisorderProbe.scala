package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pins `dropDuplicatesWithinWatermark`'s drop/keep semantics when backlog
  * DISORDER exceeds the watermark horizon — the failure mode the m18 query
  * deliberately avoids by time-ordering its slabs.
  *
  * Four scenario keys ride a 4-slab backlog (slab k = hour k, drained in
  * order, watermark delay 1 hour). MEASURED semantics (Spark 4.1):
  *   A  original + duplicate in the SAME slab            → dup dropped
  *   B  duplicate replayed in the NEXT slab (state live) → dup dropped
  *   C  duplicate replayed 3 slabs later → dropped TOO, but for a
  *      different reason: rows whose event time is below the watermark
  *      are filtered as LATE before dedup even looks at state — a
  *      beyond-horizon replay cannot leak a duplicate
  *   D  brand-new key arriving 3 slabs late → ALSO dropped (late-row
  *      filtering is key-agnostic): this is the DATA-LOSS mode when the
  *      horizon under-estimates real backlog disorder — exactly why the
  *      r7 hash-partitioned m18 lost half its rows at a 1-hour horizon,
  *      and why m18 now time-orders its slabs
  * plus a bulk layer (unique filler keys per slab) so state-size
  * telemetry reflects a real backlog, not four rows.
  *
  * Prints per-key survivor counts and the max state rows any batch held —
  * state must track ~(horizon + one-batch watermark lag) worth of keys
  * (measured: 3 of 4 slabs — eviction applies the PREVIOUS batch's
  * watermark), independent of total backlog length: the bounded-state
  * property m18 claims.
  * Run: sbt 'runMain graft.examples.DedupDisorderProbe [rowsPerSlab]'. */
object DedupDisorderProbe {
  def main(args: Array[String]): Unit = {
    val rowsPerSlab = args.headOption.map(_.toInt).getOrElse(25000)
    val spark = graft.Verify.session("8")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)

    // slab k: filler keys (k*rowsPerSlab ..< (k+1)*rowsPerSlab) spread over
    // hour k, plus the scenario rows
    def slab(k: Int): DataFrame = {
      val filler = spark.range(rowsPerSlab.toLong)
        .select((col("id") + k.toLong * rowsPerSlab).as("key"),
          typedlit(k).as("slab"),
          // spread inside the hour: minute = 60k + (id mod 60)
          expr(s"timestampadd(MINUTE, ${k * 60} + id % 60, " +
            s"timestamp'2026-01-01 00:00:00')").as("ts"))
      val scen = k match {
        case 0 => Seq(
          (-1L, 0, at(30)), (-1L, 0, at(30)),    // A: dup, same slab
          (-2L, 0, at(59)),                      // B original
          (-3L, 0, at(10)))                      // C original
        case 1 => Seq((-2L, 1, at(59)))          // B dup, state live
        case 3 => Seq(
          (-3L, 3, at(10)),                      // C dup, state evicted
          (-4L, 3, at(5)))                       // D late first-occurrence
        case _ => Seq.empty
      }
      filler.unionByName(scen.toDF("key", "slab", "ts"))
    }

    val srcDir = java.nio.file.Files.createTempDirectory("g_disorder_src")
    (0 until 4).foreach { k =>
      slab(k).coalesce(1).write.parquet(s"$srcDir/data/slab=$k")
      // slab k lands at wall-clock k — the file source drains by mtime
      new java.io.File(s"$srcDir/data/slab=$k").listFiles()
        .filter(_.getName.startsWith("part-"))
        .foreach(_.setLastModified((k + 1) * 600000L))
    }

    val schema = slab(0).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/data")
    val deduped = graft.streaming.Streaming.dedupStream(
      stream, "ts", "1 hour", Seq("key"))
    val outDir = java.nio.file.Files.createTempDirectory("g_disorder_out")
    val ckpt = java.nio.file.Files.createTempDirectory("g_disorder_ckpt")

    val maxState = new java.util.concurrent.atomic.AtomicLong(0)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          e.progress.stateOperators.foreach(s =>
            maxState.getAndUpdate(m => math.max(m, s.numRowsTotal)))
      })

    graft.streaming.Streaming.runToCompletion(
      deduped.writeStream.format("parquet")
        .option("path", s"$outDir/tbl")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())

    val out = spark.read.parquet(s"$outDir/tbl")
    val scenario = out.filter(col("key") < 0)
      .groupBy("key").count().orderBy("key")
      .as[(Long, Long)].collect().toMap
    val fillers = out.filter(col("key") >= 0).count()
    println(s"=== fillers kept: $fillers of ${4L * rowsPerSlab}")
    println(s"=== A same-slab dup      -> survivors ${scenario.getOrElse(-1L, 0L)} (expect 1: dup dropped)")
    println(s"=== B next-slab dup      -> survivors ${scenario.getOrElse(-2L, 0L)} (expect 1: state live, dup dropped)")
    println(s"=== C beyond-horizon dup -> survivors ${scenario.getOrElse(-3L, 0L)} (expect 1: replay filtered as late — no leak)")
    println(s"=== D late new key       -> survivors ${scenario.getOrElse(-4L, 0L)} (expect 0: late rows dropped key-agnostically — the data-loss mode)")
    println(f"=== max state rows any batch: ${maxState.get()} " +
      f"(backlog keys ${4L * rowsPerSlab + 4}; bounded-state ratio " +
      f"${maxState.get().toDouble / (4L * rowsPerSlab + 4)}%.2f)")
    spark.stop()
  }
}
