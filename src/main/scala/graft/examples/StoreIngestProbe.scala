package graft.examples

import org.apache.spark.sql.functions._
import graft.{Tables, Verify}
import graft.llm.{Dedup, DedupStore}

/** Scale-shape probe for the store-backed ingest loop
  * ([[graft.streaming.Streaming.dedupIngestStream]]): seed the
  * fingerprint store from a history corpus, then drain TEN successive
  * ingest batches (each a fresh slab with planted duplicates of history
  * AND of the previous batch) through the SAME checkpoint, timing each
  * drain. The claim under test: per-batch cost is ∝ batch — the store
  * grows a segment per batch but holds only 16-byte fingerprints, so
  * batch k must NOT cost more than batch 1 (a history-rescan shape would
  * grow linearly in k). Also prints store rows and kept/batch so the
  * dedup semantics stay visible. */
object StoreIngestProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10000000L).selectExpr("sum(id)").collect()
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val n = docs.count()
    val histN = n * 6 / 10
    val hist = docs.filter(col("doc_id") < histN)
    val base = java.nio.file.Files.createTempDirectory("store_ingest").toString
    val store = s"$base/store"
    val t0 = System.nanoTime()
    DedupStore.appendFingerprints(spark, store, -1L, Dedup.fingerprintStore(hist))
    println(f"[storeingest] corpus $n docs, history $histN, seed " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    val batches = 10
    val slabRows = (n - histN) / batches
    for (k <- 0 until batches) {
      // slab k: fresh docs from the reserve + perturbed copies of history
      // (every 3rd) + perturbed copies of slab k−1's fresh docs (every 4th)
      val lo = histN + k * slabRows
      val fresh = docs.filter(col("doc_id") >= lo &&
        col("doc_id") < lo + slabRows)
      val histDups = hist.filter(col("doc_id") % (3 * batches) === k)
        .select((col("doc_id") + (k + 1) * 10 * n).as("doc_id"),
          concat(col("text"), lit("  ")).as("text"))
      val prevDups =
        if (k == 0) fresh.limit(0)
        else docs.filter(col("doc_id") >= lo - slabRows &&
            col("doc_id") < lo - slabRows + slabRows / 4)
          .select((col("doc_id") + (k + 1) * 10 * n + n).as("doc_id"),
            concat(col("text"), lit(" ")).as("text"))
      val slab = fresh.unionByName(histDups).unionByName(prevDups)
        .localCheckpoint()
      val slabN = slab.count()
      val tmp = s"$base/stage_$k"
      slab.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$base/src/slab-$k.parquet")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified((k + 1) * 600000L)
      val tb = System.nanoTime()
      graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.dedupIngestStream(spark,
          spark.readStream.schema(slab.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$base/src"),
          store, s"$base/out", s"$base/ckpt"))
      val dt = (System.nanoTime() - tb) / 1e9
      val storeRows = DedupStore.readFingerprints(spark, store).count()
      val kept = spark.read.parquet(s"$base/out/batch=$k").count()
      println(f"[storeingest] batch $k%2d: slab=$slabN%6d kept=$kept%6d " +
        f"store=$storeRows%7d  $dt%5.1f s")
    }
    spark.stop()
  }
}
