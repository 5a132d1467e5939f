package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{Path => HPath}

/** Durable, append-only stores for INCREMENTAL dedup — the production
  * ingest loop that [[Dedup.incrementalExact]] / [[Dedup.incrementalNearDup]]
  * probe against. Round 9 proved the probe shape (shuffle ∝ batch, history
  * never rescanned); this closes the loop: each ingested batch's SURVIVOR
  * fingerprints / signatures are appended as an immutable parquet segment,
  * so the next batch dedups against history + all prior batches without
  * any store rewrite.
  *
  * Layout (one directory per store):
  * {{{
  *   <root>/segments/<batchId>/   parquet rows of that batch
  *   <root>/done-<batchId>        commit marker (created via temp+rename)
  * }}}
  *
  * Replay idempotency — the contract a replayed ingest (Spark task retry,
  * orchestrator re-run, at-least-once upstream) needs: `append` with an
  * already-committed batchId is a NO-OP (returns false), so appending the
  * same batch twice leaves the store byte-identical. The same done-marker
  * idiom as [[graft.streaming.Streaming.microbatchStream]]
  * (Streaming.scala:105): data first, marker last via atomic rename, reads
  * see only marked segments. A crash mid-append leaves an unmarked segment
  * that reads ignore and a retry overwrites.
  *
  * Scale shape: append cost ∝ batch (one parquet write, no read-modify-write
  * of history); read is a multi-path parquet scan whose per-segment
  * footers prune columns like any other scan. Segment count grows one per
  * ingest — [[compact]] folds committed segments into one when it ever
  * matters (markers make the rewrite safely distinguishable from
  * half-appends, and probes are duplicate-tolerant so a crash mid-compact
  * can only over-report, never drop). Nothing here is cached: the store
  * lives on disk, not in the session (see the cache contract note on
  * [[Dedup]]).
  */
object DedupStore {

  private def fs(spark: SparkSession, root: String) =
    new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def segDir(root: String, batchId: Long) =
    new HPath(root, s"segments/$batchId")
  private def doneMarker(root: String, batchId: Long) =
    new HPath(root, s"done-$batchId")
  private def leasePath(root: String) = new HPath(root, "compacting")

  /** Segment ids at or above this are RESERVED for [[compact]]'s merged
    * segments: appends may never use them, so a compact's output directory
    * can never collide with an in-flight append's — the id spaces are
    * disjoint by construction, which is what makes the residual
    * lease-acquired-mid-append race harmless (see [[append]]). Append ids
    * below the base are unrestricted (the -1L seed convention included). */
  val CompactBase: Long = 1L << 61

  /** Age (ms) of the compaction lease if one is held. The release between
    * exists() and getFileStatus() is a benign race: a vanished lease means
    * the compactor finished — treat as lease-free, don't surface the FNF. */
  private def leaseAge(f: org.apache.hadoop.fs.FileSystem,
      root: String): Option[Long] =
    graft.exec.Lease.age(f, leasePath(root))

  /** A lease older than this is treated as a dead compactor's leftover and
    * reclaimed (the [[graft.exec.Maintenance]] `minAgeMs` convention). A
    * LIVE compact never ages out: it heartbeats the lease mtime every
    * `min(60 s, maxAge/3)` for its whole run, so the ceiling only ever
    * reclaims a compactor that actually died. */
  private def leaseMaxAgeMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.dedupstore.leaseMaxAgeMs")
      .map(_.toLong).getOrElse(30L * 60 * 1000)

  /** Append one batch's rows as segment `batchId`. Returns true if the
    * segment was committed by THIS call, false when the batchId was already
    * committed (replay — store unchanged). Not safe for two concurrent
    * appends of the SAME batchId (last marker rename wins — fine, both
    * wrote identical data by contract); distinct batchIds never contend. */
  def append(spark: SparkSession, root: String, batchId: Long,
      rows: DataFrame): Boolean = {
    require(batchId < CompactBase,
      s"DedupStore: batchIds >= 2^61 ($CompactBase) are reserved for " +
        "compaction segments")
    val f = fs(spark, root)
    if (f.exists(doneMarker(root, batchId))) return false
    // compaction exclusion (VERDICT r10 #4): an append while the lease is
    // held FAILS LOUD instead of silently landing a segment mid-maintenance.
    // A stale lease (dead compactor — a LIVE one heartbeats) is reclaimed by
    // age, the Maintenance.recover convention. The lease is checked twice:
    // here, and again immediately before the marker rename below — the
    // rows.write between them is a full Spark job (seconds to minutes), so
    // a compact can acquire the lease mid-write; the re-check shrinks the
    // unguarded window to the rename itself. Even that residual race cannot
    // lose data: compact's merged segment lives in the disjoint
    // [[CompactBase]] id space, so the worst case is a just-committed append
    // segment the concurrent compact doesn't fold — it survives the retire
    // pass untouched and folds next time.
    def failIfCompacting(): Unit = leaseAge(f, root).foreach { age =>
      if (age <= leaseMaxAgeMs(spark)) throw new IllegalStateException(
        s"DedupStore at $root: compaction in flight (lease age ${age} ms) — " +
          "appends during the maintenance window are forbidden; retry after " +
          "compact finishes or raise spark.graft.dedupstore.leaseMaxAgeMs")
      f.delete(leasePath(root), false)
    }
    failIfCompacting()
    // data first (overwrite clears any half-written retry debris) …
    rows.write.mode("overwrite").parquet(segDir(root, batchId).toString)
    // … lease re-checked NOW (the write may have taken minutes) …
    failIfCompacting()
    // … marker last, appearing atomically via temp-create + rename. A
    // marker that appeared during the write means a concurrent replay of
    // the SAME batch committed first (identical data by contract): yield.
    if (f.exists(doneMarker(root, batchId))) return false
    val tmp = new HPath(root, s".done-$batchId.tmp")
    f.create(tmp, true).close()
    if (!f.rename(tmp, doneMarker(root, batchId)))
      throw new java.io.IOException(
        s"DedupStore: cannot commit marker for batch $batchId under $root")
    true
  }

  /** All committed segments as one DataFrame (empty schema-less reads are
    * the caller's concern: a store must have ≥ 1 committed segment).
    * Unmarked / half-written segments are invisible. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val f = fs(spark, root)
    val committed = f.listStatus(new HPath(root))
      .map(_.getPath.getName)
      .filter(_.startsWith("done-"))
      .map(_.stripPrefix("done-").toLong)
      .sorted
    require(committed.nonEmpty, s"DedupStore at $root has no committed segments")
    spark.read.parquet(
      committed.map(id => segDir(root, id).toString): _*)
  }

  /** The `_upto-<n>` provenance sidecar of a compacted fold, if present
    * (legacy folds predate it). One directory listing. */
  private def foldUpto(f: org.apache.hadoop.fs.FileSystem, root: String,
      id: Long): Option[Long] = {
    val d = segDir(root, id)
    if (!f.exists(d)) None
    else f.listStatus(d).map(_.getPath.getName)
      .collectFirst { case n if n.startsWith("_upto-") =>
        n.stripPrefix("_upto-").toLong }
  }

  /** Time-travel read: the store exactly as it stood after ingest batch
    * `asOfBatch` committed — reproduce yesterday's keep/drop decisions
    * after more ingests landed, audit a disputed drop, bisect a dedup
    * regression. Selects every committed segment with id ≤ asOfBatch,
    * plus any compacted fold whose `_upto` provenance proves it holds
    * only history ≤ asOfBatch (compaction is membership-preserving, so
    * such a fold IS those batches).
    *
    * REFUSES loudly — never silently-partial — when compaction has
    * collapsed the requested point: a fold containing ingests past
    * `asOfBatch` cannot be split back into its inputs, and excluding it
    * would misclassify every probe against the reconstruction. Size
    * compaction cadence to the audit horizon if as-of reads matter. */
  def readAsOf(spark: SparkSession, root: String,
      asOfBatch: Long): DataFrame = {
    val f = fs(spark, root)
    val committed = committedBatches(spark, root)
    require(committed.nonEmpty,
      s"DedupStore at $root has no committed segments")
    val keep = committed.filter { id =>
      if (id <= asOfBatch) true // covers normal ids and at-or-after-the-fold
      else if (id < CompactBase) false // a later ingest: simply not yet there
      else foldUpto(f, root, id) match {
        case Some(u) if u <= asOfBatch => true
        case Some(u) => throw new IllegalStateException(
          s"DedupStore at $root: compacted fold $id holds ingests up to " +
            s"$u — the store as of batch $asOfBatch cannot be " +
            "reconstructed (compaction collapsed that history); audit " +
            s"at asOfBatch >= $u, or schedule compaction outside the " +
            "audit window")
        case None => throw new IllegalStateException(
          s"DedupStore at $root: compacted fold $id predates provenance " +
            s"sidecars — the store as of batch $asOfBatch cannot be " +
            "proven reconstructible; audit at asOfBatch >= the fold id")
      }
    }
    require(keep.nonEmpty,
      s"DedupStore at $root has no committed segment at or before " +
        s"batch $asOfBatch")
    spark.read.parquet(keep.map(id => segDir(root, id).toString): _*)
  }

  /** The parquet path of one committed segment — for callers that must
    * audit a specific segment's content (e.g. [[IndexStore.mergeStores]]'s
    * replay verification) without widening to the whole-store read. */
  def segmentPath(root: String, batchId: Long): String =
    segDir(root, batchId).toString

  /** The largest ingest id PROVABLY folded into this store's compaction
    * segments — max `_upto` over committed folds, None when no fold
    * carries provenance. The compaction-cadence observable: ingest
    * segments at or below it are already collapsed (only their replay
    * markers remain), ones above still hold their own rows. */
  def foldedThrough(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val us = committedBatches(spark, root).filter(_ >= CompactBase)
      .flatMap(id => foldUpto(f, root, id))
    if (us.isEmpty) None else Some(us.max)
  }

  /** Committed batch ids, ascending — the audit view ("which ingests are
    * in this store?") and the input to an offline compaction. */
  def committedBatches(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val p = new HPath(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName).filter(_.startsWith("done-"))
      .map(_.stripPrefix("done-").toLong).sorted.toSeq
  }

  /** Fold all committed segments into ONE new segment and retire the
    * olds — the offline maintenance pass that keeps the multi-path read
    * from accumulating one footer per ingest forever. The merged segment's
    * id lives in the RESERVED [[CompactBase]] space appends can never use,
    * so its data directory is collision-free against any in-flight append
    * by construction. Returns the new segment's batchId (or the sole
    * existing id if the store is already compact).
    *
    * Crash ordering, weakest-to-strongest: (1) merged data written, (2)
    * merged marker committed, (3) OLD MARKERS removed, (4) old data
    * dirs removed. A crash before (2) leaves an unmarked dir reads
    * ignore; between (2) and (3) reads see every row TWICE — safe for
    * both probe shapes (the fp anti-join is duplicate-tolerant, the
    * near-dup candidate set is `.distinct()`-ed before scoring) and
    * healed by re-running compact; after (3) only unreferenced dirs
    * remain.
    *
    * Concurrency is mutual-exclusion-by-lease with a fail-safe fallback
    * (VERDICT r10 #4, hardened r12): compact holds a `compacting` lease
    * (created via temp+rename — the rename is the atomic arbiter between
    * two racing compacts) for its whole run and HEARTBEATS its mtime every
    * `min(60 s, maxAge/3)`, so a long compact never ages out of its own
    * exclusion; the stale ceiling (`spark.graft.dedupstore.leaseMaxAgeMs`,
    * default 30 min) only reclaims a compactor that died mid-run, the same
    * stale-marker recovery as [[graft.exec.Maintenance]]. [[append]] checks
    * the lease both before its write and before its marker rename, so a
    * mis-scheduled append fails loud rather than landing mid-maintenance.
    * The one interleaving the lease cannot serialize — an append whose
    * final check beat the lease acquisition by microseconds — is rendered
    * harmless by the disjoint id spaces: the append's segment is simply not
    * in this compact's snapshot, survives the retire pass (which deletes
    * only snapshotted ids), and folds next time. Still run compact in the
    * ingest pipeline's maintenance window; the lease turns a scheduling
    * bug into an error, and the id-space split turns the residual race
    * into at-worst deferred folding, never data loss. */
  def compact(spark: SparkSession, root: String): Long =
    compact(spark, root, None)

  /** [[compact]] bounded to an as-of horizon: folds only the ingest
    * segments with id ≤ `upToIngest` (plus every existing fold — compacted
    * history is already collapsed), leaving newer segments intact, so
    * [[readAsOf]] keeps working for every point ≥ the fold's `_upto` —
    * the cadence dial that preserves a configured audit window while
    * still bounding segment count ([[graft.exec.Maintenance]]'s
    * maintainIndexStore uses it). `None` folds everything. */
  def compact(spark: SparkSession, root: String,
      upToIngest: Option[Long]): Long = {
    val f = fs(spark, root)
    leaseAge(f, root) match {
      case Some(age) if age <= leaseMaxAgeMs(spark) =>
        throw new IllegalStateException(
          s"DedupStore at $root: another compaction holds the lease " +
            s"(age ${age} ms)")
      case Some(_) => f.delete(leasePath(root), false) // dead compactor
      case None => ()
    }
    // atomic acquire + VERIFIED heartbeat via the shared lease util (the
    // setTimes-no-op object-store fallback and the release/beat
    // serialization live there — graft.exec.Lease)
    val handle = graft.exec.Lease.tryAcquire(f, leasePath(root),
        graft.exec.Lease.intervalFor(leaseMaxAgeMs(spark)))
      .getOrElse(throw new IllegalStateException(
        s"DedupStore at $root: lost the compaction-lease race"))
    try {
      // ids snapshot AFTER the lease: an append that saw the lease cannot
      // commit a marker between this listing and the retire pass below.
      // Under a horizon bound, the snapshot keeps only in-horizon ingest
      // segments and every existing fold; newer segments survive untouched
      val ids = committedBatches(spark, root).filter(id =>
        id >= CompactBase || upToIngest.forall(id <= _))
      require(ids.nonEmpty, s"DedupStore at $root has no committed segments" +
        upToIngest.fold("")(u => s" at or below ingest id $u"))
      if (ids.size == 1) return ids.head
      // Build the merged segment from the SNAPSHOT, not a re-listing read():
      // an append whose marker lands between two listings would otherwise be
      // folded into the merge AND survive the retire pass (which deletes only
      // snapshotted ids) — permanent duplication. Reading exactly `ids` makes
      // the folded set and the retired set identical by construction; the
      // racing append's segment simply folds next time (deferred, never dup).
      //
      // The fold is ROW-GROUP-STITCHED when it can be (r16): the
      // snapshotted segments' row groups copy byte-for-byte into one file
      // (`ParquetFileWriter.appendFile` — no decode, no re-encode; empty
      // replay-marker segments contribute zero blocks), verified against
      // the source footers' row counts. Bounds keep the shape honest:
      // schema drift across segments, a cumulative row-group count past
      // 64 (stitching never merges row groups, so re-folds would fragment
      // without bound), or a fold past 1 GiB (one stitched file is a
      // sequential single-writer copy — past that, the distributed
      // re-encode is the right shape anyway) all take the classic
      // read-and-rewrite, which also resets the row-group count.
      val newId = math.max(ids.max + 1, CompactBase)
      val dstDir = segDir(root, newId)
      val segFiles = ids.flatMap { id =>
        val d = segDir(root, id)
        if (!f.exists(d)) Nil
        else f.listStatus(d).toSeq.filter(s => s.isFile &&
            !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
          .map(_.getPath)
      }
      val conf = spark.sessionState.newHadoopConf()
      if (graft.exec.ParquetStitch.stitchable(conf, f, segFiles)) {
        f.delete(dstDir, true)
        if (!f.mkdirs(dstDir))
          throw new java.io.IOException(s"DedupStore: cannot create $dstDir")
        graft.exec.ParquetStitch.stitch(conf, segFiles,
          new HPath(dstDir, "part-stitched.parquet"))
        ()
      } else {
        val merged = spark.read.parquet(
          ids.map(id => segDir(root, id).toString): _*)
        merged.write.mode("overwrite").parquet(dstDir.toString)
      }
      // provenance sidecar for [[readAsOf]]: the largest INGEST batch id
      // this fold contains (carried forward through re-compactions). The
      // underscore prefix keeps it invisible to the parquet reader; written
      // AFTER the data (overwrite-mode cleared the dir) and BEFORE the
      // marker, so a marked fold always carries its provenance. Written
      // only when EVERY folded fold carries its own `_upto` — folding a
      // provenance-less legacy fold together with new ingests and stamping
      // max(new ids) would let readAsOf silently include unprovable
      // history (wrong slice under non-monotone batch ids); unknown
      // provenance must stay unknown, never guessed, so such a fold stays
      // sidecar-less and readAsOf keeps refusing.
      val foldProvenance = ids.filter(_ >= CompactBase)
        .map(id => foldUpto(f, root, id))
      val upto = ids.filter(_ < CompactBase) ++ foldProvenance.flatten
      if (upto.nonEmpty && foldProvenance.forall(_.isDefined))
        f.create(new HPath(segDir(root, newId), s"_upto-${upto.max}"),
          true).close()
      val tmp = new HPath(root, s".done-$newId.tmp")
      f.create(tmp, true).close()
      if (!f.rename(tmp, doneMarker(root, newId)))
        throw new java.io.IOException(
          s"DedupStore: cannot commit compaction marker $newId under $root")
      ids.foreach { id => f.delete(doneMarker(root, id), false) }
      ids.foreach { id => f.delete(segDir(root, id), true) }
      newId
    } finally handle.release()
  }

  // ------------------------------------------------- fingerprint store

  /** Seed/append the exact-dedup fingerprint store: `fps` must be the
    * batch's surviving fingerprints (the `fp` column of
    * [[Dedup.incrementalExact]]'s output — already distinct within the
    * batch and disjoint from the store by construction), or a corpus's
    * [[Dedup.fingerprintStore]] for batch 0. */
  def appendFingerprints(spark: SparkSession, root: String, batchId: Long,
      fps: DataFrame): Boolean =
    append(spark, root, batchId, fps.select(col("fp")))

  /** The store as [[Dedup.incrementalExact]]'s `store` argument. No
    * distinct(): segments are pairwise disjoint by the append contract,
    * and the anti-join probe is duplicate-tolerant anyway. */
  def readFingerprints(spark: SparkSession, root: String): DataFrame =
    read(spark, root)

  // ---------------------------------------------------- near-dup store

  /** Seed/append the MinHash near-dup store with one batch's signatures:
    * `sigs` = (sid, sig) — [[Dedup.minhashSignatures]] output renamed, or
    * the `sigs` half of [[Dedup.nearDupStore]] for batch 0. Only the
    * k-wide signature is persisted (1× per doc); the 32×-narrower band
    * table is re-derived on read — a pure projection, so the stored bytes
    * stay minimal (the r9 normalization argument, now on disk). */
  def appendNearDupSigs(spark: SparkSession, root: String, batchId: Long,
      sigs: DataFrame): Boolean =
    append(spark, root, batchId, sigs.select(col("sid"), col("sig")))

  /** The store as [[Dedup.incrementalNearDup]]'s `store` argument:
    * (bands, sigs), bands derived from the persisted signatures by the
    * same kernel that built them. */
  def readNearDup(spark: SparkSession, root: String,
      bands: Int = 32): (DataFrame, DataFrame) = {
    val sigs = read(spark, root)
    val banded = sigs.select(col("sid"),
        posexplode(graft.functions.BandHashes(col("sig"), bands)))
      .select(col("pos").as("band"), col("col").as("bh"), col("sid"))
    (banded, sigs)
  }

  // ------------------------------------------------------ embedding store

  /** Seed/append the SEMANTIC near-dup store: `vecs` must carry
    * (sid, s_vec) — [[graft.llm.Similarity.embeddingStore]]'s `vectors`
    * half for batch 0, or a batch's surviving vectors projected the same
    * way. Only the vectors persist; the banded LSH index re-derives on
    * read (the [[readNearDup]] discipline — the index is `tables×` wider
    * than the ids it carries and cheap to rebuild from a narrow scan). */
  def appendVectors(spark: SparkSession, root: String, batchId: Long,
      vecs: DataFrame): Boolean =
    append(spark, root, batchId,
      vecs.select(col("sid"), col("s_vec").cast("array<double>").as("s_vec")))

  /** The store as [[graft.llm.Similarity.incrementalEmbeddingNearDup]]'s
    * `store` argument: (banded, vectors), banded re-derived from the
    * persisted vectors with the same hyperplane family (same dim / bits /
    * tables / seed) that the probe side uses. */
  def readVectors(spark: SparkSession, root: String, dim: Int,
      bits: Int = 8, tables: Int = 2,
      seed: Long = 42L): (DataFrame, DataFrame) =
    graft.llm.Similarity.embeddingStore(
      read(spark, root).select(col("sid").as("vec_id"),
        col("s_vec").as("embedding")),
      dim, bits, tables, seed)

  // ----------------------------------------------------- image-hash store

  /** Seed/append the IMAGE near-dup store: (img_id, ahash) — 8 bytes of
    * 64-bit perceptual hash per image are the ONLY persisted bytes; the
    * band index re-derives on read ([[readNearDup]]'s discipline, at its
    * extreme: the stored row is 100× smaller than a thumbnail). */
  def appendImageHashes(spark: SparkSession, root: String, batchId: Long,
      hashes: DataFrame): Boolean =
    append(spark, root, batchId,
      hashes.select(col("img_id").cast("long").as("img_id"),
        col("ahash").cast("long").as("ahash")))

  /** The store as [[graft.llm.Multimodal.ahashStoreProbe]]'s `store`
    * argument. */
  def readImageHashes(spark: SparkSession, root: String): DataFrame =
    read(spark, root)

  /** Seed/append the VIDEO near-dup store: (vid_id, n_frames, frame_idx,
    * ahash) — the clip's ordered frame-hash signature, 8 bytes per FRAME
    * (a 3-frame clip persists 24 bytes + ids; pixels never land in the
    * store and history frames are never re-decoded). */
  def appendVideoSigs(spark: SparkSession, root: String, batchId: Long,
      sigs: DataFrame): Boolean =
    append(spark, root, batchId,
      sigs.select(col("vid_id").cast("long").as("vid_id"),
        col("n_frames").cast("int").as("n_frames"),
        col("frame_idx").cast("int").as("frame_idx"),
        col("ahash").cast("long").as("ahash")))

  /** The store as [[graft.llm.Multimodal.videoStoreProbe]]'s `store`
    * argument. */
  def readVideoSigs(spark: SparkSession, root: String): DataFrame =
    read(spark, root)

  /** Seed/append the AUDIO near-dup store: (clip_id, n_frames, frame_idx,
    * sig) — the clip's ordered frame sign-pattern signature, 8 bytes per
    * FRAME (PCM samples never land in the store and history clips are
    * never re-decoded). */
  def appendAudioSigs(spark: SparkSession, root: String, batchId: Long,
      sigs: DataFrame): Boolean =
    append(spark, root, batchId,
      sigs.select(col("clip_id").cast("long").as("clip_id"),
        col("n_frames").cast("int").as("n_frames"),
        col("frame_idx").cast("int").as("frame_idx"),
        col("sig").cast("long").as("sig")))

  /** The store as [[graft.llm.Multimodal.audioStoreProbe]]'s `store`
    * argument. */
  def readAudioSigs(spark: SparkSession, root: String): DataFrame =
    read(spark, root)
}
