package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{Path => HPath}

import graft.llm.Similarity.ResidualQuantizer

/** Durable ANN index artifacts — the FAISS index discipline on Spark.
  *
  * Every IVF-family query used to re-fit its k-means centroids and PQ
  * codebooks from a corpus sample ON EVERY RUN. At 100 TB the fitted
  * quantizer is a once-per-corpus artifact: `train` once, persist, and
  * every later query — and every ingest batch — LOADS it instead of
  * re-fitting (fit drift between runs also disappears: two sessions
  * searching the same store score against identical codebooks).
  *
  * Two halves, two lifecycles:
  *
  *  - **Quantizer** (`<root>/quantizer/…`): a one-shot immutable
  *    artifact — nlist coarse centroids, nlist cell means,
  *    m·codebookSize residual codebook rows, a one-row param frame.
  *    Kilobytes. Staged into a PRIVATE per-attempt directory, published
  *    by ONE atomic whole-directory rename — the rename IS the commit
  *    (see [[saveQuantizer]] for why a shared-directory marker protocol
  *    is not enough here); a crash mid-save leaves only inert staging
  *    debris, and the final directory never exists partially. Replayed
  *    and racing saves are no-ops that converge on the committed
  *    artifact.
  *  - **Codes** (`<root>/codes/…`): append-only encoded inverted-list
  *    segments — (centroid_id, corpus_id, codes) rows, m bytes of PQ
  *    code per vector — managed by [[DedupStore.append]]/[[DedupStore.read]]
  *    verbatim (same markers, same compaction lease, same replay
  *    idempotency). Indexing a NEW batch = encode against the loaded
  *    quantizer + append ONE segment: cost ∝ batch, history never
  *    re-encoded, never rescanned.
  *
  * The store holds codes, never raw vectors: full-precision vectors stay
  * in the source-of-truth corpus table, touched only by the exact
  * re-rank tail over the rerank·k ADC survivors per query
  * ([[Similarity.rerankExactCandidates]]). At m=8 / codebookSize=256 the
  * persisted index is ~8 bytes + ids per vector — the dial that keeps a
  * 100 TB corpus' index within executor memory.
  *
  * Staleness contract: the quantizer is fit ONCE (on the corpus snapshot
  * available at train time) and deliberately NOT refit as batches
  * arrive — IVF cells degrade gracefully under distribution drift
  * (recall, not correctness, decays; the exact re-rank tail keeps
  * precision exact), which is the standard production trade
  * (s16 gates recall with the quantizer fit on HALF the corpus). A
  * refit is an explicit new store, never an in-place mutation.
  */
object IndexStore {

  private def fs(spark: SparkSession, root: String) =
    new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def qDir(root: String) = new HPath(root, "quantizer")
  private def codesRoot(root: String) = s"$root/codes"

  /** True when a committed quantizer artifact exists under `root`. The
    * final `quantizer/` directory can ONLY appear via [[saveQuantizer]]'s
    * atomic whole-directory rename, so its existence IS the commit —
    * there is no observable partial state. */
  def quantizerCommitted(spark: SparkSession, root: String): Boolean =
    fs(spark, root).exists(qDir(root))

  /** Persist a fitted quantizer under `root`. Returns true if THIS call
    * committed it, false when one was already committed (replay — store
    * unchanged; the caller's quantizer is NOT compared: a store has one
    * immutable quantizer by contract, refits go to a new root).
    *
    * Commit protocol: every attempt writes into its own PRIVATE staging
    * directory (`.quantizer-tmp-<uuid>`), then publishes with ONE atomic
    * rename to `quantizer/`. A marker-file protocol over a SHARED data
    * directory is not enough here: unlike DedupStore segments (same
    * batchId ⇒ identical bytes by contract), two racing trainers hold
    * DIFFERENT fits (their own corpus slice and seed), and overwrite-mode
    * writes into one directory delete each other's in-flight task files
    * (IndexStoreSpec's four-trainer race caught exactly that). With
    * rename-as-commit the loser's rename fails, it discards its staging
    * and loads the winner's artifact — every concurrent trainer converges
    * on the ONE committed quantizer. A crash mid-save leaves only inert
    * private staging debris; the final directory never exists partially.
    *
    * Win detection is a per-attempt TOKEN, not the rename's return value:
    * Hadoop `FileSystem.rename` with an EXISTING destination directory
    * moves the source INSIDE it and returns true (HDFS semantics;
    * RawLocalFileSystem's copy fallback nests the same way), so a trainer
    * whose rename raced a just-committed winner would otherwise read
    * "true", return its OWN divergent fit to the caller, and leave its
    * staging as debris nested inside the winner's `quantizer/`. Each
    * attempt stamps `attempt-<uuid>` into its staging before the rename;
    * the attempt won iff `quantizer/attempt-<uuid>` exists AFTERWARD —
    * the token travels with the directory, so a nested loser can never
    * read as a win. Losers sweep both the un-renamed staging AND the
    * nested-inside-the-winner copy. */
  def saveQuantizer(spark: SparkSession, root: String,
      rq: ResidualQuantizer): Boolean =
    commitArtifact(spark, root, "quantizer") { base =>
      import spark.implicits._
      // ONE tagged frame, ONE write job (r19): the r18 layout wrote
      // meta/centroids/cellmeans/codebooks as four parquet dirs — four
      // driver-materialized write jobs per train, four read+collect jobs
      // per cold load, each paying full action overhead for kilobytes.
      // Rows: (kind, i, j, vec); meta rides as ("meta", dim, nlist,
      // [m, codebookSize]). Old-layout stores still load (legacy read).
      val rows: Seq[(String, Int, Int, Seq[Double])] =
        Seq(("meta", rq.dim, rq.nlist,
          Seq(rq.m.toDouble, rq.codebookSize.toDouble))) ++
        rq.centroids.map { case (i, v) => ("centroid", i, 0, v) } ++
        rq.cellMeans.toSeq.zipWithIndex.map { case (v, i) =>
          ("cellmean", i, 0, v.toSeq) } ++
        rq.codebooks.toSeq.zipWithIndex.flatMap { case (cb, mi) =>
          cb.toSeq.zipWithIndex.map { case (c, j) =>
            ("codebook", mi, j, c.toSeq) }
        }
      rows.toDF("kind", "i", "j", "vec")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/artifact")
    }

  /** The rename-as-commit protocol shared by every artifact kind under a
    * store root (`quantizer/` for the residual family, `ivf/` / `imi/`
    * for the flat-vector families): stage into a private
    * `.<dirName>-tmp-<uuid>`, stamp the attempt token, publish with one
    * rename, detect the win via the token (see [[saveQuantizer]]'s
    * scaladoc for why the rename's return value cannot be trusted).
    * Returns true iff THIS attempt's staging became the committed
    * artifact. */
  private def commitArtifact(spark: SparkSession, root: String,
      dirName: String)(write: String => Unit): Boolean = {
    val f = fs(spark, root)
    val dst = new HPath(root, dirName)
    if (f.exists(dst)) return false
    val uuid = java.util.UUID.randomUUID().toString
    val stage = new HPath(root, s".$dirName-tmp-$uuid")
    write(stage.toString)
    // the commit receipt: travels with the directory through the rename,
    // so "did MY staging become the committed dir?" is one exists() check
    val token = s"attempt-$uuid"
    f.create(new HPath(stage, token), true).close()
    f.rename(stage, dst)
    val won = f.exists(new HPath(dst, token))
    if (!won) {
      // lost the race: our staging is either still at the root (rename
      // failed outright) or nested INSIDE the winner's committed dir
      // (rename-into-existing-dst semantics) — sweep both spots
      f.delete(stage, true)
      f.delete(new HPath(dst, stage.getName), true)
      if (!f.exists(dst))
        throw new java.io.IOException(
          s"IndexStore: cannot publish $dirName under $root")
    }
    won
  }

  /** Per-root cache of loaded quantizers. The artifact is IMMUTABLE by
    * contract (a refit is a new root, never an in-place mutation), so
    * caching by committed-dir path is trivially safe; SoftReference lets
    * the JVM reclaim entries under memory pressure (each is kilobytes,
    * but a long-lived session may touch many roots). Cuts the per-call
    * reload — four bounded parquet collects — out of hot loops like the
    * streaming ingest, which calls [[appendCodes]] once per microbatch. */
  private val quantizerCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.lang.ref.SoftReference[ResidualQuantizer]]()

  /** Load the committed quantizer. Cached per root (immutable-artifact
    * contract); a cold load is bounded collects by construction:
    * nlist + nlist + m·codebookSize rows of dim-width vectors. */
  def loadQuantizer(spark: SparkSession, root: String): ResidualQuantizer = {
    require(quantizerCommitted(spark, root),
      s"IndexStore at $root has no committed quantizer — run train/" +
        "saveQuantizer (a crashed save leaves only inert staging debris; " +
        "the final directory only ever appears whole)")
    val key = fs(spark, root).makeQualified(qDir(root)).toString
    val hit = Option(quantizerCache.get(key)).flatMap(r => Option(r.get))
    hit.getOrElse {
      val rq = loadQuantizerUncached(spark, root)
      quantizerCache.put(key, new java.lang.ref.SoftReference(rq))
      rq
    }
  }

  private def loadQuantizerUncached(spark: SparkSession,
      root: String): ResidualQuantizer = {
    val base = qDir(root).toString
    // single-frame layout (r19): one read+collect for the whole artifact
    if (fs(spark, root).exists(new HPath(qDir(root), "artifact"))) {
      val rows = spark.read.parquet(s"$base/artifact")
        .select(col("kind"), col("i"), col("j"), col("vec")).collect()
      def of(kind: String) = rows.filter(_.getString(0) == kind)
      val meta = of("meta").headOption.getOrElse(throw new IllegalStateException(
        s"IndexStore at $root: quantizer artifact is corrupt — no meta row"))
      val (dim, nlist) = (meta.getInt(1), meta.getInt(2))
      val mv = meta.getSeq[Double](3)
      val (m, cbs) = (mv(0).toInt, mv(1).toInt)
      val cents = of("centroid")
        .map(r => (r.getInt(1), r.getSeq[Double](3).toArray)).sortBy(_._1)
      val means = of("cellmean")
        .map(r => (r.getInt(1), r.getSeq[Double](3).toArray)).sortBy(_._1)
      require(cents.length == nlist && means.length == nlist,
        s"IndexStore at $root: quantizer artifact is corrupt — " +
          s"${cents.length} centroids / ${means.length} cell means vs nlist=$nlist")
      val cbRows = of("codebook")
        .map(r => ((r.getInt(1), r.getInt(2)), r.getSeq[Double](3).toArray))
        .toMap
      require(cbRows.size == m * cbs,
        s"IndexStore at $root: quantizer artifact is corrupt — " +
          s"${cbRows.size} codebook rows vs m·codebookSize=${m * cbs}")
      return ResidualQuantizer(dim, nlist, m, cbs,
        cents.map { case (i, v) => (i, v.toSeq) }.toSeq,
        means.map(_._2),
        Array.tabulate(m)(mi => Array.tabulate(cbs)(j => cbRows((mi, j)))))
    }
    // legacy four-dir layout (pre-r19 stores)
    val meta = spark.read.parquet(s"$base/meta").collect()(0)
    val (dim, nlist) = (meta.getInt(0), meta.getInt(1))
    val (m, cbs) = (meta.getInt(2), meta.getInt(3))
    def vecRows(sub: String): Array[(Int, Array[Double])] =
      spark.read.parquet(s"$base/$sub")
        .select(col("centroid_id"), col("vec"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val cents = vecRows("centroids").sortBy(_._1)
    val means = vecRows("cellmeans").sortBy(_._1)
    require(cents.length == nlist && means.length == nlist,
      s"IndexStore at $root: quantizer artifact is corrupt — " +
        s"${cents.length} centroids / ${means.length} cell means vs nlist=$nlist")
    val cbRows = spark.read.parquet(s"$base/codebooks")
      .select(col("subspace"), col("code"), col("vec"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray))
      .toMap
    require(cbRows.size == m * cbs,
      s"IndexStore at $root: quantizer artifact is corrupt — " +
        s"${cbRows.size} codebook rows vs m·codebookSize=${m * cbs}")
    ResidualQuantizer(dim, nlist, m, cbs,
      cents.map { case (i, v) => (i, v.toSeq) }.toSeq,
      means.map(_._2),
      Array.tabulate(m)(mi => Array.tabulate(cbs)(j => cbRows((mi, j)))))
  }

  /** Fit a quantizer on `corpus` and persist it — the `train` step, run
    * ONCE per store. Replay-idempotent: an already-committed store wins
    * and the fresh fit is discarded. Returns the quantizer that is now
    * committed (the loaded one on replay, so concurrent trainers converge
    * on identical codebooks). */
  def train(spark: SparkSession, root: String, corpus: DataFrame, dim: Int,
      nlist: Int = 16, m: Int = 8, codebookSize: Int = 16,
      seed: Long = 42L, vecCol: String = "embedding",
      fitSampleLimit: Int = 100000): ResidualQuantizer = {
    if (quantizerCommitted(spark, root)) return loadQuantizer(spark, root)
    val rq = Similarity.fitResidualQuantizer(corpus, dim, nlist, m,
      codebookSize, seed, vecCol, fitSampleLimit)
    if (saveQuantizer(spark, root, rq)) rq else loadQuantizer(spark, root)
  }

  /** Encode one ingest batch against the COMMITTED quantizer and append
    * it as inverted-list segment `batchId`. No fit, no history read:
    * cost ∝ batch. `carryCols` lands filter metadata IN the segment (the
    * attribute-carrying index a filtered search needs — see
    * [[searchTopK]]'s matchCols; every segment of a store must carry the
    * same columns). Returns [[DedupStore.append]]'s replay contract
    * (false = batchId already committed, store unchanged). */
  def appendCodes(spark: SparkSession, root: String, batchId: Long,
      batch: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", carryCols: Seq[String] = Nil): Boolean = {
    val rq = loadQuantizer(spark, root)
    DedupStore.append(spark, codesRoot(root), batchId,
      Similarity.encodeResidual(batch, rq, idCol, vecCol, carryCols))
  }

  /** Append rows ALREADY encoded against this store's committed quantizer
    * — the encode-once seam (r19, guide §1: "share the encode slab across
    * legs"): a lifecycle that lands the same encoded batch in several
    * sibling stores (a live store and its as-of twin, a shard and its
    * merge source) or splits one encoded corpus into per-batch segments
    * pays the quantizer's literal-heavy encode plan ONCE and reuses the
    * slab. The caller owns the contract that `codes` really is
    * [[Similarity.encodeResidual]] output under THIS root's artifact —
    * same schema, same codebooks (sibling stores created via
    * [[saveQuantizer]] of one fit qualify by construction). Replay
    * contract = [[DedupStore.append]]'s. */
  def appendEncoded(spark: SparkSession, root: String, batchId: Long,
      codes: DataFrame): Boolean = {
    require(quantizerCommitted(spark, root),
      s"IndexStore at $root has no committed quantizer — appendEncoded " +
        "needs the artifact the codes were encoded against")
    DedupStore.append(spark, codesRoot(root), batchId, codes)
  }

  /** Commit `batchId` as an EMPTY segment — the replay-marker move the
    * rotation/compaction lifecycles use (a batch whose content lives in a
    * fold must still no-op on replay). Cheap by construction (r19): the
    * empty frame is a LOCAL relation with the store's committed segment
    * schema — no quantizer load, no literal-heavy encode plan, no store
    * scan; planning is microseconds and the write one empty task. The
    * r18 form (`appendCodes(root, id, batch.limit(0))`) re-planned the
    * full encode expression tree per marker — ~0.3 s each, ×10 markers
    * per rotation/fold at the bench grade. Returns false on replay. */
  def markBatchCommitted(spark: SparkSession, root: String,
      batchId: Long): Boolean = {
    val cr = codesRoot(root)
    val schema = DedupStore.read(spark, cr).schema
    DedupStore.append(spark, cr, batchId, spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema))
  }

  /** All committed inverted-list segments as one (centroid_id, corpus_id,
    * codes) frame. */
  def readCodes(spark: SparkSession, root: String): DataFrame =
    DedupStore.read(spark, codesRoot(root))

  /** Sweep crashed trainers' staging debris: deletes `.<artifact>-tmp-*`
    * directories older than `minAgeMs` (the [[graft.exec.Maintenance]]
    * `recover` convention — age-gated so a LIVE trainer's in-flight
    * staging is never swept; a healthy save lives seconds, the default
    * floor is 30 min). Sweeps BOTH root-level debris (a crash before the
    * publish rename) and debris nested INSIDE a committed artifact dir
    * (a loser whose rename raced the winner — rename-into-existing-dst
    * nests the source — and then crashed before its own sweep). Returns
    * the swept paths. Debris is inert either way — this is disk hygiene,
    * not correctness. */
  def recoverStaging(spark: SparkSession, root: String,
      minAgeMs: Long = 30L * 60 * 1000): Seq[String] = {
    val f = fs(spark, root)
    val rootPath = new HPath(root)
    if (!f.exists(rootPath)) return Nil
    val now = System.currentTimeMillis()
    def debris(st: org.apache.hadoop.fs.FileStatus): Boolean =
      st.isDirectory && st.getPath.getName.startsWith(".") &&
        st.getPath.getName.contains("-tmp-") &&
        now - st.getModificationTime >= minAgeMs
    val top = f.listStatus(rootPath).toSeq
    val committedDirs = top.filter(st => st.isDirectory
      && !st.getPath.getName.startsWith("."))
    val nested = committedDirs.flatMap(d => f.listStatus(d.getPath).toSeq)
    (top ++ nested).filter(debris)
      .map { st => f.delete(st.getPath, true); st.getPath.toString }
  }

  /** Fold all committed code segments into one ([[DedupStore.compact]] —
    * same lease, same crash contract): a long-running ingest accumulates
    * one segment per batch, and scan cost grows with file count even when
    * total rows don't. Search results are unchanged by construction (the
    * scan is a union of segments either way — IndexStoreSpec pins it).
    * Returns the merged segment's id.
    *
    * SAFE UNDER STREAMING INGEST (r16 — machinery, not convention):
    * [[DedupStore.compact]] retires the folded segments' commit markers,
    * which would make a replayed stream batch re-append its content on
    * top of the fold (double-indexing) and strand a guard-fire rotation
    * without the history ids its cutover markers must carry. So after
    * the fold commits, every folded ingest-space id is re-committed as
    * an EMPTY segment — the same marker trick [[ingestWithDriftGuard]]
    * uses across a rotation. Replays no-op, [[readAsOf]] semantics are
    * unchanged (the empty segments carry no rows; the fold still refuses
    * below its `_upto`), and the concurrent-ingest exclusion is the
    * DedupStore lease (an append during the fold fails loud; one that
    * raced past it lands in the disjoint id space and folds next time).
    * A crash between the fold and the re-marks is healed by re-running
    * compact — until then replayed batches may re-append (duplicate
    * candidates, the duplicate-tolerant probe shape), never lose rows. */
  def compactCodes(spark: SparkSession, root: String,
      upToIngest: Option[Long] = None): Long = {
    val cr = codesRoot(root)
    val before = DedupStore.committedBatches(spark, cr)
    val fold = DedupStore.compact(spark, cr, upToIngest)
    val ingestIds = before.filter(id =>
      id < DedupStore.CompactBase && upToIngest.forall(id <= _))
    if (ingestIds.nonEmpty) {
      // LOCAL empty frame (r19): `read(cr).limit(0)` re-planned the whole
      // multi-segment scan per re-mark — a local relation with the same
      // schema writes identical empty segments at no planning cost
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        DedupStore.read(spark, cr).schema)
      ingestIds.foreach(id => DedupStore.append(spark, cr, id, empty))
    }
    fold
  }

  /** Per-cell occupancy of the stored index — the denominator of the
    * staleness question this store's train-once contract raises: coarse
    * cells were placed for the corpus AS OF train time, and the way they
    * degrade under distribution drift is new batches crowding into few
    * cells (recall decays there). One map-side grouped count over the
    * narrow codes scan. For a tested retrain SIGNAL, feed the row-level
    * assignments — [[readCodes]] vs a candidate batch's
    * [[Similarity.encodeResidual]] — to
    * [[graft.exec.DataTests.driftChi2]] with centroid_id as the category
    * (dt07 gates exactly that). */
  def cellOccupancy(spark: SparkSession, root: String): DataFrame =
    readCodes(spark, root).groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n"))

  /** Top-k cosine search over the PERSISTED index: load the quantizer
    * (kilobytes), ADC-score the committed code segments against the
    * probed cells, exact-re-rank the rerank·k survivors against the raw
    * `corpus` (the source-of-truth vector table — the store itself never
    * holds vectors). ZERO fit jobs, zero corpus-side encode: the
    * corpus-scale work is one narrow scan of the code segments plus the
    * candidate-sized re-rank. */
  /** `matchCols`: metadata-FILTERED search (same-language / same-tenant
    * retrieval) — each query's neighbors come only from indexed vectors
    * agreeing with it on these columns. Requires the store's segments to
    * carry them ([[appendCodes]] carryCols). PRE-filter semantics: the
    * scan drops non-matching candidates before the rerank budget, so the
    * k survivors are the best of the FILTERED pool, and the corpus is
    * never joined ahead of the rerank tail. */
  def searchTopK(spark: SparkSession, root: String, corpus: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int = 4, rerank: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      matchCols: Seq[String] = Nil,
      asOfBatch: Long = Long.MaxValue): DataFrame = {
    require(rerank >= 1, "rerank >= 1")
    val rq = loadQuantizer(spark, root)
    // `asOfBatch`: TIME-TRAVEL search — score only segments committed at
    // or before that ingest ([[DedupStore.readAsOf]]'s contract, including
    // its loud refusal when compaction collapsed the requested point).
    // "Re-run yesterday's eval against yesterday's index, exactly" — the
    // quantizer needs no as-of (immutable per root by contract). The
    // default reads the live store.
    val codes =
      if (asOfBatch == Long.MaxValue) readCodes(spark, root)
      else DedupStore.readAsOf(spark, codesRoot(root), asOfBatch)
    val approx = Similarity.adcScoreResidual(codes,
      queries, rq, nprobe, idCol, vecCol, matchCols)
    Similarity.rerankExactCandidates(corpus, queries, approx, k, rerank,
      idCol, vecCol)
  }

  // ---------------------------------- persisted IVF-Flat / int8 / IMI stores

  /** The remaining ANN families' fit products, persisted under the same
    * rename-as-commit protocol as the residual quantizer, so NO family
    * re-fits per query or per ingest batch:
    *
    *  - **IVF artifact** (`<root>/ivf/`): the coarse centroids alone —
    *    shared by the FLAT store (segments carry raw vectors, FAISS
    *    IndexIVFFlat's layout: exact in-scan scores, no re-rank needed;
    *    the simplest store, 8·dim bytes per vector) and the INT8 store
    *    (segments carry per-vector scale + int8 codes, FAISS
    *    IndexIVFScalarQuantizer: 4× less scan traffic than float32, 8×
    *    than float64, exact re-rank tail — the memory-bandwidth shape).
    *  - **IMI artifact** (`<root>/imi/`): the two half-space codebooks —
    *    segments carry raw vectors per CELL (kA·kB cells ranked from
    *    kA+kB half-dots per probe, the coarse layer that scales to 10⁵
    *    cells).
    *
    * Segments ride [[DedupStore.append]] exactly like the residual codes
    * (markers, lease, compaction, replay), and every search leg runs ZERO
    * fit jobs: the artifact loads back as a bounded collect (cached per
    * root — immutable by the same contract), query assignment is a
    * projection / broadcast kernel, and the corpus-scale work is one
    * narrow segment scan. */
  final case class IvfArtifact(dim: Int, nlist: Int,
      centroids: Seq[(Int, Seq[Double])])

  final case class ImiArtifact(dim: Int,
      cbA: Array[Array[Double]], cbB: Array[Array[Double]])

  private val artifactCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.lang.ref.SoftReference[AnyRef]]()

  private def cached[A <: AnyRef](spark: SparkSession, root: String,
      dirName: String)(load: => A): A = {
    val key = fs(spark, root).makeQualified(new HPath(root, dirName)).toString
    Option(artifactCache.get(key)).flatMap(r => Option(r.get)) match {
      case Some(a) => a.asInstanceOf[A]
      case None =>
        val a = load
        artifactCache.put(key, new java.lang.ref.SoftReference[AnyRef](a))
        a
    }
  }

  def ivfCommitted(spark: SparkSession, root: String): Boolean =
    fs(spark, root).exists(new HPath(root, "ivf"))

  /** Persist fitted coarse centroids (the IVF-Flat / int8 families' whole
    * fit product). Same replay/race contract as [[saveQuantizer]]. */
  def saveIvf(spark: SparkSession, root: String, art: IvfArtifact): Boolean =
    commitArtifact(spark, root, "ivf") { base =>
      import spark.implicits._
      // one tagged frame, one write job (r19 — see saveQuantizer)
      (Seq(("meta", art.dim, art.nlist, Seq.empty[Double])) ++
        art.centroids.map { case (i, v) => ("centroid", i, 0, v) })
        .toDF("kind", "i", "j", "vec")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/artifact")
    }

  def loadIvf(spark: SparkSession, root: String): IvfArtifact = {
    require(ivfCommitted(spark, root),
      s"IndexStore at $root has no committed IVF artifact — run trainIvf")
    cached(spark, root, "ivf") {
      val base = new HPath(root, "ivf").toString
      if (fs(spark, root).exists(new HPath(base, "artifact"))) {
        val rows = spark.read.parquet(s"$base/artifact")
          .select(col("kind"), col("i"), col("j"), col("vec")).collect()
        val meta = rows.find(_.getString(0) == "meta")
          .getOrElse(throw new IllegalStateException(
            s"IndexStore at $root: IVF artifact is corrupt — no meta row"))
        val (dim, nlist) = (meta.getInt(1), meta.getInt(2))
        val cents = rows.filter(_.getString(0) == "centroid")
          .map(r => (r.getInt(1), r.getSeq[Double](3))).sortBy(_._1).toSeq
        require(cents.length == nlist,
          s"IndexStore at $root: IVF artifact is corrupt — " +
            s"${cents.length} centroids vs nlist=$nlist")
        IvfArtifact(dim, nlist, cents)
      } else { // legacy two-dir layout (pre-r19 stores)
        val meta = spark.read.parquet(s"$base/meta").collect()(0)
        val (dim, nlist) = (meta.getInt(0), meta.getInt(1))
        val cents = spark.read.parquet(s"$base/centroids")
          .select(col("centroid_id"), col("vec")).collect()
          .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
        require(cents.length == nlist,
          s"IndexStore at $root: IVF artifact is corrupt — " +
            s"${cents.length} centroids vs nlist=$nlist")
        IvfArtifact(dim, nlist, cents)
      }
    }
  }

  /** Fit coarse centroids on `corpus` and persist them — run ONCE per
    * store; replays load the committed artifact. */
  def trainIvf(spark: SparkSession, root: String, corpus: DataFrame,
      dim: Int, nlist: Int = 16, seed: Long = 42L,
      vecCol: String = "embedding",
      fitSampleLimit: Int = 100000): IvfArtifact = {
    if (ivfCommitted(spark, root)) return loadIvf(spark, root)
    val art = IvfArtifact(dim, nlist,
      Similarity.kmeansCentroids(corpus, nlist, seed, "", vecCol,
        fitSampleLimit))
    if (saveIvf(spark, root, art)) art else loadIvf(spark, root)
  }

  /** Encode + append one batch to a FLAT store: nearest-centroid
    * assignment (single projection), segments carry the raw vectors.
    * Cost ∝ batch; replay contract = [[DedupStore.append]]'s. */
  def appendFlat(spark: SparkSession, root: String, batchId: Long,
      batch: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): Boolean = {
    val art = loadIvf(spark, root)
    DedupStore.append(spark, codesRoot(root), batchId,
      Similarity.assignToCentroids(
        batch.select(col(idCol).cast("long").as(idCol),
          col(vecCol).cast("array<double>").as(vecCol)),
        art.centroids, idCol, vecCol))
  }

  /** Top-k cosine over the FLAT store: probe the nprobe nearest cells per
    * query (projection over the loaded centroids — zero fit jobs), scan
    * the probed inverted lists with EXACT cosine (the store holds the
    * vectors), bounded top-k. Row-identical to the fit-per-query
    * [[Similarity.ivfTopK]] at the same dials and seed (spec-pinned). */
  def searchTopKFlat(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val art = loadIvf(spark, root)
    val probes = Similarity.assignTopCentroids(queries, art.centroids,
        nprobe, idCol, vecCol)
      .select(col("centroid_id"), col("corpus_id").as("query_id"),
        col("c_vec").as("q_vec"))
    val scored = readCodes(spark, root).join(broadcast(probes),
        Seq("centroid_id"))
      .select(col("query_id"), col("corpus_id"),
        round(Similarity.cosine(col("q_vec"), col("c_vec")), 6).as("cos"))
    Similarity.finalTopK(scored, k)
  }

  /** Encode + append one batch to an INT8 store: nearest-centroid
    * assignment, then per-vector L2-normalize + int8-quantize — segments
    * carry (centroid_id, corpus_id, cq struct(scale, codes)), 1 byte per
    * dimension. */
  def appendInt8(spark: SparkSession, root: String, batchId: Long,
      batch: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): Boolean = {
    val art = loadIvf(spark, root)
    val assigned = Similarity.assignToCentroids(
      batch.select(col(idCol).cast("long").as(idCol),
        col(vecCol).cast("array<double>").as(vecCol)),
      art.centroids, idCol, vecCol)
    DedupStore.append(spark, codesRoot(root), batchId,
      assigned.select(col("centroid_id"), col("corpus_id"),
        Similarity.quantizeInt8(Similarity.l2Normalize(col("c_vec")))
          .as("cq")))
  }

  /** Top-k cosine over the INT8 store: int8 dot-product scan of the
    * probed lists ([[graft.functions.DotInt8]], 8× less traffic than
    * float64), exact re-rank of the rerank·k survivors against the raw
    * `corpus` — the [[Similarity.ivfTopKQuantized]] plan with the fit
    * and corpus-side encode replaced by the persisted artifact. */
  def searchTopKInt8(spark: SparkSession, root: String, corpus: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int = 4, rerank: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(rerank >= 1, "rerank >= 1")
    val art = loadIvf(spark, root)
    val probes = Similarity.assignTopCentroids(queries, art.centroids,
        nprobe, idCol, vecCol)
      .select(col("centroid_id"), col("corpus_id").as("query_id"),
        Similarity.quantizeInt8(Similarity.l2Normalize(col("c_vec")))
          .as("qq"))
    val approx = readCodes(spark, root).join(broadcast(probes),
        Seq("centroid_id"))
      .select(col("query_id"), col("corpus_id"),
        (col("qq").getField("scale") * col("cq").getField("scale") *
          graft.functions.DotInt8(col("qq").getField("codes"),
            col("cq").getField("codes"))).as("ascore"))
    Similarity.rerankExactCandidates(corpus, queries, approx, k, rerank,
      idCol, vecCol)
  }

  def imiCommitted(spark: SparkSession, root: String): Boolean =
    fs(spark, root).exists(new HPath(root, "imi"))

  /** Persist fitted IMI half-space codebooks. Same replay/race contract
    * as [[saveQuantizer]]. */
  def saveImi(spark: SparkSession, root: String, art: ImiArtifact): Boolean =
    commitArtifact(spark, root, "imi") { base =>
      import spark.implicits._
      // one tagged frame, one write job (r19 — see saveQuantizer)
      (Seq(("meta", art.dim, art.cbA.length + art.cbB.length,
        Seq(art.cbA.length.toDouble, art.cbB.length.toDouble))) ++
        art.cbA.zipWithIndex.map { case (v, j) => ("codebook", 0, j, v.toSeq) } ++
        art.cbB.zipWithIndex.map { case (v, j) => ("codebook", 1, j, v.toSeq) })
        .toDF("kind", "i", "j", "vec")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/artifact")
    }

  def loadImi(spark: SparkSession, root: String): ImiArtifact = {
    require(imiCommitted(spark, root),
      s"IndexStore at $root has no committed IMI artifact — run trainImi")
    cached(spark, root, "imi") {
      val base = new HPath(root, "imi").toString
      if (fs(spark, root).exists(new HPath(base, "artifact"))) {
        val all = spark.read.parquet(s"$base/artifact")
          .select(col("kind"), col("i"), col("j"), col("vec")).collect()
        val meta = all.find(_.getString(0) == "meta")
          .getOrElse(throw new IllegalStateException(
            s"IndexStore at $root: IMI artifact is corrupt — no meta row"))
        val dim = meta.getInt(1)
        val kk = meta.getSeq[Double](3)
        val (ka, kb) = (kk(0).toInt, kk(1).toInt)
        val rows = all.filter(_.getString(0) == "codebook")
          .map(r => ((r.getInt(1), r.getInt(2)), r.getSeq[Double](3).toArray))
          .toMap
        require(rows.size == ka + kb,
          s"IndexStore at $root: IMI artifact is corrupt — " +
            s"${rows.size} codebook rows vs kA+kB=${ka + kb}")
        ImiArtifact(dim, Array.tabulate(ka)(j => rows((0, j))),
          Array.tabulate(kb)(j => rows((1, j))))
      } else { // legacy two-dir layout (pre-r19 stores)
        val meta = spark.read.parquet(s"$base/meta").collect()(0)
        val (dim, ka, kb) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
        val rows = spark.read.parquet(s"$base/codebooks")
          .select(col("half"), col("code"), col("vec")).collect()
          .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray))
          .toMap
        require(rows.size == ka + kb,
          s"IndexStore at $root: IMI artifact is corrupt — " +
            s"${rows.size} codebook rows vs kA+kB=${ka + kb}")
        ImiArtifact(dim, Array.tabulate(ka)(j => rows((0, j))),
          Array.tabulate(kb)(j => rows((1, j))))
      }
    }
  }

  /** Fit IMI half-space codebooks on `corpus` and persist them — run ONCE
    * per store; replays load the committed artifact. */
  def trainImi(spark: SparkSession, root: String, corpus: DataFrame,
      dim: Int, kA: Int = 8, kB: Int = 8, seed: Long = 42L,
      vecCol: String = "embedding",
      fitSampleLimit: Int = 100000): ImiArtifact = {
    if (imiCommitted(spark, root)) return loadImi(spark, root)
    val (cbA, cbB) = Similarity.imiCodebooks(corpus, kA, kB, seed, vecCol,
      fitSampleLimit)
    val art = ImiArtifact(dim, cbA, cbB)
    if (saveImi(spark, root, art)) art else loadImi(spark, root)
  }

  /** Encode + append one batch to an IMI store: top-1 cell assignment
    * (broadcast half-codebook kernel, kA+kB half-dots per row), segments
    * carry (cell_id, corpus_id, c_vec). */
  def appendImi(spark: SparkSession, root: String, batchId: Long,
      batch: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): Boolean = {
    val art = loadImi(spark, root)
    DedupStore.append(spark, codesRoot(root), batchId,
      Similarity.imiAssignTop(batch, art.cbA, art.cbB, 1, idCol, vecCol))
  }

  /** Top-k cosine over the IMI store: rank the kA·kB cells per query from
    * kA+kB half-dots (loaded codebooks — zero fit jobs), scan the probed
    * cells with exact cosine, bounded top-k. Row-identical to the
    * fit-per-query [[Similarity.imiTopK]] at the same dials and seed
    * (spec-pinned). */
  def searchTopKImi(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val art = loadImi(spark, root)
    val probes = Similarity.imiAssignTop(queries, art.cbA, art.cbB, nprobe,
        idCol, vecCol)
      .select(col("cell_id"), col("corpus_id").as("query_id"),
        col("c_vec").as("q_vec"))
    val scored = readCodes(spark, root).join(broadcast(probes),
        Seq("cell_id"))
      .select(col("query_id"), col("corpus_id"),
        round(Similarity.cosine(col("q_vec"), col("c_vec")), 6).as("cos"))
    Similarity.finalTopK(scored, k)
  }

  // ------------------------------------------------- retrain-rotate cutover

  /** The RESPONSE to the staleness signal the train-once contract raises
    * (dt07's drift monitor): the quantizer is immutable per root, so a
    * refit is a NEW store — and the alias layer below makes the cutover
    * atomic for readers. An ALIAS is a directory holding versioned
    * POINTER files (`ptr-<stamp>`, content = the live store root);
    * readers resolve the lexicographically-newest pointer, writers
    * publish a new one with a private-stage + atomic-file-rename commit.
    * Readers therefore always see a COMPLETE store: the pointer is
    * written only after the new root's quantizer and segments are fully
    * committed, a crash mid-rotate leaves the old pointer live and the
    * half-built root as unreferenced (sweepable) debris, and the old
    * store remains on disk for rollback (re-publishing its root IS the
    * rollback). This is the materialized-view refresh discipline
    * (reference: dbt/adapters/maxcompute/impl.py:113-158 +
    * relations/materialized_view/refresh.sql — rebuild, then swap)
    * applied to the ANN index artifact. */
  private def ptrPrefix = "ptr-"

  /** Stamp clock: per-JVM MONOTONIC millis (`max(now, last+1)`), so two
    * publishes from one process order by publish order even inside the
    * same wall-clock millisecond — pointer ordering is a total order by
    * construction, not by uuid luck. Cross-JVM same-millis publishes
    * still tie-break by uuid; they are unreachable in practice (a rotate
    * carries a full fit, seconds apart at minimum). */
  private val stampClock = new java.util.concurrent.atomic.AtomicLong(0L)

  private def newStamp(): String = {
    val t = stampClock.updateAndGet(last =>
      math.max(System.currentTimeMillis(), last + 1))
    f"$t%013d-${java.util.UUID.randomUUID().toString}"
  }

  /** The store root the alias currently serves, None before the first
    * publish. One directory listing + one kilobyte read. */
  def currentRoot(spark: SparkSession, alias: String): Option[String] = {
    val f = fs(spark, alias)
    val a = new HPath(alias)
    if (!f.exists(a)) return None
    val ptrs = f.listStatus(a).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith(ptrPrefix))
    if (ptrs.isEmpty) return None
    val latest = ptrs.maxBy(_.getPath.getName).getPath
    val in = f.open(latest)
    try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
    finally in.close()
  }

  /** Point the alias at `storeRoot` — the atomic cutover step. The
    * pointer file is staged privately and published by one atomic FILE
    * rename; concurrent publishes both land (distinct stamps) and the
    * newest wins deterministically. Requires the target store to be
    * complete (committed quantizer) — publishing a half-built root is the
    * one way to break the reader contract. */
  def publishRoot(spark: SparkSession, alias: String, storeRoot: String): Unit = {
    require(quantizerCommitted(spark, storeRoot) ||
        ivfCommitted(spark, storeRoot) || imiCommitted(spark, storeRoot),
      s"IndexStore: refusing to publish $storeRoot — no committed " +
        "artifact of any family (readers must never resolve to a " +
        "half-built store)")
    val f = fs(spark, alias)
    f.mkdirs(new HPath(alias))
    val stamp = newStamp()
    val tmp = new HPath(alias, s".$ptrPrefix$stamp-tmp")
    val out = f.create(tmp, true)
    try out.write(storeRoot.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, new HPath(alias, ptrPrefix + stamp))) {
      f.delete(tmp, false)
      throw new java.io.IOException(
        s"IndexStore: cannot publish pointer under $alias")
    }
  }

  /** Retrain-rotate: fit a FRESH quantizer on `corpus` at a new root
    * under the alias, re-encode the corpus as that root's segment 0, and
    * cut searches over with one atomic pointer publish. Searches running
    * concurrently resolve either the old root or the new one — never a
    * partial store (the pointer flips only after the new store is fully
    * committed) — and the old root stays on disk for rollback
    * ([[sweepSuperseded]] reclaims it once it ages out). Also the FIRST
    * build: with no prior pointer this simply creates and publishes the
    * initial store. Returns the new root. */
  def rotate(spark: SparkSession, alias: String, corpus: DataFrame,
      dim: Int, nlist: Int = 16, m: Int = 8, codebookSize: Int = 16,
      seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding", carryCols: Seq[String] = Nil,
      fitSampleLimit: Int = 100000, foldBatchId: Long = 0L): String = {
    val newRoot = buildRoot(spark, alias, corpus, dim, nlist, m,
      codebookSize, seed, idCol, vecCol, carryCols, fitSampleLimit,
      foldBatchId)
    publishRoot(spark, alias, newRoot)
    newRoot
  }

  /** The build half of [[rotate]]: fit + fold-encode a complete store at
    * a fresh root under the alias WITHOUT publishing the pointer. Exposed
    * (package-private) so callers that must land state on the new root
    * before readers can resolve it — the guarded streaming ingest's
    * exactly-once replay markers — can order build → seed → publish; a
    * crash anywhere before publish leaves the old pointer live and the
    * half-built root as unreferenced, sweepable debris. */
  private[llm] def buildRoot(spark: SparkSession, alias: String,
      corpus: DataFrame, dim: Int, nlist: Int = 16, m: Int = 8,
      codebookSize: Int = 16, seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding", carryCols: Seq[String] = Nil,
      fitSampleLimit: Int = 100000, foldBatchId: Long = 0L): String = {
    val newRoot = s"$alias/store-${newStamp()}"
    train(spark, newRoot, corpus, dim, nlist, m, codebookSize, seed,
      vecCol, fitSampleLimit)
    // `foldBatchId` is the re-encoded corpus segment's id — callers whose
    // ingest batch ids share the default 0 (the guarded streaming ingest)
    // pass the -1L seed convention so the fold never shadows a real batch
    appendCodes(spark, newRoot, foldBatchId, corpus, idCol, vecCol,
      carryCols)
    newRoot
  }

  /** Search through the alias: resolve the live pointer, search that
    * root with the family the root's committed artifact declares —
    * residual-PQ ([[searchTopK]]), IMI ([[searchTopKImi]]), or the
    * shared-centroid families, where the SEGMENT schema distinguishes
    * int8 codes from flat vectors. Rotate-safe by construction — the
    * resolved root is immutable-complete whichever side of a concurrent
    * cutover this lands on. `matchCols` is residual-store-only (the one
    * attribute-carrying segment layout); `rerank` is ignored by the
    * exact-in-scan families (flat, IMI). */
  def searchCurrent(spark: SparkSession, alias: String, corpus: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int = 4, rerank: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      matchCols: Seq[String] = Nil): DataFrame = {
    val root = currentRoot(spark, alias).getOrElse(throw
      new IllegalStateException(
        s"IndexStore alias $alias has no published store — run rotate"))
    if (quantizerCommitted(spark, root))
      searchTopK(spark, root, corpus, queries, k, nprobe, rerank, idCol,
        vecCol, matchCols)
    else {
      require(matchCols.isEmpty,
        "metadata-filtered search requires a residual-PQ store " +
          "(the attribute-carrying segment layout)")
      if (imiCommitted(spark, root))
        searchTopKImi(spark, root, queries, k, nprobe, idCol, vecCol)
      else if (readCodes(spark, root).columns.contains("cq"))
        searchTopKInt8(spark, root, corpus, queries, k, nprobe, rerank,
          idCol, vecCol)
      else
        searchTopKFlat(spark, root, queries, k, nprobe, idCol, vecCol)
    }
  }

  /** GC superseded stores under an alias: keeps every store referenced by
    * the newest `keepPointers` pointer files plus anything younger than
    * `minAgeMs` (a rotate may be mid-flight), deletes the rest and their
    * stale pointers. The age gate is the rollback window — size it to the
    * operational "how long until we trust the new quantizer" horizon.
    * Returns the deleted paths. */
  def sweepSuperseded(spark: SparkSession, alias: String,
      keepPointers: Int = 2, minAgeMs: Long = 30L * 60 * 1000): Seq[String] = {
    require(keepPointers >= 1, "keepPointers >= 1 — never sweep the live store")
    val f = fs(spark, alias)
    val a = new HPath(alias)
    if (!f.exists(a)) return Nil
    val now = System.currentTimeMillis()
    val all = f.listStatus(a).toSeq
    val ptrs = all.filter(st => st.isFile
      && st.getPath.getName.startsWith(ptrPrefix)).sortBy(_.getPath.getName)
    val (old, kept) = ptrs.splitAt(math.max(0, ptrs.size - keepPointers))
    def read(p: HPath): String = {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
    val keptRoots = kept.map(st => read(st.getPath)).toSet
    val sweptPtrs = old.filter(st => now - st.getModificationTime >= minAgeMs
        && !keptRoots.contains(read(st.getPath)))
      .map { st => f.delete(st.getPath, false); st.getPath.toString }
    val sweptStores = all.filter { st =>
      st.isDirectory && st.getPath.getName.startsWith("store-") &&
        !keptRoots.contains(st.getPath.toString) &&
        !keptRoots.contains(f.makeQualified(st.getPath).toString) &&
        !keptRoots.exists(_.endsWith("/" + st.getPath.getName)) &&
        now - st.getModificationTime >= minAgeMs
    }.map { st => f.delete(st.getPath, true); st.getPath.toString }
    sweptPtrs ++ sweptStores
  }

  // ------------------------------------------- self-healing ingest (guarded)

  /** One ingest step of a SELF-HEALING index: append the batch to the
    * alias's live store — unless the batch's cell-assignment distribution
    * says the committed quantizer no longer fits the data, in which case
    * RESPOND with [[rotate]] (fresh fit on history + batch, atomic alias
    * cutover) instead of appending garbage codes. This closes dt07's
    * monitor and s18's rotate into the ingest loop itself: at 100 TB
    * nobody watches a dashboard — the pipeline must notice drift and heal
    * within the batch that brought it.
    *
    * Drift dial (dt07's calibration-split discipline, localized per
    * batch): the store-vs-batch chi² must exceed ALL of — an absolute
    * floor (`minChi2`, tiny batches are noisy); `calibFactor ×` the
    * within-batch half-vs-half chi² (the batch split by id hash — the
    * iid yardstick); and `priorFactor ×` the LARGEST store-vs-batch
    * statistic a previously ACCEPTED batch recorded (a tiny `guard/`
    * stat file per append). The third leg is load-bearing on real
    * corpora: duplicate clusters (the ~100-copy boilerplate)
    * multiply between-batch sampling noise by the duplication factor —
    * AutoRotateDialProbe measured the stale-batch statistic at 3.9 /
    * 5.9 / 71 / 1880 across sf0.001→sf10 while the id-hash halves
    * (which split every copy-cluster evenly) stayed ≈ dof, so an
    * iid-only dial false-fires at scale; the prior-batch yardstick is
    * subject to the SAME clustering and absorbs it (drifted/stale
    * separation measured ≥ 39× at every scale — priorFactor 10 holds
    * ≥ 1.6× margin up and ≥ 3.9× down). Before ONE accepted batch has
    * recorded a yardstick (the warm-up window), chi² magnitude alone
    * cannot tell duplication from drift — there the guard consults the
    * TOTAL-VARIATION distance over cell shares instead
    * ([[graft.exec.DataTests.driftTv]], `warmupTvFloor`): TV measures
    * the moved mass itself and duplication widens only its noise floor,
    * so a genuinely drifted warm-up batch (TV ≥ 0.507 measured across
    * five scales) rotates immediately while a duplication-inflated
    * same-distribution one (TV ≤ 0.136 at up to 100× duplication) waits
    * for the yardstick path — a mild drift below the TV floor appends
    * with degraded recall (the graceful IVF failure mode) and the NEXT
    * batch can fire. Corpus-scale work is three grouped counts over the
    * encoded batch + one over the store's codes (the TV pass runs only
    * on warm-up batches).
    *
    * Exactly-once ACROSS the cutover: the batch id is the commit token
    * in the live root's code segments. On rotate (and on bootstrap) the
    * re-encoded corpus lands as the `-1L` fold segment — the seed
    * convention, so it can never shadow a real stream batch id — and
    * every previously-committed id (plus the firing one) is re-committed
    * as an EMPTY segment on the new root BEFORE the alias pointer
    * publishes (build → mark → publish): a replayed batch no-ops
    * whichever side of the rotation it lands on, a restarted stream
    * cannot double-index through a cutover, and a crash mid-rotation
    * leaves the old pointer live — never a published root missing its
    * replay markers. (A replayed id at or below the rotation point
    * maps to "content already inside the fold", the same skip semantics
    * as [[DedupStore.append]]'s.)
    *
    * `corpus` is the source-of-truth vector table (the store holds codes,
    * never vectors): the rotate re-encodes `corpus ∩ indexed-ids ∪ batch`
    * — exactly what the index held plus the batch that fired. First call
    * (no published root) bootstraps the initial store from the batch.
    * Returns true when this step rotated (or bootstrapped). */
  def ingestWithDriftGuard(spark: SparkSession, alias: String,
      batchId: Long, batch: DataFrame, corpus: DataFrame, dim: Int,
      nlist: Int = 16, m: Int = 8, codebookSize: Int = 16,
      seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding", minChi2: Double = 100.0,
      calibFactor: Double = 20.0, priorFactor: Double = 10.0,
      warmupTvFloor: Double = 0.3,
      fitSampleLimit: Int = 100000): Boolean = {
    require(batchId >= 0L,
      "ingestWithDriftGuard: stream batch ids are non-negative (the -1L " +
        "fold convention and the reserved compaction space are the store's)")
    val slim = batch.select(col(idCol), col(vecCol))
    // empty replay markers ride the store-schema local relation (r19) —
    // both call sites run AFTER buildRoot committed the -1L fold, so the
    // segment schema is always derivable
    def markCommitted(root: String, ids: Seq[Long]): Unit =
      ids.filter(id => id >= 0L && id < DedupStore.CompactBase).distinct
        .foreach(id => markBatchCommitted(spark, root, id))
    currentRoot(spark, alias) match {
      case None =>
        // markers land on the new root BEFORE the pointer flips: a crash
        // in the window leaves the old state live and the built root as
        // sweepable debris — the replayed batch re-runs the whole step.
        // (Publishing first would open a window where the live root lacks
        // the firing batch's marker and a restart double-indexes it.)
        val r = buildRoot(spark, alias, slim, dim, nlist, m, codebookSize,
          seed, idCol, vecCol, Nil, fitSampleLimit, foldBatchId = -1L)
        markCommitted(r, Seq(batchId))
        publishRoot(spark, alias, r)
        true
      case Some(root) =>
        val committed = DedupStore.committedBatches(spark, codesRoot(root))
        // a store whose EVERY ingest marker was collapsed into compaction
        // folds lost its replay record — a raw DedupStore.compact on the
        // codes dir, not [[compactCodes]], which re-commits the folded
        // ingest ids as empty segments. Refuse loudly: this step cannot
        // prove the batch isn't a replay of folded history
        require(committed.isEmpty ||
            committed.exists(_ < DedupStore.CompactBase),
          s"IndexStore under $alias: store $root holds only compaction " +
            "folds with no ingest markers — replay idempotency is " +
            "unprovable; compact streamed stores via compactCodes (which " +
            "preserves markers), never DedupStore.compact directly")
        if (committed.contains(batchId)) return false // replay: skip
        val rq = loadQuantizer(spark, root)
        val codes = Similarity.encodeResidual(slim, rq, idCol, vecCol)
          .localCheckpoint() // encode ONCE: feeds the monitor and the append
        def chi2Of(base: DataFrame, cur: DataFrame): Double =
          graft.exec.DataTests.driftChi2(base, cur, "centroid_id")
            .agg(max(col("chi2_stat"))).collect()(0).getDouble(0)
        // store-vs-batch uses the WHOLE batch (chi² grows ∝ n — halving
        // the sample halves the drift signal); the id-hash halves only
        // supply the same-distribution yardstick the factor dial needs
        val halfA = codes.filter(pmod(xxhash64(col("corpus_id")), lit(2)) === 0)
          .select(col("centroid_id"))
        val halfB = codes.filter(pmod(xxhash64(col("corpus_id")), lit(2)) === 1)
          .select(col("centroid_id"))
        val storeCells = readCodes(spark, root).select(col("centroid_id"))
        val batchCells = codes.select(col("centroid_id"))
        val vsStore = chi2Of(storeCells, batchCells)
        // the yardstick needs both halves populated: a batch so small one
        // hash-half is empty cannot supply drift evidence (a single stray
        // vector in an unseen cell CAN push raw chi² past the floor) —
        // insufficient evidence appends, it never rotates. Likewise a
        // store with no recorded prior-batch statistic: the duplication
        // level is unknowable without one (see the dial note above)
        val prior = readGuardStats(spark, root)
        lazy val within = math.max(chi2Of(halfA, halfB), 7.0)
        // drift evidence independent of the prior yardstick: the raw floor
        // plus the within-batch calibration bound
        val suspicious = vsStore > minChi2 &&
          halfA.limit(1).count() > 0 && halfB.limit(1).count() > 0 &&
          vsStore > calibFactor * within
        // WARM-UP path (no recorded yardstick yet): chi² magnitude alone
        // cannot break the duplication-vs-drift ambiguity (duplication
        // multiplies a same-distribution batch's chi² by the copy factor
        // — the r16 clamp false-fired at sf10 on exactly this), but the
        // total-variation distance over cell SHARES can: TV is scale-free,
        // centered on the true distributional distance at any duplication
        // level (duplication widens only its noise floor, by √copies).
        // DriftSeparatorProbe measured same-dist TV ≤ 0.136 and drifted
        // TV ≥ 0.507 across sf0.001→sf10 (1×→100× duplication) — floor
        // 0.3 holds ≥ 2.2× margin against a false warm-up rotation and
        // ≥ 1.69× against a missed one (which appends gracefully and
        // fires next batch via the yardstick path). Evaluated lazily:
        // steady-state batches (yardstick present) never pay the pass.
        lazy val movedMass = graft.exec.DataTests
          .driftTv(storeCells, batchCells, "centroid_id")
          .agg(max(col("tv_stat"))).collect()(0).getDouble(0)
        val fire = suspicious &&
          ((prior.nonEmpty && vsStore > priorFactor * prior.max) ||
            (prior.isEmpty && movedMass > warmupTvFloor))
        if (fire) {
          val indexedIds = readCodes(spark, root)
            .select(col("corpus_id").cast("long").as(idCol))
          val history = corpus.select(col(idCol), col(vecCol))
            .join(indexedIds, Seq(idCol), "left_semi")
          val r2 = buildRoot(spark, alias, history.unionByName(slim), dim,
            nlist, m, codebookSize, seed, idCol, vecCol, Nil,
            fitSampleLimit, foldBatchId = -1L)
          // exactly-once across the cutover: every batch the OLD store had
          // committed (its content now lives in the fold), plus the firing
          // batch, re-commits as an empty segment on the new root BEFORE
          // the pointer publish — replays no-op on either side of the
          // rotation, and a crash mid-cutover leaves the old pointer live
          // with the new root as sweepable debris, never a published root
          // missing its markers. A [[compactCodes]]-folded store carries
          // its ingest ids as empty segments, so they ride along here too;
          // the fold id itself (content, not a replay token) is filtered
          // by markCommitted.
          markCommitted(r2, committed :+ batchId)
          publishRoot(spark, alias, r2)
          true
        } else {
          DedupStore.append(spark, codesRoot(root), batchId, codes)
          // the yardstick records the OBSERVED store-vs-batch statistic,
          // even when the batch carried prior-independent drift evidence.
          // The alternative — clamping a suspicious warm-up batch's
          // record to its within-batch chi² so a later drifted batch
          // could still fire — was tried in r16 and MEASURED to
          // false-fire at sf10: chi² magnitude cannot tell duplication
          // from drift (a duplicated corpus inflates every
          // same-distribution batch's vs-store chi² by the copy factor
          // while the within-batch split stays low), so the clamp seeded
          // a tiny yardstick and the very next normal batch spuriously
          // rotated. The honest discriminator is the TV-over-shares
          // warm-up path above, which fires BEFORE this append on a
          // batch whose mass actually moved; a batch that reaches here
          // records what it saw, inflation and all.
          writeGuardStat(spark, root, batchId, vsStore)
          false
        }
    }
  }

  /** The drift guard's per-root yardstick state: one tiny `stat-<batch>`
    * file per ACCEPTED batch, holding that batch's store-vs-batch chi².
    * Root-scoped — a rotation starts a fresh store whose first accepted
    * batch re-seeds the yardstick. Kilobytes, one listing to read. */
  private def guardDir(root: String) = new HPath(root, "guard")

  private def readGuardStats(spark: SparkSession, root: String): Seq[Double] = {
    val f = fs(spark, root)
    val d = guardDir(root)
    if (!f.exists(d)) return Nil
    f.listStatus(d).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("stat-"))
      .map { st =>
        val in = f.open(st.getPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toDouble
        finally in.close()
      }
  }

  private def writeGuardStat(spark: SparkSession, root: String,
      batchId: Long, v: Double): Unit = {
    val f = fs(spark, root)
    f.mkdirs(guardDir(root))
    val tmp = new HPath(guardDir(root), s".stat-$batchId-tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, new HPath(guardDir(root), s"stat-$batchId")))
      f.delete(tmp, false) // a concurrent replay already recorded it
  }

  /** Bound the drift guard's per-root yardstick state: keep the newest
    * `keep` accepted-batch statistics (by batch id), delete the rest.
    * The dial compares against `max` over recorded stats, so pruning to
    * recent batches keeps the yardstick tracking the CURRENT corpus
    * shape (duplication level drifts too) while stopping the one-file-
    * per-accepted-batch growth. Returns the number deleted. */
  def pruneGuardStats(spark: SparkSession, root: String,
      keep: Int = 8): Int = {
    require(keep >= 1, "keep >= 1 — never delete the entire yardstick")
    val f = fs(spark, root)
    val d = guardDir(root)
    if (!f.exists(d)) return 0
    val old = f.listStatus(d).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("stat-"))
      .sortBy(_.getPath.getName.stripPrefix("stat-").toLong)
      .dropRight(keep)
    old.foreach(st => f.delete(st.getPath, false))
    old.size
  }

  /** What one [[maintain]] pass did — the operational audit record. */
  case class MaintainReport(sweptStores: Seq[String],
      sweptStaging: Seq[String], prunedGuardStats: Int,
      compactedFold: Option[Long])

  /** ONE scheduled entry point for alias lifecycle hygiene (r15 VERDICT
    * #4 — previously three separate sweeps plus an unbounded guard dir
    * that an operator had to remember individually):
    *
    *  1. [[sweepSuperseded]] — GC stores and pointers older than the
    *     rollback window, keeping the newest `keepPointers`.
    *  2. [[recoverStaging]] on every surviving store root — crashed
    *     trainers' staging debris.
    *  3. [[pruneGuardStats]] on every surviving root — bound the drift
    *     guard's yardstick files to the newest `keepGuardStats`.
    *  4. Horizon-bounded code compaction on the LIVE root: when more
    *     than `max(compactMinSegments, asOfHorizonSegments)` ingest
    *     segments hold unfolded rows, fold all but the newest
    *     `asOfHorizonSegments` ([[compactCodes]] with its replay-marker
    *     preservation) — segment count stays bounded while
    *     [[DedupStore.readAsOf]]/[[searchTopK]]'s asOfBatch keep working
    *     across the configured audit horizon. The cadence counts only
    *     segments NOT yet folded (via [[DedupStore.foldedThrough]]), so
    *     a quiet store is never re-folded.
    *
    * Everything here is metadata-sized except the fold itself, which is
    * one read+write of the code rows (m bytes + id per vector) at most
    * once per cadence trigger. Safe to schedule against live searches
    * (immutable roots, atomic pointers) and against the guarded ingest
    * (the compaction lease + marker preservation — the machinery pinned
    * by IndexStoreSpec's mid-stream compaction race). */
  def maintain(spark: SparkSession, alias: String, keepPointers: Int = 2,
      minAgeMs: Long = 30L * 60 * 1000, keepGuardStats: Int = 8,
      compactMinSegments: Int = 16,
      asOfHorizonSegments: Int = 8): MaintainReport = {
    val sweptStores = sweepSuperseded(spark, alias, keepPointers, minAgeMs)
    val f = fs(spark, alias)
    val a = new HPath(alias)
    val roots = if (!f.exists(a)) Seq.empty[String]
      else f.listStatus(a).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("store-"))
        .map(_.getPath.toString)
    val staging = roots.flatMap(r => recoverStaging(spark, r, minAgeMs))
    val pruned = roots.map(r => pruneGuardStats(spark, r, keepGuardStats)).sum
    val fold = currentRoot(spark, alias).flatMap { live =>
      val cr = codesRoot(live)
      val foldedThrough = DedupStore.foldedThrough(spark, cr)
      val unfolded = DedupStore.committedBatches(spark, cr)
        .filter(id => id < DedupStore.CompactBase &&
          foldedThrough.forall(id > _))
      if (unfolded.size <= math.max(compactMinSegments, asOfHorizonSegments))
        None
      else unfolded.sorted.dropRight(asOfHorizonSegments).lastOption
        .map(u => compactCodes(spark, live, Some(u)))
    }
    MaintainReport(sweptStores, staging, pruned, fold)
  }

  // ------------------------------------------------------------ store merge

  /** Exact bit-fingerprint of a fitted artifact — the merge-compatibility
    * check. Doubles are compared by RAW BITS (doubleToRawLongBits), not
    * by value: two fits that differ in the last ulp produce codes that
    * score differently, so "close enough" is exactly the silent-wrongness
    * merge must refuse. */
  private def artifactFingerprint(kind: String, ints: Seq[Int],
      vecs: Iterator[Array[Double]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(kind.getBytes("UTF-8"))
    val buf = java.nio.ByteBuffer.allocate(8)
    def putLong(l: Long): Unit = {
      buf.clear(); buf.putLong(l); md.update(buf.array(), 0, 8)
    }
    ints.foreach(i => putLong(i.toLong))
    vecs.foreach { v =>
      putLong(v.length.toLong)
      v.foreach(d => putLong(java.lang.Double.doubleToRawLongBits(d)))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** The committed artifact family under `root` plus its exact
    * fingerprint: ("quantizer", fp) / ("ivf", fp) / ("imi", fp). Loads
    * ride the per-root cache — kilobytes either way. */
  private def familyFingerprint(spark: SparkSession,
      root: String): (String, String) =
    if (quantizerCommitted(spark, root)) {
      val rq = loadQuantizer(spark, root)
      ("quantizer", artifactFingerprint("quantizer",
        Seq(rq.dim, rq.nlist, rq.m, rq.codebookSize),
        rq.centroids.iterator.map(_._2.toArray) ++
          rq.cellMeans.iterator ++
          rq.codebooks.iterator.flatMap(_.iterator)))
    } else if (ivfCommitted(spark, root)) {
      val art = loadIvf(spark, root)
      ("ivf", artifactFingerprint("ivf", Seq(art.dim, art.nlist),
        art.centroids.iterator.map(_._2.toArray)))
    } else if (imiCommitted(spark, root)) {
      val art = loadImi(spark, root)
      ("imi", artifactFingerprint("imi", Seq(art.dim),
        art.cbA.iterator ++ art.cbB.iterator))
    } else throw new IllegalArgumentException(
      s"IndexStore at $root has no committed artifact of any family")

  /** Merge committed sibling stores into `dstRoot` — the FAISS
    * `merge_from`/`merge_ondisk` discipline on Spark: shard builders
    * index their slice against ONE shared fitted artifact (train once,
    * ship the kilobyte artifact to every region/day builder), and merge
    * unifies the shards WITHOUT touching a single vector. The
    * destination commits the shared artifact (replay-idempotent), then
    * each source's committed code rows append as one destination
    * segment: cost ∝ code bytes (m bytes + id per vector), ZERO fit
    * jobs, ZERO encode jobs, zero corpus reads — at 100 TB the merge
    * moves the index, never the data.
    *
    * Safety contract: refuses loudly unless every store involved
    * (sources AND a dst with a pre-existing artifact) carries the same
    * family with a BIT-IDENTICAL artifact ([[artifactFingerprint]] —
    * raw double bits, not value-epsilon): codes encoded against
    * different codebooks score silently wrong, and re-encoding divergent
    * stores is [[rotate]]'s job, never merge's. Segment schemas must
    * match too (a carryCols residual store cannot merge with a bare one:
    * every segment of a store carries the same columns).
    *
    * Idempotent by the [[DedupStore.append]] replay contract: the dst
    * segment id for source i is `idBase + i`, so a crashed merge re-run
    * no-ops the already-copied sources and finishes the rest. A replay
    * is VERIFIED, not assumed (r15 ADVICE): an already-committed dst
    * segment must carry the same row count and the same order-free
    * corpus-id fingerprint as the source — a later merge of DIFFERENT
    * or reordered sources at a reused idBase fails loud instead of
    * silently leaving the new sources unmerged behind a false "already
    * copied". Returns one Boolean per source — true when THIS call
    * committed it. */
  def mergeStores(spark: SparkSession, dstRoot: String,
      srcRoots: Seq[String], idBase: Long = 0L): Seq[Boolean] = {
    require(srcRoots.nonEmpty, "mergeStores: no sources")
    val fps = srcRoots.map(r => r -> familyFingerprint(spark, r))
    val (family, fp) = fps.head._2
    fps.foreach { case (r, (fam, f2)) =>
      require(fam == family && f2 == fp,
        s"mergeStores: $r ($fam/$f2) is not merge-compatible with " +
          s"${srcRoots.head} ($family/$fp) — stores must share one " +
          "bit-identical fitted artifact; re-encoding divergent stores " +
          "is rotate's job")
    }
    val schemas = srcRoots.map(r => readCodes(spark, r).schema)
    schemas.tail.foreach(sc2 => require(sc2 == schemas.head,
      s"mergeStores: segment schemas differ across sources " +
        s"(${schemas.head.simpleString} vs ${sc2.simpleString}) — " +
        "a carryCols store cannot merge with a bare one"))
    // commit the shared artifact at dst (no-op when already committed —
    // but then it must BE the shared artifact, not some third fit)
    family match {
      case "quantizer" => saveQuantizer(spark, dstRoot,
        loadQuantizer(spark, srcRoots.head))
      case "ivf" => saveIvf(spark, dstRoot, loadIvf(spark, srcRoots.head))
      case _ => saveImi(spark, dstRoot, loadImi(spark, srcRoots.head))
    }
    val (dstFam, dstFp) = familyFingerprint(spark, dstRoot)
    require(dstFam == family && dstFp == fp,
      s"mergeStores: $dstRoot already holds a DIFFERENT committed " +
        s"artifact ($dstFam/$dstFp vs $family/$fp) — refusing to append " +
        "foreign codes into it")
    srcRoots.zipWithIndex.map { case (src, i) =>
      val srcCodes = readCodes(spark, src)
      val appended = DedupStore.append(spark, codesRoot(dstRoot),
        idBase + i, srcCodes)
      if (!appended) {
        // replay verification: the committed segment at this id must BE
        // this source's codes. Count + an order-free id fingerprint (one
        // narrow column scan per side) — identical ids under the shared
        // bit-identical artifact encode to identical codes, so id-set
        // equality is content equality here
        def sig(df: DataFrame): (Long, Long) = {
          // bit_xor: order-free and overflow-free (ANSI-safe; segment ids
          // are distinct, so XOR cancellation cannot occur)
          val r = df.agg(count(lit(1)),
            expr("bit_xor(xxhash64(corpus_id))")).collect()(0)
          (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
        }
        val seg = spark.read.parquet(
          DedupStore.segmentPath(codesRoot(dstRoot), idBase + i))
        require(sig(seg) == sig(srcCodes),
          s"mergeStores: dst segment ${idBase + i} is committed but does " +
            s"NOT match source $src — a previous merge used this idBase " +
            "for a different source set; pick an idBase unique per source " +
            "set (the replay no-op is only valid for the same sources in " +
            "the same order)")
      }
      appended
    }
  }
}
