package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{CompressionSignal, Dedup, Multimodal, NumericQuality, Packing, Sampling, Similarity, Sketches, TextOps}
import graft.LlmShared.{t, staging, idOffset, docsWithNearDups, qualitySqlExpr}

/** Multimodal queries (mm01–mm11): image/audio/video decode,
  * frame features, VAD segmentation, perceptual hashing, and the
  * image/video/audio near-dup store probes.
  * Split out of LlmQueries by family (r11) — pure move; the public surface
  * stays [[graft.LlmQueries.queries]] / [[graft.LlmQueries.oracleSql]]. */
private[graft] object MultimodalQueries {

  // ------------------------------------------------------------ multimodal

  /** Real image-header decode, ORACLE-CHECKED: payloads are structurally
    * valid PNG/JPEG/GIF/BMP bytes whose dimensions derive deterministically
    * from the id; the query parses format/width/height back OUT of the
    * byte stream (ImageHeaders), and DuckDB reproduces the expected values
    * relationally — a parse bug or header corruption hash-mismatches. */
  private def mm01(s: SparkSession, dir: String): DataFrame = {
    val imgs = Multimodal.synthesizeImages(
      t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id")
    Multimodal.imageDims(imgs).orderBy(col("id"))
  }

  private val mm01Sql =
    """SELECT doc_id AS id,
      |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
      |                  WHEN 2 THEN 'gif' ELSE 'bmp' END AS format,
      |  CAST(1 + doc_id % 31 AS INT) AS width,
      |  CAST(1 + doc_id % 17 AS INT) AS height
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin

  /** Real pixel decode, ORACLE-CHECKED end to end: payloads are complete
    * PNG/GIF/BMP images (lossless formats) whose grayscale fill follows the
    * closed form `(id + 7x + 13y) mod 256`; the query really encodes them
    * (`ImageIO.write`), really decodes them back (`ImageIO.read`), and the
    * resize / frame-sample operators run on the DECODED dimensions — while
    * DuckDB reproduces every output column (dims, pixel sum/min/max/mean,
    * resized dims, frame counts) from the integer closed form alone. A codec
    * bug, raster corruption, or resize/frame math drift hash-mismatches. */
  private def mm02(s: SparkSession, dir: String): DataFrame = {
    val imgs = Multimodal.synthesizePixelImages(
      t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id")
    val px = Multimodal.decodePixelStats(imgs)
    // media struct rebuilt from the DECODED dims (not the synthesis params),
    // so resize + frame sampling genuinely depend on the codec roundtrip
    val media = px.select(col("id"), col("format"),
      col("px_sum"), col("px_min"), col("px_max"),
      struct(lit(null).cast("binary").as("payload"),
        struct(lit("video").as("kind"),
          col("width"), col("height"), lit(16000).as("sample_rate"),
          (lit(1000L) * (col("id") % 7 + 1)).as("duration_ms")).as("meta"))
        .as("media"))
    val resized = Multimodal.resize(media, 16, 12)
    val frames = Multimodal.sampleFrames(resized, "id", fps = 2.0)
      .groupBy(col("id")).agg(count(lit(1)).as("n_frames"))
    resized.select(col("id"), col("format"),
        col("media.meta.width").as("width"),
        col("media.meta.height").as("height"),
        col("resized_width"), col("resized_height"),
        col("px_sum"), col("px_min"), col("px_max"),
        round(col("px_sum") /
          (col("media.meta.width") * col("media.meta.height")), 6).as("px_mean"))
      .join(frames, Seq("id"))
      .orderBy(col("id"))
  }

  private val mm02Sql =
    """WITH d AS (SELECT doc_id AS id,
      |    CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'bmp' END AS format,
      |    1 + doc_id % 31 AS w,
      |    CASE doc_id % 3 WHEN 1 THEN 5 + doc_id % 13
      |                    ELSE 1 + doc_id % 17 END AS h,
      |    1000 * (1 + doc_id % 7) AS dur
      |  FROM documents WHERE doc_id < 200),
      |px AS (SELECT d.id,
      |    CAST(SUM((d.id + 7*xs.x + 13*ys.y) % 256) AS BIGINT) AS px_sum,
      |    CAST(MIN((d.id + 7*xs.x + 13*ys.y) % 256) AS INT) AS px_min,
      |    CAST(MAX((d.id + 7*xs.x + 13*ys.y) % 256) AS INT) AS px_max
      |  FROM d, UNNEST(range(0, d.w)) AS xs(x), UNNEST(range(0, d.h)) AS ys(y)
      |  GROUP BY d.id)
      |SELECT d.id, d.format, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
      |  CAST(floor(d.w * least(16.0/d.w, 12.0/d.h, 1.0)) AS INT) AS resized_width,
      |  CAST(floor(d.h * least(16.0/d.w, 12.0/d.h, 1.0)) AS INT) AS resized_height,
      |  px.px_sum, px.px_min, px.px_max,
      |  round(CAST(px.px_sum AS DOUBLE) / (d.w * d.h), 6) AS px_mean,
      |  CAST(greatest(floor(d.dur / 500.0) - 1, 0) + 1 AS BIGINT) AS n_frames
      |FROM d JOIN px USING (id) ORDER BY d.id""".stripMargin

  /** Real AUDIO decode, ORACLE-CHECKED: payloads are complete RIFF/WAVE
    * clips (16-bit mono PCM) whose samples follow the closed form
    * `((id*31 + 7i) mod 65536) - 32768`; the query really encodes them and
    * really decodes them back through `javax.sound.sampled`, while DuckDB
    * reproduces every amplitude statistic from the integer closed form. */
  private def mm03(s: SparkSession, dir: String): DataFrame = {
    val clips = Multimodal.synthesizeAudio(
      t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id")
    Multimodal.decodeAudioStats(clips)
      .withColumn("duration_ms",
        round(col("n_samples") * lit(1000.0) / col("sample_rate"), 3))
      .orderBy(col("id"))
  }

  private val mm03Sql =
    """WITH d AS (SELECT doc_id AS id, 100 + doc_id % 900 AS n,
      |    8000 * (1 + doc_id % 3) AS rate
      |  FROM documents WHERE doc_id < 200),
      |amp AS (SELECT d.id,
      |    CAST(SUM((d.id*31 + 7*s.i) % 65536 - 32768) AS BIGINT) AS amp_sum,
      |    CAST(MIN((d.id*31 + 7*s.i) % 65536 - 32768) AS INT) AS amp_min,
      |    CAST(MAX((d.id*31 + 7*s.i) % 65536 - 32768) AS INT) AS amp_max
      |  FROM d, UNNEST(range(0, d.n)) AS s(i) GROUP BY d.id)
      |SELECT d.id, CAST(d.rate AS INT) AS sample_rate,
      |  CAST(d.n AS BIGINT) AS n_samples, amp.amp_sum, amp.amp_min, amp.amp_max,
      |  round(d.n * 1000.0 / d.rate, 3) AS duration_ms
      |FROM d JOIN amp USING (id) ORDER BY d.id""".stripMargin

  /** Frame-level audio features over a REAL decode, ORACLE-CHECKED: the
    * same closed-form RIFF/WAVE clips as mm03, but folded per 128-sample
    * frame into zero-crossing counts and integer energy (the classic
    * voice-activity statistics) — one row per complete frame, rms derived
    * in the projection. DuckDB reproduces zcr and Σs² from the closed
    * sample form with a lag window over generated sample indices. */
  private def mm06(s: SparkSession, dir: String): DataFrame = {
    val clips = Multimodal.synthesizeAudio(
      t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id")
    Multimodal.audioFrameFeatures(clips, frameLen = 128)
      .withColumn("rms", round(sqrt(col("energy_sum") / lit(128.0)), 6))
      .orderBy(col("id"), col("frame_idx"))
  }

  private val mm06Sql =
    """WITH d AS (SELECT doc_id AS id, 100 + doc_id % 900 AS n
      |  FROM documents WHERE doc_id < 200),
      |f AS (SELECT d.id, fr.fi FROM d, UNNEST(range(0, d.n // 128)) AS fr(fi)),
      |s AS (SELECT f.id, f.fi, si.i,
      |    (f.id*31 + 7*(f.fi*128 + si.i)) % 65536 - 32768 AS v
      |  FROM f, UNNEST(range(0, 128)) AS si(i)),
      |lagged AS (SELECT *, lag(v) OVER (PARTITION BY id, fi ORDER BY i) AS pv
      |  FROM s),
      |feat AS (SELECT id, fi,
      |    CAST(SUM(CASE WHEN i > 0 AND ((v >= 0) <> (pv >= 0))
      |      THEN 1 ELSE 0 END) AS INT) AS zcr,
      |    CAST(SUM(v*v) AS BIGINT) AS energy_sum
      |  FROM lagged GROUP BY 1, 2)
      |SELECT id, CAST(fi AS INT) AS frame_idx, zcr, energy_sum,
      |  round(sqrt(energy_sum / 128.0), 6) AS rms
      |FROM feat ORDER BY id, frame_idx""".stripMargin

  // -------------------------------------- mm07 voice-activity segments

  /** Voice-activity segmentation over a REAL decode, ORACLE-CHECKED:
    * clips carry planted silence (every 3rd 256-sample block zeroed —
    * [[Multimodal.synthesizeAudioGated]]), the query really decodes the
    * WAVs through `javax.sound.sampled`, frames them at 128 samples and
    * collapses voiced runs to segments
    * ([[Multimodal.audioVadSegments]] — gaps-and-islands per clip).
    * DuckDB reproduces every segment boundary and energy from the gated
    * integer closed form alone: a decode drift, frame slip, or island
    * boundary bug hash-mismatches. */
  private def mm07(s: SparkSession, dir: String): DataFrame = {
    val clips = Multimodal.synthesizeAudioGated(
      t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id")
    Multimodal.audioVadSegments(clips, frameLen = 128)
      .orderBy(col("id"), col("seg_idx"))
  }

  private val mm07Sql =
    """WITH d AS (SELECT doc_id AS id, 384 + doc_id % 1200 AS n
      |  FROM documents WHERE doc_id < 200),
      |fr AS (SELECT id, f.fi FROM d, UNNEST(range(0, n // 128)) AS f(fi)),
      |s AS (SELECT fr.id, fr.fi, si.i,
      |    CASE WHEN ((fr.fi * 128 + si.i) // 256) % 3 = 0 THEN 0
      |         ELSE (fr.id * 31 + 7 * (fr.fi * 128 + si.i)) % 65536 - 32768
      |    END AS v
      |  FROM fr, UNNEST(range(0, 128)) AS si(i)),
      |feat AS (SELECT id, fi, SUM(v * v) AS e FROM s GROUP BY 1, 2),
      |act AS (SELECT id, fi, e,
      |    fi - row_number() OVER (PARTITION BY id ORDER BY fi) AS grp
      |  FROM feat WHERE e >= 1),
      |seg AS (SELECT id, grp, MIN(fi) AS sf, MAX(fi) AS ef,
      |    COUNT(*) AS nf, SUM(e) AS se FROM act GROUP BY 1, 2)
      |SELECT id,
      |  CAST(row_number() OVER (PARTITION BY id ORDER BY sf) AS INT)
      |    AS seg_idx,
      |  CAST(sf AS INT) AS start_frame, CAST(ef AS INT) AS end_frame,
      |  CAST(nf AS BIGINT) AS n_frames, CAST(se AS BIGINT) AS seg_energy
      |FROM seg ORDER BY id, seg_idx""".stripMargin

  /** Real VIDEO frame decode, ORACLE-CHECKED: payloads are complete GFV1
    * clips (MJPEG-style container of genuine PNG/BMP stills) whose frame
    * `f` follows the closed form `(id + 97f + 7x + 13y) mod 256`; the
    * query really encodes every frame, really parses the container back
    * and really decodes each still through `ImageIO` — one row per frame —
    * while DuckDB reproduces every per-frame statistic from the integer
    * closed form alone. A container-parse bug, frame-boundary slip, or
    * codec drift hash-mismatches. */
  private def mm04(s: SparkSession, dir: String): DataFrame = {
    val clips = Multimodal.synthesizeVideos(
      t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id")
    Multimodal.decodeVideoFrameStats(clips)
      .withColumn("duration_ms",
        round(col("n_frames") * lit(1000.0) / col("fps"), 3))
      .orderBy(col("id"), col("frame_idx"))
  }

  private val mm04Sql =
    """WITH d AS (SELECT doc_id AS id, 2 + doc_id % 6 AS nf, 1 + doc_id % 5 AS fps,
      |    1 + doc_id % 31 AS w, 1 + doc_id % 17 AS h
      |  FROM documents WHERE doc_id < 200),
      |fr AS (SELECT d.*, f.f AS fi FROM d, UNNEST(range(0, d.nf)) AS f(f)),
      |px AS (SELECT fr.id, fr.fi,
      |    CAST(SUM((fr.id + 97*fr.fi + 7*xs.x + 13*ys.y) % 256) AS BIGINT) AS px_sum,
      |    CAST(MIN((fr.id + 97*fr.fi + 7*xs.x + 13*ys.y) % 256) AS INT) AS px_min,
      |    CAST(MAX((fr.id + 97*fr.fi + 7*xs.x + 13*ys.y) % 256) AS INT) AS px_max
      |  FROM fr, UNNEST(range(0, fr.w)) AS xs(x), UNNEST(range(0, fr.h)) AS ys(y)
      |  GROUP BY fr.id, fr.fi)
      |SELECT fr.id, CAST(fr.fi AS INT) AS frame_idx,
      |  CASE (fr.id + fr.fi) % 2 WHEN 0 THEN 'png' ELSE 'bmp' END AS format,
      |  CAST(fr.w AS INT) AS width, CAST(fr.h AS INT) AS height,
      |  px.px_sum, px.px_min, px.px_max,
      |  CAST(fr.nf AS INT) AS n_frames, CAST(fr.fps AS INT) AS fps,
      |  round(fr.nf * 1000.0 / fr.fps, 3) AS duration_ms
      |FROM fr JOIN px ON px.id = fr.id AND px.fi = fr.fi
      |ORDER BY fr.id, fr.fi""".stripMargin

  // ------------------------------------------- mm05 perceptual image hash

  /** Perceptual image hashing — [[Multimodal.ahashPair]]: real PNG and
    * JPEG encodes of the same closed-form raster, real `ImageIO` decodes,
    * [[graft.llm.ImageCodec.ahash64]] on both. The 64-bit PNG hash is
    * INTEGER-EXACT (cross-multiplied mean comparisons), so DuckDB
    * reproduces every bit from the closed form; the JPEG twin's hamming
    * distance is the perceptual-robustness gate (measured max 6 of 64
    * bits across the id range — gated at ≤ 10). A codec bug, grid-split
    * drift, or a lossy-roundtrip blowup all hash-mismatch. */
  private def mm05(s: SparkSession, dir: String): DataFrame =
    Multimodal.ahashPair(
      t(s, dir, "documents").filter(col("doc_id") < 150), "doc_id")
      .select(col("id"), col("ahash"), (col("ham_jpeg") <= 10).as("jpeg_ok"))
      .orderBy(col("id"))

  private val mm05Sql =
    """WITH ids AS (SELECT doc_id AS id, 8 + doc_id % 24 AS w,
      |    8 + doc_id % 12 AS h
      |  FROM documents WHERE doc_id < 150),
      |px AS (SELECT id, w, h, p % w AS x, p // w AS y,
      |    (id + 7 * (p % w) + 13 * (p // w)) % 256 AS v
      |  FROM (SELECT id, w, h, unnest(range(w * h)) AS p FROM ids)),
      |cells AS (SELECT id, CAST(y * 8 // h * 8 + x * 8 // w AS INT) AS c,
      |    SUM(v) AS cs, COUNT(*) AS cn, MAX(w * h) AS np
      |  FROM px GROUP BY 1, 2),
      |tot AS (SELECT id, SUM(cs) AS ts FROM cells GROUP BY 1)
      |SELECT id, CAST(SUM(CASE
      |    WHEN cs * np > ts * cn THEN
      |      CASE WHEN c = 0 THEN -9223372036854775808
      |           ELSE (CAST(1 AS BIGINT) << (63 - c)) END
      |    ELSE 0 END) AS BIGINT) AS ahash,
      |  TRUE AS jpeg_ok
      |FROM cells JOIN tot USING (id)
      |GROUP BY id ORDER BY id""".stripMargin

  // ----------------------------------------- mm08 image near-dup pairing

  /** Cross-image near-duplicate pairing, the corpus-level complement of
    * mm05's per-image hash: real PNG encode → `ImageIO` decode →
    * [[graft.llm.ImageCodec.ahash64]] for each id, then
    * [[Multimodal.ahashNearDupPairs]] — 4×16-bit band buckets + exact
    * Hamming verify, pigeonhole-EXACT at maxHamming=3 < 4 bands, so the
    * banded plan must reproduce DuckDB's all-pairs closed-form twin
    * row-for-row (a recall gap, band-slice drift, or codec bug
    * hash-mismatches; the closed-form raster family genuinely exercises
    * both sides of the threshold — ham 0–3 in, 4+ out). The id cap bounds
    * DECODE cost, not the plan: the pairing is the same banded bucket
    * join the MinHash path runs corpus-wide. */
  private def mm08(s: SparkSession, dir: String): DataFrame =
    Multimodal.ahashNearDupPairs(
        Multimodal.ahashPair(
            t(s, dir, "documents").filter(col("doc_id") < 2000), "doc_id")
          .select(col("id"), col("ahash")),
        maxHamming = 3, bands = 4)
      .orderBy(col("id_a"), col("id_b"))

  private val mm08Sql =
    """WITH ids AS (SELECT doc_id AS id, 8 + doc_id % 24 AS w,
      |    8 + doc_id % 12 AS h
      |  FROM documents WHERE doc_id < 2000),
      |px AS (SELECT id, w, h, p % w AS x, p // w AS y,
      |    (id + 7 * (p % w) + 13 * (p // w)) % 256 AS v
      |  FROM (SELECT id, w, h, unnest(range(w * h)) AS p FROM ids)),
      |cells AS (SELECT id, CAST(y * 8 // h * 8 + x * 8 // w AS INT) AS c,
      |    SUM(v) AS cs, COUNT(*) AS cn, MAX(w * h) AS np
      |  FROM px GROUP BY 1, 2),
      |tot AS (SELECT id, SUM(cs) AS ts FROM cells GROUP BY 1),
      |hsh AS (SELECT id, CAST(SUM(CASE
      |    WHEN cs * np > ts * cn THEN
      |      CASE WHEN c = 0 THEN -9223372036854775808
      |           ELSE (CAST(1 AS BIGINT) << (63 - c)) END
      |    ELSE 0 END) AS BIGINT) AS ahash
      |  FROM cells JOIN tot USING (id) GROUP BY id)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
      |FROM hsh a JOIN hsh b ON a.id < b.id
      |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
      |ORDER BY 1, 2""".stripMargin

  // ------------------------------- mm09 image near-dup STORE probe

  /** Store-backed incremental image dedup — the image modality joining the
    * d16 (exact) / d18 (MinHash) / d24 (embedding) incremental family:
    * history images' aHashes live in the durable [[graft.llm.DedupStore]]
    * (8 bytes per image, batch −1 is the seed), and a new crawl batch —
    * single-bit perturbations of every 5th history image (re-encodes that
    * must DROP) plus new rasters — probes it via
    * [[Multimodal.ahashStoreProbe]]: banded bucket join + exact Hamming
    * verify, pigeonhole-EXACT at 1 < 4 bands, so the banded probe must
    * reproduce DuckDB's all-pairs batch×history twin row-for-row. The
    * gradient raster family's aHashes genuinely cluster (some new rasters
    * repeat a history hash outright), so the fresh leg exercises BOTH
    * decisions — ~half keep, ~half drop — and the oracle computes the
    * same closed-form hashes, so there is no probabilistic gate to tune.
    * The flipped bit stays in 0..62: bit 63 would need the mm08 sign-bit
    * CASE on the SQL side. */
  private def mm09(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.DedupStore
    val hist = Multimodal.ahashPair(
        t(s, dir, "documents").filter(col("doc_id") < 400), "doc_id")
      .select(col("id").as("img_id"), col("ahash"))
    val root = staging("mm09store", dir)
    DedupStore.appendImageHashes(s, root, -1L, hist)
    val nd = DedupStore.readImageHashes(s, root)
      .filter(col("img_id") % 5 === 0)
      .select((col("img_id") + lit(100000L)).as("id"),
        expr("ahash ^ (CAST(1 AS BIGINT) << CAST(img_id % 63 AS INT))")
          .as("ahash"))
    val fresh = Multimodal.ahashPair(
        t(s, dir, "documents")
          .filter(col("doc_id") >= 400 && col("doc_id") < 500), "doc_id")
      .select(col("id"), col("ahash"))
    Multimodal.ahashStoreProbe(nd.unionByName(fresh),
        DedupStore.readImageHashes(s, root), maxHamming = 1)
      .orderBy(col("id"))
  }

  private val mm09Sql =
    """WITH ids AS (SELECT doc_id AS id, 8 + doc_id % 24 AS w,
      |    8 + doc_id % 12 AS h
      |  FROM documents WHERE doc_id < 500),
      |px AS (SELECT id, w, h, p % w AS x, p // w AS y,
      |    (id + 7 * (p % w) + 13 * (p // w)) % 256 AS v
      |  FROM (SELECT id, w, h, unnest(range(w * h)) AS p FROM ids)),
      |cells AS (SELECT id, CAST(y * 8 // h * 8 + x * 8 // w AS INT) AS c,
      |    SUM(v) AS cs, COUNT(*) AS cn, MAX(w * h) AS np
      |  FROM px GROUP BY 1, 2),
      |tot AS (SELECT id, SUM(cs) AS ts FROM cells GROUP BY 1),
      |hsh AS (SELECT id, CAST(SUM(CASE
      |    WHEN cs * np > ts * cn THEN
      |      CASE WHEN c = 0 THEN -9223372036854775808
      |           ELSE (CAST(1 AS BIGINT) << (63 - c)) END
      |    ELSE 0 END) AS BIGINT) AS ahash
      |  FROM cells JOIN tot USING (id) GROUP BY id),
      |hist AS (SELECT id AS img_id, ahash FROM hsh WHERE id < 400),
      |nd AS (SELECT img_id + 100000 AS id,
      |    xor(ahash, (CAST(1 AS BIGINT) << CAST(img_id % 63 AS INT)))
      |      AS ahash
      |  FROM hist WHERE img_id % 5 = 0),
      |fresh AS (SELECT id, ahash FROM hsh WHERE id >= 400),
      |batch AS (SELECT * FROM nd UNION ALL SELECT * FROM fresh),
      |m AS (SELECT b.id,
      |    CAST(COUNT(DISTINCT h.img_id) AS BIGINT) AS n_matches,
      |    CAST(MIN(bit_count(xor(b.ahash, h.ahash))) AS INT) AS min_ham
      |  FROM batch b JOIN hist h
      |    ON bit_count(xor(b.ahash, h.ahash)) <= 1
      |  GROUP BY 1)
      |SELECT b.id, (m.n_matches IS NULL) AS kept,
      |  COALESCE(m.n_matches, 0) AS n_matches, m.min_ham
      |FROM batch b LEFT JOIN m ON b.id = m.id ORDER BY b.id""".stripMargin

  // ------------------------------- mm10 VIDEO near-dup STORE probe

  /** Store-backed incremental VIDEO dedup — the video modality closing
    * the d16/d18/d24/mm09 incremental matrix: a clip's signature is its
    * ORDERED per-frame aHash sequence ([[Multimodal.videoAhashes]] — a
    * real GFV1 container parse + `ImageIO` decode per frame, 8 bytes per
    * frame in the durable [[graft.llm.DedupStore]]), and a new crawl
    * batch — every 5th history clip RE-ENCODED (id+100000: byte-different
    * container, frame formats flipped PNG↔BMP, pixel-identical rasters —
    * the transcode that must DROP) plus fresh clips — probes it via
    * [[Multimodal.videoStoreProbe]]: frame-0 band buckets for candidates
    * (pigeonhole-EXACT at maxHamming 3 < 4 bands), frame-ALIGNED Hamming
    * verify over candidates only, match = same frame count ∧ every
    * aligned frame within the bound. The oracle recomputes every frame
    * hash closed-form and the same all-pairs classification — kept /
    * n_matches / min_ham are VALUE-matched, not gate-asserted — while
    * `exact_ok` re-proves the banded probe against an in-query exhaustive
    * twin per run (the sf1/sf10 gate where the oracle doesn't reach; the
    * id caps make the twin constant-size at any scale). */
  private def mm10(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.DedupStore
    val docs = t(s, dir, "documents")
    val hist = Multimodal.videoAhashes(
        Multimodal.synthesizeVideoCorpus(
          docs.filter(col("doc_id") < 300), "doc_id"))
      .select(col("id").as("vid_id"), col("n_frames"), col("frame_idx"),
        col("ahash"))
    val root = staging("mm10store", dir)
    DedupStore.appendVideoSigs(s, root, -1L, hist)
    val batchIds = docs.filter(col("doc_id") < 300 && col("doc_id") % 5 === 0)
      .select((col("doc_id") + lit(100000L)).as("doc_id"))
      .unionByName(docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
        .select(col("doc_id").cast("long").as("doc_id")))
    val batch = Multimodal.videoAhashes(
      Multimodal.synthesizeVideoCorpus(batchIds, "doc_id"))
    val store = DedupStore.readVideoSigs(s, root)
    val probe = Multimodal.videoStoreProbe(batch, store,
      maxHamming = 3, bands = 4)
    // exhaustive in-query twin: every (batch, history) clip pair,
    // frame-aligned — no candidate leg to miss through
    val exact = batch
      .select(col("id"), col("n_frames").as("nb"), col("frame_idx"),
        col("ahash"))
      .join(hist.select(col("vid_id"), col("n_frames").as("nh"),
        col("frame_idx"), col("ahash").as("h_hash")), Seq("frame_idx"))
      .filter(col("ahash").isNotNull && col("h_hash").isNotNull)
      .groupBy(col("id"), col("vid_id"))
      .agg(first(col("nb")).as("nb"), first(col("nh")).as("nh"),
        count(lit(1)).as("n_aligned"),
        max(bit_count(col("ahash").bitwiseXOR(col("h_hash"))).cast("int"))
          .as("max_ham"))
      .filter(col("nb") === col("nh") && col("n_aligned") === col("nb")
        && col("max_ham") <= 3)
      .groupBy(col("id"))
      .agg(countDistinct(col("vid_id")).as("n_matches_exact"))
    probe.join(exact, Seq("id"), "left")
      .select(col("id"), col("kept"), col("n_matches"), col("min_ham"),
        (col("n_matches") === coalesce(col("n_matches_exact"), lit(0L)))
          .as("exact_ok"))
      .orderBy(col("id"))
  }

  private val mm10Sql =
    """WITH bases AS (SELECT DISTINCT doc_id AS b FROM documents
      |    WHERE doc_id < 400),
      |dims AS (SELECT b, 8 + b % 24 AS w, 8 + b % 12 AS h,
      |    CAST(2 + b % 3 AS INT) AS nf FROM bases),
      |fr AS (SELECT b, w, h, nf, unnest(range(nf)) AS f FROM dims),
      |px AS (SELECT b, f, nf, w, h, p % w AS x, p // w AS y,
      |    (b + 97 * f + 7 * (p % w) + 13 * (p // w)) % 256 AS v
      |  FROM (SELECT b, f, nf, w, h, unnest(range(w * h)) AS p FROM fr)),
      |cells AS (SELECT b, f, nf, CAST(y * 8 // h * 8 + x * 8 // w AS INT) AS c,
      |    SUM(v) AS cs, COUNT(*) AS cn, MAX(w * h) AS np
      |  FROM px GROUP BY 1, 2, 3, 4),
      |tot AS (SELECT b, f, SUM(cs) AS ts FROM cells GROUP BY 1, 2),
      |hsh AS (SELECT cells.b, cells.f, cells.nf, CAST(SUM(CASE
      |    WHEN cs * np > ts * cn THEN
      |      CASE WHEN c = 0 THEN -9223372036854775808
      |           ELSE (CAST(1 AS BIGINT) << (63 - c)) END
      |    ELSE 0 END) AS BIGINT) AS ahash
      |  FROM cells JOIN tot ON cells.b = tot.b AND cells.f = tot.f
      |  GROUP BY 1, 2, 3),
      |hist AS (SELECT b AS vid_id, nf, f, ahash FROM hsh WHERE b < 300),
      |batch AS (
      |  SELECT b + 100000 AS id, nf, f, ahash FROM hsh
      |  WHERE b < 300 AND b % 5 = 0
      |  UNION ALL
      |  SELECT b AS id, nf, f, ahash FROM hsh WHERE b >= 300),
      |pairs AS (
      |  SELECT bt.id, h.vid_id,
      |    MAX(bit_count(xor(bt.ahash, h.ahash))) AS max_ham
      |  FROM batch bt JOIN hist h ON bt.f = h.f AND bt.nf = h.nf
      |  GROUP BY 1, 2
      |  HAVING MAX(bit_count(xor(bt.ahash, h.ahash))) <= 3),
      |m AS (SELECT id, CAST(COUNT(DISTINCT vid_id) AS BIGINT) AS n_matches,
      |    CAST(MIN(max_ham) AS INT) AS min_ham
      |  FROM pairs GROUP BY 1),
      |bids AS (SELECT DISTINCT id FROM batch)
      |SELECT b.id, (m.n_matches IS NULL) AS kept,
      |  COALESCE(m.n_matches, 0) AS n_matches, m.min_ham, TRUE AS exact_ok
      |FROM bids b LEFT JOIN m ON b.id = m.id ORDER BY b.id""".stripMargin

  // ------------------------------- mm11 AUDIO near-dup STORE probe

  /** Store-backed incremental AUDIO dedup — the audio modality closing
    * the d16/d18/d24/mm09/mm10 incremental matrix: a clip's signature is
    * its ORDERED per-frame sign-pattern fingerprint
    * ([[Multimodal.audioSignSigs]] — a real RIFF/WAVE parse through
    * `javax.sound.sampled` + 64-sample sign pack, 8 bytes per frame in
    * the durable [[graft.llm.DedupStore]]), and a new crawl batch — every
    * 5th history clip RE-PUBLISHED volume-attenuated (id+100000:
    * byte-different payload, every sample arithmetically halved,
    * sign-pattern identical — the re-encode that must DROP) plus fresh
    * clips — probes it via [[Multimodal.audioStoreProbe]]: frame-0
    * signature-equality candidates (recall EXACTLY 1.0 — a matching pair
    * has frame 0 equal by definition), frame-ALIGNED equality verify over
    * candidates only, match = same frame count ∧ every aligned frame
    * equal. The oracle recomputes every sign bit closed-form and the same
    * all-pairs classification — kept / n_matches are VALUE-matched, not
    * gate-asserted — while `exact_ok` re-proves the bucketed probe
    * against an in-query exhaustive twin per run (the sf1/sf10 gate where
    * the oracle doesn't reach; the id caps make the twin constant-size at
    * any scale). */
  private def mm11(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.DedupStore
    val docs = t(s, dir, "documents")
    val hist = Multimodal.audioSignSigs(
        Multimodal.synthesizeAudioCorpus(
          docs.filter(col("doc_id") < 300), "doc_id"))
      .select(col("id").as("clip_id"), col("n_frames"), col("frame_idx"),
        col("sig"))
    val root = staging("mm11store", dir)
    DedupStore.appendAudioSigs(s, root, -1L, hist)
    val batchIds = docs.filter(col("doc_id") < 300 && col("doc_id") % 5 === 0)
      .select((col("doc_id") + lit(100000L)).as("doc_id"))
      .unionByName(docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
        .select(col("doc_id").cast("long").as("doc_id")))
    val batch = Multimodal.audioSignSigs(
      Multimodal.synthesizeAudioCorpus(batchIds, "doc_id"))
    val store = DedupStore.readAudioSigs(s, root)
    val probe = Multimodal.audioStoreProbe(batch, store)
    // exhaustive in-query twin: every (batch, history) clip pair,
    // frame-aligned — no candidate leg to miss through
    val exact = batch
      .select(col("id"), col("n_frames").as("nb"), col("frame_idx"),
        col("sig"))
      .join(hist.select(col("clip_id"), col("n_frames").as("nh"),
        col("frame_idx"), col("sig").as("h_sig")), Seq("frame_idx"))
      .groupBy(col("id"), col("clip_id"))
      .agg(first(col("nb")).as("nb"), first(col("nh")).as("nh"),
        count(lit(1)).as("n_aligned"),
        sum(when(col("sig") === col("h_sig"), 0L).otherwise(1L))
          .as("n_diff"))
      .filter(col("nb") === col("nh") && col("n_aligned") === col("nb")
        && col("n_diff") === 0L)
      .groupBy(col("id"))
      .agg(countDistinct(col("clip_id")).as("n_matches_exact"))
    probe.join(exact, Seq("id"), "left")
      .select(col("id"), col("kept"), col("n_matches"),
        (col("n_matches") === coalesce(col("n_matches_exact"), lit(0L)))
          .as("exact_ok"))
      .orderBy(col("id"))
  }

  private val mm11Sql =
    """WITH bases AS (SELECT DISTINCT doc_id AS b FROM documents
      |    WHERE doc_id < 400),
      |dims AS (SELECT b, CAST(2 + b % 3 AS INT) AS nf FROM bases),
      |fr AS (SELECT b, nf, unnest(range(nf)) AS f FROM dims),
      |bits AS (SELECT b, nf, f, unnest(range(64)) AS j FROM fr),
      |sg AS (SELECT b, nf, f, CAST(SUM(CASE
      |    WHEN (b * 20011 + 9973 * (f * 64 + j)
      |          + b * (f * 64 + j) * 37) % 65536 >= 32768 THEN
      |      CASE WHEN j = 0 THEN -9223372036854775808
      |           ELSE (CAST(1 AS BIGINT) << (63 - j)) END
      |    ELSE 0 END) AS BIGINT) AS sig
      |  FROM bits GROUP BY 1, 2, 3),
      |hist AS (SELECT b AS clip_id, nf, f, sig FROM sg WHERE b < 300),
      |batch AS (
      |  SELECT b + 100000 AS id, nf, f, sig FROM sg
      |  WHERE b < 300 AND b % 5 = 0
      |  UNION ALL
      |  SELECT b AS id, nf, f, sig FROM sg WHERE b >= 300),
      |pairs AS (
      |  SELECT bt.id, h.clip_id
      |  FROM batch bt JOIN hist h ON bt.f = h.f AND bt.nf = h.nf
      |  GROUP BY 1, 2
      |  HAVING SUM(CASE WHEN bt.sig <> h.sig THEN 1 ELSE 0 END) = 0),
      |m AS (SELECT id, CAST(COUNT(DISTINCT clip_id) AS BIGINT) AS n_matches
      |  FROM pairs GROUP BY 1),
      |bids AS (SELECT DISTINCT id FROM batch)
      |SELECT b.id, (m.n_matches IS NULL) AS kept,
      |  COALESCE(m.n_matches, 0) AS n_matches, TRUE AS exact_ok
      |FROM bids b LEFT JOIN m ON b.id = m.id ORDER BY b.id""".stripMargin

  // ---------------------------------------------------------------- export

  private[graft] val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm01_image_header_dims" -> (mm01 _),
    "mm02_media_resize_frames" -> (mm02 _),
    "mm03_audio_wav" -> (mm03 _),
    "mm04_video_frames" -> (mm04 _),
    "mm05_image_ahash" -> (mm05 _),
    "mm06_audio_frame_features" -> (mm06 _),
    "mm07_audio_vad" -> (mm07 _),
    "mm08_image_neardup_pairs" -> (mm08 _),
    "mm09_image_store_dedup" -> (mm09 _),
    "mm10_video_neardup" -> (mm10 _),
    "mm11_audio_neardup" -> (mm11 _))

  private[graft] val oracleSql: Map[String, String] = Map(
    "mm01_image_header_dims" -> mm01Sql,
    "mm02_media_resize_frames" -> mm02Sql,
    "mm03_audio_wav" -> mm03Sql,
    "mm04_video_frames" -> mm04Sql,
    "mm05_image_ahash" -> mm05Sql,
    "mm06_audio_frame_features" -> mm06Sql,
    "mm07_audio_vad" -> mm07Sql,
    "mm08_image_neardup_pairs" -> mm08Sql,
    "mm09_image_store_dedup" -> mm09Sql,
    "mm10_video_neardup" -> mm10Sql,
    "mm11_audio_neardup" -> mm11Sql)
}
