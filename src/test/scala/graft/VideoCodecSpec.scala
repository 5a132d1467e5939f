package graft

import org.apache.spark.sql.functions._
import graft.llm.{ImageCodec, Multimodal, VideoCodec}

/** GFV1 frame-container codec: a real encode→parse→per-frame-ImageIO
  * roundtrip, hostile-payload degradation (None / NULL rows, never
  * throws), and the extractFeatures routing for video payloads. */
class VideoCodecSpec extends SparkSpec {
  import spark.implicits._

  private def closedFormSum(seed: Long, w: Int, h: Int): Long =
    (for (x <- 0 until w; y <- 0 until h)
      yield ((seed + 7L * x + 13L * y) % 256 + 256) % 256).sum

  test("encode→decode roundtrip: every frame really re-decodes to the closed form") {
    val clip = VideoCodec.encode(id = 5L, nFrames = 4, fps = 3, w = 9, h = 6)
    val Some((fps, frames)) = VideoCodec.decode(clip)
    assert(fps == 3 && frames.length == 4)
    frames.zipWithIndex.foreach { case (frame, f) =>
      val Some(feat) = ImageCodec.decodeFeatures(frame)
      assert(feat(0) == 9f && feat(1) == 6f)
      assert(feat(3) == closedFormSum(5L + 97L * f, 9, 6).toFloat,
        s"frame $f pixel sum")
    }
  }

  test("hostile payloads degrade to None, never throw") {
    val good = VideoCodec.encode(1L, 2, 1, 4, 3)
    assert(VideoCodec.decode(null).isEmpty)
    assert(VideoCodec.decode(Array[Byte]()).isEmpty)
    assert(VideoCodec.decode("GFV1".getBytes ++ Array[Byte](0, 0)).isEmpty,
      "truncated header")
    assert(VideoCodec.decode("NOPE".getBytes ++ good.drop(4)).isEmpty, "bad magic")
    assert(VideoCodec.decode(good.dropRight(5)).isEmpty, "truncated last frame")
    assert(VideoCodec.decode(good ++ Array[Byte](1, 2, 3)).isEmpty,
      "trailing garbage")
    // lying frame count: claims 3 frames, carries 2
    val lying = good.clone(); lying(7) = 3
    assert(VideoCodec.decode(lying).isEmpty)
    // hostile frame count: 2^31-1 claimed in a 12-byte payload must be
    // rejected BEFORE the frame-array allocation (OOM guard), not after
    val hostile = "GFV1".getBytes ++
      Array[Byte](0x7f, -1, -1, -1, 0, 0, 0, 1)
    assert(VideoCodec.decode(hostile).isEmpty)
    // fps 0 is not a playable clip
    val fps0 = good.clone(); fps0(11) = 0
    assert(VideoCodec.decode(fps0).isEmpty)
  }

  test("decodeVideoFrameStats: per-frame rows; corrupt clips one NULL row") {
    val media = Multimodal.synthesizeVideos(
      spark.range(0, 20).select($"id".as("doc_id")), "doc_id")
      .unionByName(Seq((999L, "not a video".getBytes))
        .toDF("id", "payload"))
    val out = Multimodal.decodeVideoFrameStats(media).collect()
    val perClip = out.groupBy(_.getLong(0))
    (0L until 20L).foreach { id =>
      val rows = perClip(id)
      assert(rows.length == 2 + (id % 6).toInt, s"clip $id frame count")
      rows.foreach { r =>
        val fi = r.getInt(1)
        assert(r.getString(2) == (if ((id + fi) % 2 == 0) "png" else "bmp"))
        assert(r.getLong(5) ==
          closedFormSum(id + 97L * fi, 1 + (id % 31).toInt, 1 + (id % 17).toInt))
      }
    }
    val corrupt = perClip(999L)
    assert(corrupt.length == 1 && corrupt.head.isNullAt(5),
      "corrupt clip must yield one NULL-stat row, not fail the job")
  }

  test("zero-frame clip surfaces one row with n_frames=0, not zero rows") {
    val clip = VideoCodec.encode(7L, nFrames = 0, fps = 4, w = 3, h = 3)
    assert(VideoCodec.decode(clip).exists { case (fps, fr) =>
      fps == 4 && fr.isEmpty })
    val media = Seq((7L, clip)).toDF("id", "payload")
    val out = Multimodal.decodeVideoFrameStats(media).collect()
    assert(out.length == 1 && out.head.getInt(8) == 0 &&
      out.head.getInt(9) == 4 && out.head.isNullAt(1))
  }

  test("re-encoded clips: different container bytes, identical frame hashes") {
    // synthesizeVideoCorpus's plant contract: id+100000 flips every
    // frame's container format (PNG<->BMP, both lossless) but keeps the
    // rasters — the perceptual signature must be INVARIANT to the
    // transcode while the payload bytes differ
    val ids = Seq(5L, 12L, 23L)
    val both = Multimodal.synthesizeVideoCorpus(
      (ids ++ ids.map(_ + 100000L)).toDF("doc_id"), "doc_id")
    val payloads = both.collect().map(r => r.getLong(0) ->
      r.getAs[Array[Byte]](1)).toMap
    ids.foreach { id =>
      assert(!java.util.Arrays.equals(payloads(id), payloads(id + 100000L)),
        s"clip $id: the re-encode must be byte-different")
    }
    val sigs = Multimodal.videoAhashes(both)
      .collect().map(r => (r.getLong(0), r.getInt(2)) ->
        (r.getInt(1), if (r.isNullAt(3)) null else r.getLong(3))).toMap
    ids.foreach { id =>
      val nf = 2 + (id % 3).toInt
      (0 until nf).foreach { f =>
        assert(sigs((id, f)) == sigs((id + 100000L, f)),
          s"clip $id frame $f: transcode moved the perceptual hash")
      }
    }
    // probe: the re-encode drops (match at ham 0), a genuinely different
    // clip keeps; banded candidates equal the exhaustive contract
    val hist = Multimodal.videoAhashes(Multimodal.synthesizeVideoCorpus(
        ids.toDF("doc_id"), "doc_id"))
      .select($"id".as("vid_id"), $"n_frames", $"frame_idx", $"ahash")
    val batch = Multimodal.videoAhashes(Multimodal.synthesizeVideoCorpus(
      Seq(100005L, 777L).toDF("doc_id"), "doc_id"))
    val out = Multimodal.videoStoreProbe(batch, hist, maxHamming = 3,
        bands = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2))).toMap
    assert(out(100005L) == (false, 1L), s"re-encode of 5 must drop: $out")
    assert(out(777L)._1, s"fresh clip must keep: $out")
  }

  test("extractFeatures routes GFV1 payloads through the real frame decode") {
    val media = Multimodal.synthesizeVideos(
        spark.range(3, 5).select($"id".as("doc_id")), "doc_id")
      .select($"id".as("doc_id"),
        struct($"payload",
          struct(lit("video").as("kind"), lit(1).as("width"), lit(1).as("height"),
            lit(0).as("sample_rate"), lit(0L).as("duration_ms")).as("meta"))
          .as("media"))
    val feats = Multimodal.extractFeatures(spark, media, "doc_id").collect()
    feats.foreach { r =>
      val id = r.getLong(0)
      val f = r.getSeq[Float](2)
      val nf = 2 + (id % 6).toInt
      assert(f(0) == nf.toFloat && f(1) == (1 + (id % 5)).toFloat)
      val w = 1 + (id % 31).toInt
      val h = 1 + (id % 17).toInt
      val total = (0 until nf).map(fi => closedFormSum(id + 97L * fi, w, h)).sum
      assert(f(2) == total.toFloat, s"clip $id total pixel sum across frames")
    }
  }
}
