package graft

import org.apache.spark.sql.functions._
import graft.llm.{AudioCodec, Multimodal}

/** RIFF/WAVE roundtrips through the real javax.sound.sampled decode: the
  * closed-form PCM fill must come back byte-exact, corrupt payloads must
  * degrade to None / NULL columns, and extractFeatures must route audio
  * through the real decode (not the stub). */
class AudioCodecSpec extends SparkSpec {

  private def closedForm(id: Long, n: Int): (Long, Int, Int) = {
    var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
    for (i <- 0 until n) {
      val s = AudioCodec.sample(id, i)
      sum += s; if (s < mn) mn = s; if (s > mx) mx = s
    }
    (sum, mn, mx)
  }

  test("wav encode→decode is sample-exact against the closed form") {
    for ((id, n, rate) <- Seq((0L, 1, 8000), (5L, 100, 16000),
        (123L, 999, 24000), (7L, 2, 8000))) {
      val Some((gotRate, gotN, sum, mn, mx)) =
        AudioCodec.decodeWav(AudioCodec.encodeWav(id, n, rate))
      val (wantSum, wantMn, wantMx) = closedForm(id, n)
      assert(gotRate == rate && gotN == n.toLong
        && sum == wantSum && mn == wantMn && mx == wantMx,
        s"id=$id n=$n rate=$rate got ($gotRate,$gotN,$sum,$mn,$mx)")
    }
  }

  test("corrupt / truncated / non-audio payloads decode to None, not throw") {
    assert(AudioCodec.decodeWav(null).isEmpty)
    assert(AudioCodec.decodeWav(Array.empty[Byte]).isEmpty)
    assert(AudioCodec.decodeWav("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.decodeWav(
      graft.llm.ImageCodec.encode("png", 1L, 4, 4)).isEmpty)
  }

  test("decodeAudioStats: real decode distributed over partitions") {
    import spark.implicits._
    val ids = spark.range(0, 30).select($"id".as("doc_id"))
    val clips = Multimodal.synthesizeAudio(ids, "doc_id")
    val got = Multimodal.decodeAudioStats(clips).collect()
    assert(got.length == 30)
    got.foreach { r =>
      val id = r.getLong(0)
      val n = 100 + (id % 900).toInt
      val rate = 8000 * (1 + (id % 3).toInt)
      val (sum, mn, mx) = closedForm(id, n)
      assert(r.getInt(1) == rate && r.getLong(2) == n.toLong
        && r.getLong(3) == sum && r.getInt(4) == mn && r.getInt(5) == mx,
        s"id=$id got $r")
    }
  }

  test("frameFeatures: real decode matches the closed form per frame") {
    val id = 7L
    val n = 300 // 2 complete 128-frames + a 44-sample tail (dropped)
    val wav = AudioCodec.encodeWav(id, n, 16000)
    val Some(frames) = AudioCodec.frameFeatures(wav, 128)
    assert(frames.map(_._1) == Seq(0, 1), "complete frames only, tail dropped")
    frames.foreach { case (f, zcr, energy) =>
      var eZcr = 0; var eEnergy = 0L; var prev = 0
      for (i <- 0 until 128) {
        val s = AudioCodec.sample(id, f * 128L + i)
        eEnergy += s.toLong * s
        if (i > 0 && ((s >= 0) != (prev >= 0))) eZcr += 1
        prev = s
      }
      assert((zcr, energy) == ((eZcr, eEnergy)), s"frame $f")
    }
    // corrupt payload: None, and zero rows from the frame extractor
    assert(AudioCodec.frameFeatures("not audio".getBytes, 128).isEmpty)
    assert(AudioCodec.frameFeatures(null, 128).isEmpty)
  }

  test("extractFeatures routes wav payloads through the real decode") {
    import spark.implicits._
    val ids = spark.range(0, 6).select($"id".as("doc_id"))
    val media = Multimodal.synthesizeAudio(ids, "doc_id")
      .select($"id".as("doc_id"),
        struct($"payload",
          struct(lit("audio").as("kind"), lit(0).as("width"), lit(0).as("height"),
            lit(16000).as("sample_rate"), lit(0L).as("duration_ms")).as("meta"))
          .as("media"))
    val feats = Multimodal.extractFeatures(spark, media, "doc_id").collect()
    assert(feats.length == 6)
    feats.foreach { r =>
      val id = r.getLong(0)
      val f = r.getSeq[Float](2)
      val n = 100 + (id % 900).toInt
      assert(f(0) == (8000 * (1 + (id % 3))).toFloat, s"rate feature: $f")
      assert(f(1) == n.toFloat, s"n feature: $f")
      val (sum, _, _) = closedForm(id, n)
      assert(f(2) == sum.toFloat)
    }
  }

  test("audioVadSegments: islands follow the gated closed form; all-silent clip yields no rows") {
    import spark.implicits._
    // id 1, 1536 samples = 12 frames of 128; blocks of 256 (2 frames),
    // every 3rd silent → frames 0,1 6,7 silent; segments [2,5] and [8,11]
    val media = Seq(
      (1L, AudioCodec.encodeWavGated(1L, 1536, 8000, 256, 3)),
      // every block silent → zero voiced frames → clip absent from output
      (2L, AudioCodec.encodeWavGated(2L, 1536, 8000, 256, 1)))
      .toDF("id", "payload")
    val segs = Multimodal.audioVadSegments(media, frameLen = 128)
      .select($"id", $"seg_idx", $"start_frame", $"end_frame", $"n_frames")
      .as[(Long, Int, Int, Int, Long)].collect().sortBy(r => (r._1, r._2))
      .toSeq
    assert(segs == Seq((1L, 1, 2, 5, 4L), (1L, 2, 8, 11, 4L)),
      s"unexpected segments: $segs")
    // segment energies equal the per-sample closed form summed over runs
    val e = Multimodal.audioVadSegments(media, frameLen = 128)
      .select($"seg_energy").as[Long].collect().sorted.toSeq
    def runEnergy(id: Long, fLo: Int, fHi: Int): Long =
      (fLo * 128 until (fHi + 1) * 128).map { i =>
        val v = AudioCodec.gatedSample(id, i, 256, 3).toLong; v * v
      }.sum
    assert(e == Seq(runEnergy(1, 2, 5), runEnergy(1, 8, 11)).sorted)
  }

  test("frameSignSigs: sign pack matches the closed form; tail dropped; hostile inputs") {
    val id = 11L
    val n = 150 // 2 complete 64-frames + a 22-sample tail (dropped)
    val wav = AudioCodec.encodeWav(id, n, 16000)
    val Some(sigs) = AudioCodec.frameSignSigs(wav, 64)
    assert(sigs.map(_._1) == Seq(0, 1), "complete frames only, tail dropped")
    sigs.foreach { case (f, sig) =>
      var want = 0L
      for (j <- 0 until 64)
        if (AudioCodec.sample(id, f * 64L + j) >= 0) want |= 1L << (63 - j)
      assert(sig == want, s"frame $f sign pack")
    }
    assert(AudioCodec.frameSignSigs("not audio".getBytes, 64).isEmpty)
    assert(AudioCodec.frameSignSigs(null, 64).isEmpty)
    intercept[IllegalArgumentException] {
      AudioCodec.frameSignSigs(wav, 65) // can't pack >64 sign bits in a long
    }
  }

  test("volume-shifted re-publication: byte-different payload, identical sign sigs") {
    import spark.implicits._
    val ids = Seq(5L, 12L, 23L)
    val both = Multimodal.synthesizeAudioCorpus(
      (ids ++ ids.map(_ + 100000L)).toDF("doc_id"), "doc_id")
    val payloads = both.collect().map(r => r.getLong(0) ->
      r.getAs[Array[Byte]](1)).toMap
    ids.foreach { id =>
      assert(!java.util.Arrays.equals(payloads(id), payloads(id + 100000L)),
        s"clip $id: the attenuated re-publication must be byte-different")
      // the attenuation really halves: decoded amplitude sum shrinks
      val Some((_, n0, sum0, _, _)) = AudioCodec.decodeWav(payloads(id))
      val Some((_, n1, sum1, _, _)) =
        AudioCodec.decodeWav(payloads(id + 100000L))
      assert(n0 == n1 && sum0 != sum1, s"clip $id: expected a volume change")
    }
    val sigs = Multimodal.audioSignSigs(both)
      .collect().map(r => (r.getLong(0), r.getInt(2)) ->
        (r.getInt(1), r.getLong(3))).toMap
    ids.foreach { id =>
      val nf = 2 + (id % 3).toInt
      (0 until nf).foreach { f =>
        assert(sigs((id, f)) == sigs((id + 100000L, f)),
          s"clip $id frame $f: volume change moved the sign-pattern sig")
      }
    }
    // probe: the re-encode drops (exact aligned equality), a genuinely
    // different clip keeps
    val hist = Multimodal.audioSignSigs(Multimodal.synthesizeAudioCorpus(
        ids.toDF("doc_id"), "doc_id"))
      .select($"id".as("clip_id"), $"n_frames", $"frame_idx", $"sig")
    val batch = Multimodal.audioSignSigs(Multimodal.synthesizeAudioCorpus(
      Seq(100005L, 777L).toDF("doc_id"), "doc_id"))
    val out = Multimodal.audioStoreProbe(batch, hist)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2))).toMap
    assert(out(100005L) == (false, 1L), s"re-encode of 5 must drop: $out")
    assert(out(777L)._1, s"fresh clip must keep: $out")
  }

  test("audioStoreProbe: frame-0 collision without full alignment keeps; frame-count mismatch keeps") {
    import spark.implicits._
    val store = Seq(
      (10L, 2, 0, 111L), (10L, 2, 1, 222L), // history clip: sigs (111, 222)
      (11L, 3, 0, 777L), (11L, 3, 1, 888L), (11L, 3, 2, 999L))
      .toDF("clip_id", "n_frames", "frame_idx", "sig")
    val batch = Seq(
      // frame 0 matches clip 10 but frame 1 differs → must KEEP
      (1L, 2, 0, 111L), (1L, 2, 1, 999L),
      // full sig match with clip 10 → must DROP
      (2L, 2, 0, 111L), (2L, 2, 1, 222L),
      // exact 2-frame PREFIX of 3-frame clip 11: every aligned frame
      // equal, only the frame count differs → must KEEP
      (3L, 2, 0, 777L), (3L, 2, 1, 888L),
      // no frame-0 bucket at all → must KEEP (and never shuffle wide)
      (4L, 2, 0, 555L), (4L, 2, 1, 222L))
      .toDF("id", "n_frames", "frame_idx", "sig")
    val out = Multimodal.audioStoreProbe(batch, store)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2))).toMap
    assert(out(1L)._1, s"partial match must keep: $out")
    assert(out(2L) == (false, 1L), s"exact re-encode must drop: $out")
    assert(out(3L)._1, s"frame-count mismatch must keep: $out")
    assert(out(4L)._1, s"unmatched bucket must keep: $out")
  }
}
