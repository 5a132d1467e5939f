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
}
