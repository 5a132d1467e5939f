package graft

import org.apache.spark.sql.functions._
import graft.llm.{ImageCodec, ImageHeaders, Multimodal}

/** Real-pixel codec roundtrips on the pure-JVM ImageIO stack: the encode →
  * decode cycle must be byte-exact for the lossless formats (PNG/GIF/BMP)
  * so the SQL oracle's closed-form pixel statistics hold; corrupt and
  * non-image payloads must degrade to None / NULL columns, never throw. */
class ImageCodecSpec extends SparkSpec {

  // GIF heights 2-4 are excluded by design: the JDK GIF reader drops rows
  // past the first on those heights (synthesizePixelImages dodges them)
  private val dims = Seq((1, 1), (1, 17), (31, 1), (31, 17), (16, 12), (30, 11))

  private def closedForm(id: Long, w: Int, h: Int): (Long, Int, Int) = {
    var sum = 0L; var mn = 255; var mx = 0
    for (y <- 0 until h; x <- 0 until w) {
      val g = ImageCodec.pixel(id, x, y)
      sum += g; if (g < mn) mn = g; if (g > mx) mx = g
    }
    (sum, mn, mx)
  }

  for (fmt <- Seq("png", "gif", "bmp")) {
    test(s"$fmt encode→decode is pixel-exact against the closed form") {
      for (((w, h), i) <- dims.zipWithIndex) {
        val id = 37L * i + 5
        val bytes = ImageCodec.encode(fmt, id, w, h)
        // the header parser agrees on format and dims
        assert(ImageHeaders.dims(bytes).map(d => (d._1, d._2, d._3))
          == Some((fmt, w, h)))
        val f = ImageCodec.decodeFeatures(bytes).get
        val (sum, mn, mx) = closedForm(id, w, h)
        assert(f.toSeq == Seq(w.toFloat, h.toFloat, (w.toLong * h).toFloat,
          sum.toFloat, mn.toFloat, mx.toFloat),
          s"$fmt ${w}x$h id=$id decoded ${f.toSeq}")
      }
    }
  }

  test("jpeg: real lossy roundtrip — exact dims, pixel mean within DCT tolerance") {
    // the JDK JPEG codec is a REAL encoder/decoder but lossy, so the
    // closed-form oracle pattern (exact px_sum) only fits PNG/GIF/BMP;
    // here we pin what JPEG does guarantee: decodability, exact dims, and
    // a bounded deviation of the decoded mean from the closed form
    for ((w, h) <- Seq((16, 12), (31, 17), (8, 8))) {
      val id = 11L
      val bytes = ImageCodec.encode("jpeg", id, w, h)
      assert(ImageHeaders.dims(bytes).map(d => (d._1, d._2, d._3))
        == Some(("jpeg", w, h)))
      val f = ImageCodec.decodeFeatures(bytes).get
      assert(f(0) == w.toFloat && f(1) == h.toFloat)
      val (sum, _, _) = closedForm(id, w, h)
      val meanDiff = math.abs(f(3) / (w * h) - sum.toFloat / (w * h))
      assert(meanDiff <= 4.0f,
        s"jpeg ${w}x$h decoded mean drifted $meanDiff from the closed form")
    }
  }

  test("corrupt / truncated / non-image payloads decode to None, not throw") {
    assert(ImageCodec.decodeFeatures(null).isEmpty)
    assert(ImageCodec.decodeFeatures(Array.empty[Byte]).isEmpty)
    assert(ImageCodec.decodeFeatures("plain text".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.decodeFeatures(
      ImageCodec.encode("png", 1L, 5, 5).take(20)).isEmpty)
  }

  test("decodePixelStats: real decode distributed over partitions") {
    import spark.implicits._
    val ids = spark.range(0, 60).select($"id".as("doc_id"))
    val imgs = Multimodal.synthesizePixelImages(ids, "doc_id")
    val got = Multimodal.decodePixelStats(imgs).collect()
    assert(got.length == 60)
    got.foreach { r =>
      val id = r.getLong(0)
      val fmt = (id % 3) match { case 0 => "png"; case 1 => "gif"; case _ => "bmp" }
      val w = 1 + (id % 31).toInt
      val h = if (fmt == "gif") 5 + (id % 13).toInt else 1 + (id % 17).toInt
      val (sum, mn, mx) = closedForm(id, w, h)
      assert(r.getString(1) == fmt && r.getInt(2) == w && r.getInt(3) == h
        && r.getLong(4) == sum && r.getInt(5) == mn && r.getInt(6) == mx,
        s"id=$id got $r")
    }
  }

  test("extractFeatures uses real pixel decode for images") {
    import spark.implicits._
    val ids = spark.range(0, 9).select($"id".as("doc_id"))
    val media = Multimodal.synthesizePixelImages(ids, "doc_id")
      .select($"id".as("doc_id"),
        struct($"payload",
          struct(lit("image").as("kind"), lit(1).as("width"), lit(1).as("height"),
            lit(0).as("sample_rate"), lit(0L).as("duration_ms")).as("meta"))
          .as("media"))
    val feats = Multimodal.extractFeatures(spark, media, "doc_id").collect()
    assert(feats.length == 9)
    feats.foreach { r =>
      val id = r.getLong(0)
      val f = r.getSeq[Float](2)
      assert(f.length == ImageCodec.FeatureDim)
      val w = 1 + (id % 31).toInt
      val h = if (id % 3 == 1) 5 + (id % 13).toInt else 1 + (id % 17).toInt
      assert(f(0) == w.toFloat && f(1) == h.toFloat)
      val (sum, _, _) = closedForm(id, w, h)
      assert(f(3) == sum.toFloat)
    }
  }

  test("ahash64: bit-exact vs an independent reference; lossy-stable; guards") {
    // reference recomputation straight from the closed form
    def ref(id: Long, w: Int, h: Int): Long = {
      val cs = new Array[Long](64); val cn = new Array[Long](64)
      var tot = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val c = y * 8 / h * 8 + x * 8 / w
        val v = ImageCodec.pixel(id, x, y)
        cs(c) += v; cn(c) += 1; tot += v
      }
      (0 until 64).foldLeft(0L) { (acc, c) =>
        if (cs(c) * w * h > tot * cn(c)) acc | (1L << (63 - c)) else acc
      }
    }
    for (id <- 0L until 40L) {
      val (w, h) = (8 + (id % 24).toInt, 8 + (id % 12).toInt)
      val png = ImageCodec.ahash64(ImageCodec.encode("png", id, w, h))
      assert(png.contains(ref(id, w, h)), s"id=$id")
      val jpg = ImageCodec.ahash64(ImageCodec.encode("jpeg", id, w, h))
      assert(java.lang.Long.bitCount(png.get ^ jpg.get) <= 10,
        s"jpeg moved the hash too far for id=$id")
    }
    // sub-grid images and garbage refuse quietly
    assert(ImageCodec.ahash64(ImageCodec.encode("png", 1L, 7, 12)).isEmpty)
    assert(ImageCodec.ahash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageCodec.ahash64(null).isEmpty)
  }

  test("ahashNearDupPairs: banded plan equals brute-force all-pairs exactly") {
    import spark.implicits._
    // hashes engineered to span hamming 0..5 and to cross band boundaries:
    // 0x0F ^ 0x0D = 2 bits inside band 0; 0x1000F differs from 0x0F in
    // band 1; 0xF0000000000000F differs across bands 0 and 3
    val hs = Seq(
      1L -> 0x0FL, 2L -> 0x0FL, 3L -> 0x0DL, 4L -> 0x1000FL,
      5L -> 0x0F0000000000000FL, 6L -> 0xFFL, 7L -> -1L,
      8L -> java.lang.Long.MIN_VALUE)
      .toDF("id", "ahash")
    val got = Multimodal.ahashNearDupPairs(hs, maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val raw = hs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, ha) <- raw; (ib, hb) <- raw if ia < ib
      ham = java.lang.Long.bitCount(ha ^ hb) if ham <= 3
    } yield (ia, ib, ham)).toSet
    assert(want.exists(_._3 == 0) && want.exists(_._3 == 2),
      "fixture must exercise several hamming values")
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // NULL hashes drop out instead of matching everything
    val withNull = hs.unionByName(
      Seq((9L, Option.empty[Long])).toDF("id", "ahash"))
    assert(!Multimodal.ahashNearDupPairs(withNull).collect()
      .exists(r => r.getLong(0) == 9L || r.getLong(1) == 9L))
    // the pigeonhole contract is enforced, not assumed
    intercept[IllegalArgumentException] {
      Multimodal.ahashNearDupPairs(hs, maxHamming = 4, bands = 4)
    }
  }

  test("ahashStoreProbe: banded probe equals brute-force batch x history") {
    import spark.implicits._
    val store = Seq(10L -> 0x0FL, 11L -> 0xFF00FFL, 12L -> -1L,
      13L -> java.lang.Long.MIN_VALUE).toDF("img_id", "ahash")
    val batch = Seq(
      1L -> 0x0FL,                  // exact dup of 10 → drop, min_ham 0
      2L -> 0x0DL,                  // 1 bit off 10 → drop at maxHamming 1
      3L -> 0x0F000FL,              // far from everything → keep
      4L -> (-1L ^ 1L),             // 1 bit off 12 → drop
      5L -> 0x7070707070707070L)    // keep
      .toDF("id", "ahash")
    val got = Multimodal.ahashStoreProbe(batch, store, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    val s = store.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = batch.collect().map(r => (r.getLong(0), r.getLong(1))).map {
      case (id, h) =>
        val hams = s.map { case (_, hh) => java.lang.Long.bitCount(h ^ hh) }
          .filter(_ <= 1)
        val n = s.count { case (_, hh) => java.lang.Long.bitCount(h ^ hh) <= 1 }
        (id, hams.isEmpty, n.toLong, if (hams.isEmpty) -1 else hams.min)
    }.toSet
    assert(want.count(!_._2) == 3 && want.count(_._2) == 2)
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    intercept[IllegalArgumentException] {
      Multimodal.ahashStoreProbe(batch, store, maxHamming = 4, bands = 4)
    }
  }
}
