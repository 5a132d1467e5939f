package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real pixel codec on the pure-JVM `javax.imageio` stack (the PNG / JPEG /
  * GIF / BMP readers and writers ship with the JDK — no native libraries).
  *
  * Encode builds an actual grayscale image whose pixel values follow a
  * closed form over (image id, x, y), so a SQL oracle can reproduce the
  * decoded pixel statistics exactly for the lossless formats. Decode reads
  * real pixels back and folds them into a fixed feature vector.
  */
object ImageCodec {

  // stream-backed (in-memory) ImageIO, not disk-scratch-file-backed: at
  // scale every executor thread decodes thousands of payloads and the
  // default file cache turns each into a temp-file create/delete
  ImageIO.setUseCache(false)

  /** Deterministic grayscale fill: pixel (x,y) of image `id` is
    * `(id + 7x + 13y) mod 256` — reproducible as plain integer SQL. */
  def pixel(id: Long, x: Int, y: Int): Int =
    (((id + 7L * x + 13L * y) % 256L + 256L) % 256L).toInt

  /** A real `format` image (`"png" | "jpeg" | "gif" | "bmp"`), w×h, 8-bit
    * grayscale, filled by [[pixel]]. */
  def encode(format: String, id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(id, x, y)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, out), s"no ImageIO writer for $format")
    out.toByteArray
  }

  /** Number of entries in [[decodeFeatures]]' vector. */
  val FeatureDim = 6

  /** Decode the payload and fold its pixels into
    * `[width, height, n_pixels, pix_sum, pix_min, pix_max]` (all
    * integer-valued, hence float-exact for images ≤ ~64k px · 255).
    * None for null / corrupt / non-image payloads.
    *
    * Gray rasters are read via `getSample` — `getRGB` on TYPE_BYTE_GRAY
    * passes through a linear-gray→sRGB color conversion that gamma-shifts
    * the values; palette/RGB rasters take the exact blue channel. */
  def decodeFeatures(payload: Array[Byte]): Option[Array[Float]] = {
    if (payload == null) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case _: Throwable => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val gray = img.getType == BufferedImage.TYPE_BYTE_GRAY
    val raster = img.getRaster
    var sum = 0L
    var mn = 255
    var mx = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g =
          if (gray) raster.getSample(x, y, 0)
          else img.getRGB(x, y) & 0xff
        sum += g
        if (g < mn) mn = g
        if (g > mx) mx = g
        x += 1
      }
      y += 1
    }
    Some(Array(w.toFloat, h.toFloat, (w.toLong * h).toFloat, sum.toFloat,
      mn.toFloat, mx.toFloat))
  }

  /** 64-bit average hash (aHash) of a decoded payload: the image folds
    * into an 8×8 grid (pixel x lands in cell `x*8/w` — integer division,
    * the standard near-equal block split), and bit `63 − (by·8 + bx)` is
    * set iff the cell's mean exceeds the global mean. The comparison is
    * cross-multiplied (`cell_sum · n_pixels > total_sum · cell_n`) so the
    * hash is INTEGER-EXACT — a SQL oracle reproduces it from a closed-form
    * raster with no float in sight. None for null / corrupt / non-image
    * payloads and for images smaller than the 8×8 grid. */
  def ahash64(payload: Array[Byte]): Option[Long] = {
    if (payload == null) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case _: Throwable => null }
    if (img == null || img.getWidth < 8 || img.getHeight < 8) return None
    val w = img.getWidth
    val h = img.getHeight
    val gray = img.getType == BufferedImage.TYPE_BYTE_GRAY
    val raster = img.getRaster
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val g =
          if (gray) raster.getSample(x, y, 0)
          else img.getRGB(x, y) & 0xff
        val c = by * 8 + x * 8 / w
        cellSum(c) += g
        cellN(c) += 1
        total += g
        x += 1
      }
      y += 1
    }
    val nPix = w.toLong * h
    var hash = 0L
    var c = 0
    while (c < 64) {
      // 128-bit exact compare: cellSum·nPix can pass 2^63 for images over
      // ~190 Mpixel (255·nPix² > Long.MaxValue), which would silently flip
      // bits on giant panoramas. multiplyHigh is a JIT intrinsic, so the
      // guard costs nothing at normal sizes and the result is identical.
      val hiL = Math.multiplyHigh(cellSum(c), nPix)
      val loL = cellSum(c) * nPix
      val hiR = Math.multiplyHigh(total, cellN(c))
      val loR = total * cellN(c)
      val gt = hiL > hiR ||
        (hiL == hiR && java.lang.Long.compareUnsigned(loL, loR) > 0)
      if (gt) hash |= 1L << (63 - c)
      c += 1
    }
    Some(hash)
  }
}
