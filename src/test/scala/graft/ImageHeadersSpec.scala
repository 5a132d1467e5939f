package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.ImageHeaders

/** Header codec round-trips: dims written into real byte structure must
  * parse back out, for every format and awkward dimension; garbage and
  * truncation yield None, never throw. */
class ImageHeadersSpec extends AnyFunSuite {

  private val cases = Seq((1, 1), (17, 31), (255, 1), (256, 257), (1920, 1080))

  test("PNG round-trip") {
    cases.foreach { case (w, h) =>
      assert(ImageHeaders.dims(ImageHeaders.png(w, h)) == Some(("png", w, h)))
    }
  }

  test("JPEG round-trip (dims live past APP0 in SOF0)") {
    cases.foreach { case (w, h) =>
      assert(ImageHeaders.dims(ImageHeaders.jpeg(w, h)) == Some(("jpeg", w, h)))
    }
  }

  test("GIF round-trip") {
    cases.foreach { case (w, h) =>
      assert(ImageHeaders.dims(ImageHeaders.gif(w, h)) == Some(("gif", w, h)))
    }
  }

  test("BMP round-trip (incl. top-down negative height)") {
    cases.foreach { case (w, h) =>
      assert(ImageHeaders.dims(ImageHeaders.bmp(w, h)) == Some(("bmp", w, h)))
    }
    // top-down BMPs store negative height; magnitude is the pixel height
    assert(ImageHeaders.dims(ImageHeaders.bmp(10, -20)) == Some(("bmp", 10, 20)))
  }

  test("PNG IDAT inflates to the declared scanline bytes") {
    val b = ImageHeaders.png(5, 3)
    // find IDAT chunk and inflate it: (w+1)*h filter+pixel bytes
    val idx = b.sliding(4).indexWhere(_.sameElements("IDAT".getBytes))
    assert(idx > 0)
    val len = java.nio.ByteBuffer.wrap(b, idx - 4, 4).getInt
    val inf = new java.util.zip.Inflater()
    inf.setInput(b, idx + 4, len)
    val out = new Array[Byte](1024)
    val n = inf.inflate(out)
    inf.end()
    assert(n == (5 + 1) * 3)
  }

  test("garbage, truncation, and null payloads yield None, never throw") {
    assert(ImageHeaders.dims(null).isEmpty)
    assert(ImageHeaders.dims(Array.empty[Byte]).isEmpty)
    assert(ImageHeaders.dims("not an image at all".getBytes).isEmpty)
    Seq(ImageHeaders.png(9, 9), ImageHeaders.jpeg(9, 9), ImageHeaders.gif(9, 9),
        ImageHeaders.bmp(9, 9)).foreach { full =>
      (1 until math.min(full.length, 12)).foreach { k =>
        ImageHeaders.dims(full.take(k)) // must not throw
      }
    }
    // JPEG whose marker stream desynchronizes mid-way
    val broken = ImageHeaders.jpeg(9, 9)
    broken(2) = 0x00
    assert(ImageHeaders.dims(broken).isEmpty)
  }

  test("JPEG with legal 0xFF fill bytes between markers still parses") {
    val base = ImageHeaders.jpeg(33, 44)
    // inject two fill bytes before the APP0 marker id (T.81 B.1.1.2)
    val filled = base.take(2) ++ Array(0xff.toByte, 0xff.toByte) ++ base.drop(2)
    assert(ImageHeaders.dims(filled) == Some(("jpeg", 33, 44)))
  }
}
