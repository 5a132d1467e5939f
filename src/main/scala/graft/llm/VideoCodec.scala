package graft.llm

import java.io.{ByteArrayOutputStream, DataOutputStream}

/** Real frame-level video codec over a PUBLIC MJPEG-style container: since
  * the JDK ships no video bitstream decoder, the engine defines an open
  * concatenated-frame format — magic + frame count + fps, then
  * length-prefixed COMPLETE still images (PNG/BMP, any `javax.imageio`
  * format works) — the exact structure motion-JPEG uses, minus the AVI
  * wrapper. Every frame is REALLY encoded and REALLY decoded through
  * `ImageIO`; nothing about the frame path is synthetic.
  *
  * Layout (all integers big-endian):
  * {{{
  *   bytes 0-3   magic 'G' 'F' 'V' '1'
  *   bytes 4-7   u32 frame count
  *   bytes 8-11  u32 frames per second
  *   repeated:   u32 frame byte length, then that many bytes (a complete
  *               still image parseable by ImageIO / [[ImageHeaders]])
  * }}}
  */
object VideoCodec {

  private val Magic = Array[Byte]('G', 'F', 'V', '1')

  /** A real GFV1 clip: `nFrames` genuine w×h grayscale stills (PNG for
    * even `id + frame`, BMP for odd — both lossless), frame `f` filled by
    * [[ImageCodec.pixel]] with seed `id + 97*f`, so a SQL oracle
    * reproduces every decoded pixel statistic of every frame. */
  def encode(id: Long, nFrames: Int, fps: Int, w: Int, h: Int): Array[Byte] = {
    require(nFrames >= 0, s"bad clip shape: $nFrames frames")
    encodeFrames((0 until nFrames).map { f =>
      val fmt = if ((id + f) % 2 == 0) "png" else "bmp"
      ImageCodec.encode(fmt, id + 97L * f, w, h)
    }, fps)
  }

  /** A GFV1 container from pre-encoded stills — the general entry
    * [[encode]] derives its closed-form clips through, and what a
    * re-encode pipeline uses to wrap transcoded frames. */
  def encodeFrames(frames: Seq[Array[Byte]], fps: Int): Array[Byte] = {
    require(fps > 0, s"bad clip shape: $fps fps")
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    dos.write(Magic)
    dos.writeInt(frames.length)
    dos.writeInt(fps)
    frames.foreach { frame =>
      dos.writeInt(frame.length)
      dos.write(frame)
    }
    dos.flush()
    out.toByteArray
  }

  /** Parse a GFV1 container into (fps, frame byte arrays). None for null /
    * corrupt / non-GFV1 payloads — truncated frame tables, lying counts and
    * overlong lengths all degrade to None, never throw (corrupt members are
    * the norm in crawled media). The frames are NOT pixel-decoded here;
    * callers run `ImageIO` per frame ([[ImageCodec.decodeFeatures]]). */
  def decode(payload: Array[Byte]): Option[(Int, Array[Array[Byte]])] = {
    if (payload == null || payload.length < 12) return None
    var i = 0
    while (i < 4) { if (payload(i) != Magic(i)) return None; i += 1 }
    def u32(off: Int): Long =
      ((payload(off) & 0xffL) << 24) | ((payload(off + 1) & 0xffL) << 16) |
        ((payload(off + 2) & 0xffL) << 8) | (payload(off + 3) & 0xffL)
    val n = u32(4)
    val fps = u32(8)
    // bound the claimed frame count by what the payload could possibly
    // hold (4 length bytes per frame minimum) BEFORE allocating — a
    // hostile 12-byte payload claiming 2^31 frames must degrade to None,
    // not OOM the executor on the frame-array allocation
    if (n > (payload.length - 12) / 4 || fps <= 0 || fps > Int.MaxValue)
      return None
    val frames = new Array[Array[Byte]](n.toInt)
    var off = 12
    var f = 0
    while (f < n) {
      if (off + 4 > payload.length) return None
      val len = u32(off)
      off += 4
      if (len > payload.length - off) return None
      frames(f) = java.util.Arrays.copyOfRange(payload, off, off + len.toInt)
      off += len.toInt
      f += 1
    }
    if (off != payload.length) return None // trailing garbage: not a clean clip
    Some((fps.toInt, frames))
  }
}
