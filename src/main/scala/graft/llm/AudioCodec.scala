package graft.llm

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

/** Real audio codec on the pure-JVM `javax.sound.sampled` stack (the
  * WAV/PCM reader ships with the JDK — no native libraries), the audio
  * sibling of [[ImageCodec]].
  *
  * Encode builds a canonical 44-byte RIFF/WAVE header + 16-bit little-
  * endian mono PCM whose samples follow a closed form over (id, i), so a
  * SQL oracle can reproduce the decoded amplitude statistics exactly.
  * Decode goes through `AudioSystem` (format negotiation + frame
  * reading — the real decode path), not a hand parser.
  */
object AudioCodec {

  /** Deterministic PCM fill: sample i of clip `id` is
    * `((id * 31 + i * 7) mod 65536) - 32768` — reproducible as plain
    * integer SQL. */
  def sample(id: Long, i: Long): Int =
    ((((id * 31L + i * 7L) % 65536L) + 65536L) % 65536L - 32768L).toInt

  /** [[sample]] with SILENCE GATING: every `silentEvery`-th block of
    * `blockLen` samples (by global sample index) is zeroed — the
    * speech/silence alternation a VAD front end exists to segment,
    * closed-form so an oracle reproduces every gated value. */
  def gatedSample(id: Long, i: Long, blockLen: Int, silentEvery: Int): Int =
    if ((i / blockLen) % silentEvery == 0) 0 else sample(id, i)

  /** [[encodeWav]] with [[gatedSample]] values — a real RIFF/WAVE payload
    * whose signal alternates voiced and silent blocks. */
  def encodeWavGated(id: Long, n: Int, sampleRate: Int,
      blockLen: Int, silentEvery: Int): Array[Byte] = {
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort(gatedSample(id, i, blockLen, silentEvery).toShort); i += 1
    }
    bb.array()
  }

  /** A real RIFF/WAVE payload: 16-bit LE mono PCM, `n` samples at
    * `sampleRate` Hz, filled by [[sample]]. */
  def encodeWav(id: Long, n: Int, sampleRate: Int = 16000): Array[Byte] = {
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { bb.putShort(sample(id, i).toShort); i += 1 }
    bb.array()
  }

  /** Decode the payload through `AudioSystem` and fold its samples into
    * `(sampleRate, nSamples, ampSum, ampMin, ampMax)`; None for null /
    * corrupt / non-audio payloads. */
  def decodeWav(payload: Array[Byte]): Option[(Int, Long, Long, Int, Int)] = {
    if (payload == null) return None
    val in =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      catch { case _: Throwable => return None }
    try {
      val fmt = in.getFormat
      if (fmt.getChannels != 1 || fmt.getSampleSizeInBits != 16) return None
      val bytes = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(bytes).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      var sum = 0L
      var mn = Int.MaxValue
      var mx = Int.MinValue
      while (bb.remaining() >= 2) {
        val s: Int = bb.getShort
        sum += s
        if (s < mn) mn = s
        if (s > mx) mx = s
      }
      val n = bytes.length / 2
      if (n == 0) Some((fmt.getSampleRate.toInt, 0L, 0L, 0, 0))
      else Some((fmt.getSampleRate.toInt, n.toLong, sum, mn, mx))
    } catch { case _: Throwable => None }
    finally in.close()
  }

  /** Frame-level features from a REAL `AudioSystem` decode: for each
    * COMPLETE `frameLen`-sample window (no overlap, tail dropped) the
    * zero-crossing count (sign flips between in-frame neighbours, sign =
    * `sample >= 0`) and the integer energy `Σ s²` — both integer-exact so
    * a SQL oracle reproduces them from the closed sample form. Returns
    * `(frame_idx, zcr, energy)` per frame; None for corrupt payloads. */
  def frameFeatures(payload: Array[Byte],
      frameLen: Int): Option[Seq[(Int, Int, Long)]] = {
    if (payload == null) return None
    val in =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      catch { case _: Throwable => return None }
    try {
      val fmt = in.getFormat
      if (fmt.getChannels != 1 || fmt.getSampleSizeInBits != 16) return None
      val bytes = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(bytes).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      val nFrames = (bytes.length / 2) / frameLen
      Some((0 until nFrames).map { f =>
        var zcr = 0; var energy = 0L; var prev = 0
        var i = 0
        while (i < frameLen) {
          val s: Int = bb.getShort(2 * (f * frameLen + i))
          energy += s.toLong * s
          if (i > 0 && ((s >= 0) != (prev >= 0))) zcr += 1
          prev = s; i += 1
        }
        (f, zcr, energy)
      })
    } catch { case _: Throwable => None }
    finally in.close()
  }
}
