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

  /** OSCILLATING PCM fill for the near-dup corpus: sample i of clip `id`
    * is `((id·20011 + i·9973 + id·i·37) mod 65536) − 32768`. Unlike
    * [[sample]] (whose slow `7i` stride keeps small-id clips entirely
    * non-negative — a DEGENERATE all-ones sign pattern), the large strides
    * wrap the 16-bit range every few samples and the `id·i` cross term
    * makes the per-sample phase difference between two clips itself vary
    * with i, so distinct clips disagree on some sample's sign with
    * overwhelming probability (each sample is a quasi-independent coin
    * flip — no linear resonance like `Δid·k ≡ 0 (mod 65536)` can align two
    * whole clips). Still plain integer SQL. */
  def oscSample(id: Long, i: Long): Int =
    ((((id * 20011L + i * 9973L + id * i * 37L) % 65536L) + 65536L) % 65536L
      - 32768L).toInt

  /** A real RIFF/WAVE payload over the [[oscSample]] fill with every
    * sample ARITHMETICALLY right-shifted by `shift` bits — a
    * volume-attenuated RE-PUBLICATION of clip `id`: the payload bytes
    * differ (every nonzero sample moves) while the SIGN of every sample
    * is preserved exactly (`>>` keeps the sign bit; `s/2` would flip
    * `-1 → 0`), so any amplitude-scale-invariant fingerprint of the
    * re-encode equals the original's. The audio analog of
    * [[VideoCodec]]'s lossless container transcode. */
  def encodeWavOscShifted(id: Long, n: Int, sampleRate: Int,
      shift: Int): Array[Byte] = {
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
    while (i < n) { bb.putShort((oscSample(id, i) >> shift).toShort); i += 1 }
    bb.array()
  }

  /** Per-frame SIGN-PATTERN fingerprints from a REAL `AudioSystem` decode —
    * the audio dedup primitive: for each COMPLETE `frameLen`-sample window
    * (no overlap, tail dropped; `frameLen` ≤ 64) one long whose bit
    * `63 - j` is set iff in-frame sample `j` is non-negative. The sign
    * pattern is the basis of the zero-crossing rate and is INVARIANT under
    * positive amplitude scaling (volume change / attenuation re-encodes),
    * while remaining integer-exact for a SQL oracle. Returns
    * `(frame_idx, sig)` per frame; None for null / corrupt / non-PCM-16
    * payloads. */
  def frameSignSigs(payload: Array[Byte],
      frameLen: Int): Option[Seq[(Int, Long)]] = {
    require(frameLen >= 1 && frameLen <= 64,
      s"sign pack needs 1..64 samples per frame, got $frameLen")
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
        var sig = 0L
        var j = 0
        while (j < frameLen) {
          if (bb.getShort(2 * (f * frameLen + j)) >= 0)
            sig |= 1L << (63 - j)
          j += 1
        }
        (f, sig)
      })
    } catch { case _: Throwable => None }
    finally in.close()
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
