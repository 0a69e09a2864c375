package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

/** REAL audio codec on the JDK's own `javax.sound.sampled` (WAV/PCM — no
  * third-party jar): container/format parsing by AudioSystem, PCM16 sample
  * extraction here. Compressed formats (MP3/AAC/OGG) genuinely have no JDK
  * codec and stay on [[Multimodal.StubCodec]].
  *
  * Determinism: PCM is lossless, so decode(encode(samples)) == samples and
  * the q85 oracle predicts decoded values in closed form. Samples normalize
  * as v/32768.0 — exact in binary (v × 2⁻¹⁵), so window-mean sums are
  * order-independent and bit-exact across engines. */
object AudioWavCodec {

  /** Decode a WAV payload to (sampleRate, samples in [-1,1)). Only PCM_SIGNED
    * 16-bit mono is extracted (the synthesizable, exactly-normalizable case);
    * anything else → None (callers fall back to the stub). */
  /** Magic-byte sniff ('RIFF....WAVE') before the AudioSystem probe — same
    * rationale as [[ImageIoCodec.looksLikeImage]]. */
  def looksLikeWav(c: Array[Byte]): Boolean =
    c != null && c.length >= 12 &&
      c(0) == 'R' && c(1) == 'I' && c(2) == 'F' && c(3) == 'F' &&
      c(8) == 'W' && c(9) == 'A' && c(10) == 'V' && c(11) == 'E'

  def decodePcm16Mono(content: Array[Byte]): Option[(Int, Array[Double])] = {
    if (!looksLikeWav(content)) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(content))
      try {
        val f = in.getFormat
        val ok = f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian
        if (!ok) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            val v = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort
            out(i) = v / 32768.0
            i += 1
          }
          Some((f.getSampleRate.toInt, out))
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Deterministic test tone: PCM16 mono WAV, sample i =
    * ((seed·31 + i) mod 65536) − 32768. The q85 oracle recomputes decoded
    * values from this formula — PCM round-trips it losslessly. */
  def testTone(seed: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val v = ((((seed * 31 + i) % 65536) + 65536) % 65536 - 32768).toShort
      buf.putShort(v)
      i += 1
    }
    buf.array()
  }
}
