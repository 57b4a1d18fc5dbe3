package graft.multimodal

/** Minimal pure-JVM decoder for RIFF/WAVE PCM-16 audio — the audio
  * counterpart of [[BmpDecoder]] (format layout per the public RIFF/WAVE
  * spec). Anything that isn't PCM 16-bit returns None and the pipeline
  * falls back to the deterministic stub.
  */
object WavDecoder {

  final case class WavClip(sampleRate: Int, channels: Int, nSamples: Int,
                           durationSec: Double, meanAbsAmplitude: Double)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
    ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b.slice(off, off + 4), "US-ASCII")

  def decode(bytes: Array[Byte]): Option[WavClip] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    // walk chunks: need fmt (PCM16) then data
    var off = 12
    var rate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length && (dataOff < 0 || rate == 0)) {
      val id = tag(bytes, off)
      val len = i32(bytes, off + 4)
      if (len < 0 || off + 8 + len > bytes.length) return None
      id match {
        case "fmt " =>
          if (u16(bytes, off + 8) != 1) return None // PCM only
          channels = u16(bytes, off + 10)
          rate = i32(bytes, off + 12)
          bits = u16(bytes, off + 22)
        case "data" =>
          dataOff = off + 8; dataLen = len
        case _ => // skip unknown chunk
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (rate <= 0 || channels <= 0 || bits != 16 || dataOff < 0) return None
    val n = dataLen / 2
    var sum = 0L
    var i = 0
    while (i < n) {
      val s = (u16(bytes, dataOff + i * 2) << 16) >> 16 // sign-extend
      sum += math.abs(s)
      i += 1
    }
    val frames = n / channels
    Some(WavClip(rate, channels, frames,
      frames.toDouble / rate,
      if (n == 0) 0.0 else sum.toDouble / n))
  }

  /** The raw PCM-16 samples (sign-extended, interleaved if multi-
    * channel) — the per-sample access the fingerprinting operator
    * (MediaOps.audioHash) needs; same chunk walk as [[decode]]. */
  def decodeSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var off = 12
    var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length && (dataOff < 0 || rate == 0)) {
      val id = tag(bytes, off)
      val len = i32(bytes, off + 4)
      if (len < 0 || off + 8 + len > bytes.length) return None
      id match {
        case "fmt " =>
          if (u16(bytes, off + 8) != 1) return None
          rate = i32(bytes, off + 12)
          bits = u16(bytes, off + 22)
        case "data" =>
          dataOff = off + 8; dataLen = len
        case _ =>
      }
      off += 8 + len + (len & 1)
    }
    if (rate <= 0 || bits != 16 || dataOff < 0) return None
    val n = dataLen / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = (u16(bytes, dataOff + i * 2) << 16) >> 16
      i += 1
    }
    Some(out)
  }

  /** Build a PCM-16 mono WAV from raw samples (test/demo helper). */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def w16(off: Int, v: Int): Unit = { out(off) = v.toByte; out(off + 1) = (v >> 8).toByte }
    def w32(off: Int, v: Int): Unit = { var i = 0; while (i < 4) { out(off + i) = (v >> (8 * i)).toByte; i += 1 } }
    def wtag(off: Int, s: String): Unit = s.getBytes("US-ASCII").zipWithIndex
      .foreach { case (b, i) => out(off + i) = b }
    wtag(0, "RIFF"); w32(4, 36 + dataLen); wtag(8, "WAVE")
    wtag(12, "fmt "); w32(16, 16); w16(20, 1); w16(22, 1)
    w32(24, sampleRate); w32(28, sampleRate * 2); w16(32, 2); w16(34, 16)
    wtag(36, "data"); w32(40, dataLen)
    samples.zipWithIndex.foreach { case (s, i) => w16(44 + i * 2, s & 0xffff) }
    out
  }
}
