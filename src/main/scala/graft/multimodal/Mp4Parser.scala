package graft.multimodal

/** Minimal ISO BMFF (MP4/MOV family) container METADATA parser — the
  * "make the video column real without decoding frames" tier: no codec
  * work, just the box tree. Walks ftyp → moov, reads mvhd (timescale +
  * duration), counts trak boxes, and pulls the first visual track's
  * 16.16 fixed-point width/height from its tkhd.
  *
  * Box grammar (ISO/IEC 14496-12): [size:u32][type:4cc][payload],
  * size includes the 8-byte header; size==1 → 64-bit largesize follows;
  * size==0 → box extends to end of input. Full boxes (mvhd/tkhd) start
  * with [version:u8][flags:u24]; v1 widens the time fields to 64 bits.
  *
  * Frame decode stays out of scope (no codec in a JVM-only sandbox) —
  * [[MediaOps.featurize]] uses this for real container metadata and
  * keeps the deterministic stub only for payloads no parser recognizes.
  */
object Mp4Parser {

  case class Mp4Meta(majorBrand: String, timescale: Long, durationMs: Long,
                     nTracks: Int, width: Int, height: Int)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** (type, payloadStart, payloadEnd) for each box in [lo, hi). */
  private def boxes(b: Array[Byte], lo: Int, hi: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var pos = lo
      override def hasNext: Boolean = pos + 8 <= hi
      override def next(): (String, Int, Int) = {
        val size32 = be32(b, pos)
        val tpe = fourcc(b, pos + 4)
        val (payload, end) =
          if (size32 == 0) (pos + 8, hi) // box extends to enclosing scope
          else if (size32 == 1 && pos + 16 <= hi) {
            val large = be64(b, pos + 8)
            (pos + 16, math.min(hi.toLong, pos + large).toInt)
          } else (pos + 8, math.min(hi.toLong, pos + size32).toInt)
        val out = (tpe, payload, end)
        // malformed zero-advance => terminate instead of spinning
        pos = if (end <= pos + 7) hi else end
        out
      }
    }

  def parse(bytes: Array[Byte]): Option[Mp4Meta] = {
    if (bytes.length < 16) return None
    if (be32(bytes, 0) < 16 || fourcc(bytes, 4) != "ftyp") return None
    val majorBrand = fourcc(bytes, 8)
    val moov = boxes(bytes, 0, bytes.length).collectFirst {
      case ("moov", s, e) => (s, e)
    }
    moov.map { case (ms, me) =>
      var timescale = 0L
      var duration = 0L
      var nTracks = 0
      var width = 0
      var height = 0
      boxes(bytes, ms, me).foreach {
        case ("mvhd", s, e) if e - s >= 24 =>
          val v = bytes(s) & 0xff
          if (v == 1 && e - s >= 28 + 8) {
            timescale = be32(bytes, s + 4 + 8 + 8)
            duration = be64(bytes, s + 4 + 8 + 8 + 4)
          } else {
            timescale = be32(bytes, s + 4 + 4 + 4)
            duration = be32(bytes, s + 4 + 4 + 4 + 4)
          }
        case ("trak", s, e) =>
          nTracks += 1
          boxes(bytes, s, e).foreach {
            case ("tkhd", ts, te) =>
              val v = bytes(ts) & 0xff
              // offset of width within the tkhd payload (ISO 14496-12 §8.3.2)
              val wOff = if (v == 1) 4 + 8 + 8 + 4 + 4 + 8 + 8 + 2 + 2 + 2 + 2 + 36
                         else 4 + 4 + 4 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36
              if (te - ts >= wOff + 8 && width == 0) {
                val w = (be32(bytes, ts + wOff) >> 16).toInt // 16.16 fixed
                val h = (be32(bytes, ts + wOff + 4) >> 16).toInt
                if (w > 0 && h > 0) { width = w; height = h }
              }
            case _ =>
          }
        case _ =>
      }
      val durationMs = if (timescale > 0) duration * 1000L / timescale else 0L
      Mp4Meta(majorBrand, timescale, durationMs, nTracks, width, height)
    }
  }
}
