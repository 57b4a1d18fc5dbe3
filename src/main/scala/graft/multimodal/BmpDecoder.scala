package graft.multimodal

/** Minimal pure-JVM decoder for uncompressed 24-bit BMP images — makes
  * the multimodal decode path REAL for at least one format without any
  * external codec (format layout per the public Windows BITMAPINFOHEADER
  * spec). Anything that isn't a 24bpp/BI_RGB BMP returns None and the
  * pipeline falls back to the deterministic stub.
  */
object BmpDecoder {

  final case class BmpImage(width: Int, height: Int,
                            meanR: Double, meanG: Double, meanB: Double)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
    ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  def decode(bytes: Array[Byte]): Option[BmpImage] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = i32(bytes, 10)
    val width = i32(bytes, 18)
    val height = i32(bytes, 22) // positive = bottom-up (the common case)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    if (bpp != 24 || compression != 0 || width <= 0 || height == 0) return None
    val rows = math.abs(height)
    val stride = ((width * 3 + 3) / 4) * 4
    if (dataOffset.toLong + stride.toLong * rows > bytes.length) return None
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < rows) {
      var x = 0
      val rowOff = dataOffset + y * stride
      while (x < width) {
        val p = rowOff + x * 3
        sb += bytes(p) & 0xff
        sg += bytes(p + 1) & 0xff
        sr += bytes(p + 2) & 0xff
        x += 1
      }
      y += 1
    }
    val n = width.toLong * rows
    Some(BmpImage(width, rows, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  }

  final case class BmpPixels(width: Int, height: Int, rgb: Array[Int])

  /** Full pixel decode (top-down row-major, packed 0xRRGGBB) — the
    * resample path needs individual pixels, not the means [[decode]]
    * folds to. Same format gate: 24bpp BI_RGB only, else None.
    */
  def decodePixels(bytes: Array[Byte]): Option[BmpPixels] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = i32(bytes, 10)
    val width = i32(bytes, 18)
    val height = i32(bytes, 22)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    if (bpp != 24 || compression != 0 || width <= 0 || height == 0) return None
    val rows = math.abs(height)
    val stride = ((width * 3 + 3) / 4) * 4
    if (dataOffset.toLong + stride.toLong * rows > bytes.length) return None
    val px = new Array[Int](width * rows)
    var y = 0
    while (y < rows) {
      val rowOff = dataOffset + y * stride
      // positive height = bottom-up storage; negative = top-down
      val destRow = if (height < 0) y else rows - 1 - y
      var x = 0
      while (x < width) {
        val p = rowOff + x * 3
        px(destRow * width + x) =
          ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 1) & 0xff) << 8) |
          (bytes(p) & 0xff)
        x += 1
      }
      y += 1
    }
    Some(BmpPixels(width, rows, px))
  }

  /** Build an uncompressed 24-bit BMP from row-major RGB pixels
    * (top-down input; stored bottom-up per the format). Test/demo helper.
    */
  def encode(width: Int, height: Int, rgb: Array[(Int, Int, Int)]): Array[Byte] = {
    require(rgb.length == width * height)
    val stride = ((width * 3 + 3) / 4) * 4
    val dataSize = stride * height
    val out = new Array[Byte](54 + dataSize)
    def w16(off: Int, v: Int): Unit = { out(off) = v.toByte; out(off + 1) = (v >> 8).toByte }
    def w32(off: Int, v: Int): Unit = { var i = 0; while (i < 4) { out(off + i) = (v >> (8 * i)).toByte; i += 1 } }
    out(0) = 'B'; out(1) = 'M'
    w32(2, out.length); w32(10, 54)
    w32(14, 40); w32(18, width); w32(22, height)
    w16(26, 1); w16(28, 24); w32(30, 0); w32(34, dataSize)
    var y = 0
    while (y < height) {
      var x = 0
      val srcRow = height - 1 - y // bottom-up storage
      while (x < width) {
        val (r, g, b) = rgb(srcRow * width + x)
        val p = 54 + y * stride + x * 3
        out(p) = b.toByte; out(p + 1) = g.toByte; out(p + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }
}
