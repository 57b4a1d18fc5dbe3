package graft.multimodal

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import scala.util.control.NonFatal

/** PNG/JPEG decode via the JDK's own `javax.imageio` — pure-JDK, so the
  * multimodal decode path is real for the two dominant crawl-image
  * formats without any external codec. Magic-byte sniffing keeps the
  * parse attempt off payloads that cannot be PNG/JPEG; anything
  * unreadable returns None and the pipeline falls through to the next
  * decoder tier.
  */
object ImageIoDecoder {

  final case class RgbImage(width: Int, height: Int,
                            meanR: Double, meanG: Double, meanB: Double)

  // ImageIO's default scratch cache is a temp FILE per decode — in an
  // executor partition loop that is a disk write per record; keep the
  // scratch in memory instead (JVM-global, idempotent)
  private lazy val noDiskCache: Unit = ImageIO.setUseCache(false)

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  def decode(bytes: Array[Byte]): Option[RgbImage] = {
    if (bytes == null || !(isPng(bytes) || isJpeg(bytes))) return None
    noDiskCache
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff
          sg += (rgb >> 8) & 0xff
          sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val n = img.getWidth.toLong * img.getHeight
      Some(RgbImage(img.getWidth, img.getHeight,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
    } catch { case NonFatal(_) => None }
  }

  /** Full-pixel decode (0xRRGGBB row-major) for consumers that
    * fingerprint rather than summarize — the MJPEG frame path. Same
    * magic gate and NonFatal discipline as [[decode]]; the oversize
    * guard lives in the CALLER (AviParser checks header geometry
    * before any chunk decode). */
  def decodePixels(bytes: Array[Byte]): Option[BmpDecoder.BmpPixels] = {
    if (bytes == null || !(isPng(bytes) || isJpeg(bytes))) return None
    noDiskCache
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
      if (img.getWidth.toLong * img.getHeight > (1L << 24)) return None
      Some(BmpDecoder.BmpPixels(img.getWidth, img.getHeight,
        img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
          .map(_ & 0xffffff)))
    } catch { case NonFatal(_) => None }
  }
}
