package graft.multimodal

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import scala.util.control.NonFatal

/** Animated-GIF decode via the JDK's ImageIO sequence reader — the
  * "video" modality for real: multi-frame payloads get a frame count and
  * per-frame pixel access with no external codec. (True video containers
  * still need an external library; GIF covers the animated-media shape —
  * frame iteration, per-frame features, sampling.)
  */
object GifDecoder {

  final case class GifAnim(width: Int, height: Int, frames: Int,
                           meanR: Double, meanG: Double, meanB: Double)

  private def isGif(b: Array[Byte]): Boolean =
    b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

  private def means(img: java.awt.image.BufferedImage): (Double, Double, Double) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = img.getWidth.toLong * img.getHeight
    (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** Frame count + first-frame stats (one decode, not all frames). */
  def decode(bytes: Array[Byte]): Option[GifAnim] = {
    if (bytes == null || !isGif(bytes)) return None
    try {
      val readers = ImageIO.getImageReadersBySuffix("gif")
      if (!readers.hasNext) return None
      val reader = readers.next()
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        if (n <= 0) return None
        val first = reader.read(0)
        val (mr, mg, mb) = means(first)
        Some(GifAnim(first.getWidth, first.getHeight, n, mr, mg, mb))
      } finally { reader.dispose(); iis.close() }
    } catch { case NonFatal(_) => None }
  }

  /** Decode one specific frame to raw pixels (0xRRGGBB ints, row-major)
    * — what the perceptual-fingerprint path (MediaOps.frameDHash) hashes;
    * same chunk walk as [[decodeFrame]], pixels instead of means. */
  def decodeFramePixels(bytes: Array[Byte], idx: Int): Option[BmpDecoder.BmpPixels] = {
    if (bytes == null || !isGif(bytes)) return None
    try {
      val readers = ImageIO.getImageReadersBySuffix("gif")
      if (!readers.hasNext) return None
      val reader = readers.next()
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        if (idx < 0 || idx >= reader.getNumImages(true)) return None
        val img = reader.read(idx)
        val w = img.getWidth; val h = img.getHeight
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xffffff; x += 1 }
          y += 1
        }
        Some(BmpDecoder.BmpPixels(w, h, px))
      } finally { reader.dispose(); iis.close() }
    } catch { case NonFatal(_) => None }
  }

  /** Decode one specific frame (for sampled-frame featurization). */
  def decodeFrame(bytes: Array[Byte], idx: Int): Option[ImageIoDecoder.RgbImage] = {
    if (bytes == null || !isGif(bytes)) return None
    try {
      val readers = ImageIO.getImageReadersBySuffix("gif")
      if (!readers.hasNext) return None
      val reader = readers.next()
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        if (idx < 0 || idx >= reader.getNumImages(true)) return None
        val img = reader.read(idx)
        val (mr, mg, mb) = means(img)
        Some(ImageIoDecoder.RgbImage(img.getWidth, img.getHeight, mr, mg, mb))
      } finally { reader.dispose(); iis.close() }
    } catch { case NonFatal(_) => None }
  }
}
