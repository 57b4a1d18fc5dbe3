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

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

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

  private case class FrameMeta(left: Int, top: Int, disposal: String)

  private def frameMeta(reader: javax.imageio.ImageReader, i: Int): FrameMeta =
    try {
      val tree = reader.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
      var left = 0; var top = 0; var disposal = "none"
      val kids = tree.getChildNodes
      var k = 0
      while (k < kids.getLength) {
        val n = kids.item(k)
        n.getNodeName match {
          case "ImageDescriptor" =>
            val a = n.getAttributes
            left = a.getNamedItem("imageLeftPosition").getNodeValue.toInt
            top = a.getNamedItem("imageTopPosition").getNodeValue.toInt
          case "GraphicControlExtension" =>
            disposal = n.getAttributes.getNamedItem("disposalMethod").getNodeValue
          case _ => ()
        }
        k += 1
      }
      FrameMeta(left, top, disposal)
    } catch { case NonFatal(_) => FrameMeta(0, 0, "none") }

  /** ONE-pass COMPOSED decode of selected frames (round-14 review
    * find): real-world GIFs store frames as delta sub-rectangles over a
    * logical canvas — changed-region rasters at an (x, y) offset, with
    * per-frame DISPOSAL (doNotDispose keeps the composite,
    * restoreToBackgroundColor clears the frame's rectangle,
    * restoreToPrevious rolls the canvas back) and transparency holes
    * that show the pixels beneath. Hashing or averaging a raw delta
    * raster fingerprints the changed region, not the displayed frame —
    * a full-frame re-encode of the same video would then disagree at
    * every delta-stored position. This walks the stream ONCE with one
    * reader, composites every frame up to the highest requested index
    * onto an ARGB canvas (alpha-respecting draw at the frame's offset),
    * snapshots the requested indices as 0xRRGGBB pixels, and applies
    * each frame's disposal before the next. `choose` receives the total
    * frame count and returns the wanted indices — so callers sample
    * without a second stream scan. Returns (frameCount, index →
    * composed pixels). */
  def decodeComposedFrames(bytes: Array[Byte],
      choose: Int => Set[Int]): Option[(Int, Map[Int, BmpDecoder.BmpPixels])] = {
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
        val want = choose(n).filter(i => i >= 0 && i < n)
        if (want.isEmpty) return Some((n, Map.empty))
        val f0 = reader.read(0)
        val m0 = frameMeta(reader, 0)
        // canvas = the logical screen; frame-0 extent as the fallback
        var cw = m0.left + f0.getWidth
        var ch = m0.top + f0.getHeight
        try {
          val sm = reader.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
          val kids = sm.getChildNodes
          var k = 0
          while (k < kids.getLength) {
            val node = kids.item(k)
            if (node.getNodeName == "LogicalScreenDescriptor") {
              val a = node.getAttributes
              cw = a.getNamedItem("logicalScreenWidth").getNodeValue.toInt
              ch = a.getNamedItem("logicalScreenHeight").getNodeValue.toInt
            }
            k += 1
          }
        } catch { case NonFatal(_) => () }
        // the logical-screen fields are UNTRUSTED header bytes: a
        // corrupt payload can declare a 30000x30000 screen whose ARGB
        // canvas would be a multi-GB allocation — an OutOfMemoryError
        // there is not NonFatal and would kill the task instead of
        // degrading to None like every other malformed-GIF mode here
        // non-positive dimensions are a MALFORMED header — the silent
        // None every corrupt-payload mode returns; only the oversize
        // case below is distinguishable coverage loss worth a log line
        if (cw <= 0 || ch <= 0) return None
        if (cw.toLong * ch > (1L << 24)) {
          // distinguishable coverage loss, not a malformed payload: a
          // legitimate very large GIF is SKIPPED here (its ARGB canvas
          // would be a multi-GB allocation whose OutOfMemoryError is
          // not NonFatal) — log it by name so fingerprinting coverage
          // loss on large media is observable
          log.warn(s"GIF logical screen ${cw}x$ch exceeds the 2^24-px " +
            "decode guard — payload skipped (oversized, not malformed)")
          return None
        }
        val canvas = new java.awt.image.BufferedImage(
          cw, ch, java.awt.image.BufferedImage.TYPE_INT_ARGB)
        val g = canvas.createGraphics()
        try {
          val out = scala.collection.mutable.Map.empty[Int, BmpDecoder.BmpPixels]
          val maxIdx = want.max
          var i = 0
          while (i <= maxIdx) {
            val img = if (i == 0) f0 else reader.read(i)
            val fm = if (i == 0) m0 else frameMeta(reader, i)
            val prev =
              if (fm.disposal == "restoreToPrevious")
                canvas.getRGB(0, 0, cw, ch, null, 0, cw)
              else null
            g.drawImage(img, fm.left, fm.top, null)
            if (want.contains(i))
              out(i) = BmpDecoder.BmpPixels(cw, ch,
                canvas.getRGB(0, 0, cw, ch, null, 0, cw).map(_ & 0xffffff))
            fm.disposal match {
              case "restoreToBackgroundColor" =>
                val comp = g.getComposite
                g.setComposite(java.awt.AlphaComposite.Clear)
                g.fillRect(fm.left, fm.top, img.getWidth, img.getHeight)
                g.setComposite(comp)
              case "restoreToPrevious" if prev != null =>
                canvas.setRGB(0, 0, cw, ch, prev, 0, cw)
              case _ => ()
            }
            i += 1
          }
          Some((n, out.toMap))
        } finally g.dispose()
      } finally { reader.dispose(); iis.close() }
    } catch { case NonFatal(_) => None }
  }

  /** The COMPOSED pixels of one frame (0xRRGGBB, row-major) — what the
    * perceptual-fingerprint path hashes. One-off form of
    * [[decodeComposedFrames]]; batch callers pass all their indices
    * there instead of calling this per frame. */
  def decodeFramePixels(bytes: Array[Byte], idx: Int): Option[BmpDecoder.BmpPixels] =
    decodeComposedFrames(bytes, _ => Set(idx)).flatMap(_._2.get(idx))

  /** Exact channel means over decoded pixels — ONE accumulation rule
    * for every composed-frame consumer (decodeFrame here,
    * MediaOps.featurizeFrames). */
  private[multimodal] def pixelMeans(p: BmpDecoder.BmpPixels): (Double, Double, Double) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < p.rgb.length) {
      val v = p.rgb(i)
      sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
      i += 1
    }
    val n = p.rgb.length.toDouble
    (sr / n, sg / n, sb / n)
  }

  /** Composed per-frame channel means (for sampled-frame
    * featurization) — same composition rules as the fingerprint path. */
  def decodeFrame(bytes: Array[Byte], idx: Int): Option[ImageIoDecoder.RgbImage] =
    decodeFramePixels(bytes, idx).map { p =>
      val (mr, mg, mb) = pixelMeans(p)
      ImageIoDecoder.RgbImage(p.width, p.height, mr, mg, mb)
    }
}
