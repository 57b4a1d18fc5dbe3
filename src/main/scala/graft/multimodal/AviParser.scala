package graft.multimodal

/** Pure-JVM decoder for UNCOMPRESSED-DIB AVI — the "true video
  * container" tier of the perceptual-fingerprint family (VERDICT r15
  * Next #2: the temporal vote arm was exercised only via animated-GIF
  * payloads because the sandbox has no codec; an AVI whose video stream
  * is raw bottom-up BGR — fccHandler 'DIB ', biCompression BI_RGB —
  * needs no codec at all, so a real RIFF container can run the
  * container → sampled frames → per-frame dHash → vote chain).
  *
  * Format (public RIFF/AVI layout): `RIFF <sz> AVI ` wrapping a `LIST
  * hdrl` (the `avih` main header, then one `LIST strl` per stream with
  * `strh`/`strf` — for the video stream `strf` is a BITMAPINFOHEADER)
  * and a `LIST movi` whose `00db` chunks each carry one uncompressed
  * frame: bottom-up rows of B,G,R bytes, rows padded to 4-byte
  * boundaries. Chunks are word-aligned (odd sizes pad one byte).
  *
  * Guard discipline mirrors [[GifDecoder.decodeComposedFrames]]
  * byte-for-byte in spirit:
  *   - any malformed mode (bad magic, truncated chunk, non-positive
  *     dimensions, frame byte-size disagreeing with the header
  *     geometry) degrades to None — callers emit decoded=0 / no rows;
  *   - OVERSIZE is the one distinguishable coverage loss: a header
  *     declaring > 2^24 pixels per frame would make the pixel array a
  *     multi-GB allocation whose OutOfMemoryError is not NonFatal —
  *     skipped with a named log line, exactly like the GIF logical-
  *     screen guard;
  *   - compressed streams (biCompression ≠ 0, e.g. MJPG) and
  *     top-down DIBs (negative biHeight) are out of the pure-JVM
  *     tier and return None — a deployment with codecs swaps this
  *     parser's frame decode, not the Spark topology above it.
  */
object AviParser {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** ASCII-strict hex digit test/decode for movi chunk stream numbers
    * ('00db'..'FFdc' — the AVI spec writes stream ids as two hex
    * characters; lowercase tolerated for robustness). */
  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0'
    else if (c <= 'F') c - 'A' + 10
    else c - 'a' + 10

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  private def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI "

  private case class Layout(width: Int, height: Int, mjpeg: Boolean,
                            frames: Seq[(Int, Int)], // (offset, size)
                            // PCM audio stream, when the container
                            // interleaves one: (sampleRate, chunks)
                            audio: Option[(Int, Seq[(Int, Int)])])

  /** biCompression fourcc 'MJPG' as the little-endian u32 it reads as. */
  private val MJPG = ('M'.toLong) | ('J'.toLong << 8) |
    ('P'.toLong << 16) | ('G'.toLong << 24)

  /** Walk the RIFF tree once: BITMAPINFOHEADER geometry out of the
    * VIDEO stream's `strf` (streams are numbered in `hdrl` declaration
    * order — an audio-first AVI keeps its video frames in `01db`/`01dc`
    * chunks, so chunk ids are matched against the video stream's index,
    * never hard-coded `00db`; round-16 review find), frame chunk
    * extents out of `LIST movi`. Both `..db` (uncompressed DIB) and
    * `..dc` (compressed-frame id some writers use even for raw DIB)
    * suffixes are accepted for the video stream — the frame-size check
    * below rejects anything that is not exactly one raw DIB. */
  private def layout(b: Array[Byte]): Option[Layout] = {
    if (!isAvi(b)) return None
    var width = 0; var height = 0; var bitCount = 0; var compression = -1L
    var streamIdx = -1    // strh declaration counter
    var vidStream = -1    // the index of the 'vids' stream
    var audStream = -1    // the index of the 'auds' stream (if any)
    var audFmt = -1; var audRate = 0; var audBits = 0
    // (streamNo, offset, size) of every movi frame chunk; filtered to
    // the video stream once hdrl has been walked (region order is not
    // document order)
    val chunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    // iterative chunk walk over (start, end) regions — RIFF nesting is
    // shallow (hdrl/strl/movi), no recursion needed beyond a worklist.
    // FIFO, so nested lists are visited in DECLARATION order: stream
    // numbering depends on it — a LIFO stack walked 2-stream files'
    // strl lists backwards and assigned the video stream the wrong
    // index (round-16 second review pass)
    val regions = scala.collection.mutable.Queue((12, b.length))
    while (regions.nonEmpty) {
      var (p, end) = regions.dequeue()
      var strhType = "" // the stream type the NEXT strf in this region describes
      while (p + 8 <= end) {
        val id = fourcc(b, p)
        val sz = u32(b, p + 4)
        if (sz < 0 || p + 8 + sz > end) return None // truncated chunk
        val body = p + 8
        id match {
          case "LIST" =>
            if (sz < 4) return None
            val listType = fourcc(b, body)
            // descend into header, movie, and interleave lists (the
            // 'rec ' grouping standard muxers wrap frame chunks in);
            // skip e.g. 'INFO'
            if (listType == "hdrl" || listType == "strl" ||
                listType == "movi" || listType == "rec ")
              regions.enqueue((body + 4, body + sz.toInt))
          case "strh" =>
            if (sz >= 4) {
              strhType = fourcc(b, body)
              streamIdx += 1
              if (strhType == "vids" && vidStream < 0) vidStream = streamIdx
              if (strhType == "auds" && audStream < 0) audStream = streamIdx
            }
          case "strf" if strhType == "auds" && audFmt == -1 =>
            // the AUDIO stream's format chunk (WAVEFORMATEX shape) —
            // PCM-16 is the pure-JVM tier, like the WAV decoder's
            if (sz >= 16) {
              audFmt = u16(b, body)
              audRate = u32(b, body + 4).toInt
              audBits = u16(b, body + 14)
            }
          case "strf" if strhType == "vids" && compression == -1L =>
            // the VIDEO stream's format chunk (BITMAPINFOHEADER shape);
            // an audio strl's strf is WAVEFORMATEX and never matches
            // the preceding-strh guard
            if (sz >= 40) {
              width = u32(b, body + 4).toInt
              height = u32(b, body + 8).toInt
              bitCount = u16(b, body + 14)
              compression = u32(b, body + 16)
            }
          case _ if id.length == 4 && isHex(id(0)) && isHex(id(1)) &&
                    (id.endsWith("db") || id.endsWith("dc") ||
                     id.endsWith("wb")) =>
            // AVI stream numbers are TWO HEX CHARACTERS (ADVICE r16
            // #3: the old two-decimal-digit parse misnumbered or
            // dropped chunks of streams >= 10, and Char.isDigit is
            // Unicode-aware — non-ASCII digit codepoints slipped the
            // guard). ASCII-strict hex, like the spec says. 'wb'
            // chunks are the interleaved audio stream's PCM payload.
            chunks += ((hexVal(id(0)) * 16 + hexVal(id(1)), body, sz.toInt))
          case _ => ()
        }
        p = body + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
      }
    }
    val frames = chunks.collect { case (st, off, sz) if st == vidStream =>
      (off, sz) }
    // PCM-16 only, like WavDecoder: any other audio format reads as "no
    // audio stream" (the video tier guards stay authoritative below)
    val audio =
      if (audStream >= 0 && audFmt == 1 && audBits == 16 && audRate > 0)
        Some((audRate,
          chunks.collect { case (st, off, sz) if st == audStream =>
            (off, sz) }.toSeq))
      else None
    if (compression == -1L || frames.isEmpty) return None
    if (width <= 0 || height == 0) return None // malformed header
    if (height < 0) return None // top-down DIB: outside the raw tier
    if (width.toLong * height > (1L << 24)) {
      log.warn(s"AVI frame ${width}x$height exceeds the 2^24-px decode " +
        "guard — payload skipped (oversized, not malformed)")
      return None
    }
    val mjpeg = compression == MJPG
    if (!mjpeg && (bitCount != 24 || compression != 0L)) {
      // a named skip, like the oversize guard: a compressed AVI whose
      // codec the JVM lacks is COVERAGE LOSS for this tier, not a
      // malformed payload — make it observable. MJPEG is IN the tier:
      // each frame chunk is a complete JPEG the JDK's imageio decodes.
      log.warn(s"AVI video stream needs a codec (biCompression=$compression" +
        s", biBitCount=$bitCount) — payload skipped by the raw-DIB/MJPEG tier")
      return None
    }
    if (!mjpeg) {
      val rowBytes = (3 * width + 3) & ~3
      val frameBytes = rowBytes * height
      // every frame chunk must carry exactly one full DIB — a short or
      // long chunk is a malformed payload, not a partial decode
      if (frames.exists(_._2 != frameBytes)) return None
    }
    Some(Layout(width, height, mjpeg, frames.toSeq, audio))
  }

  /** The interleaved PCM-16 audio stream's samples (sign-extended,
    * channel-interleaved), concatenated across the container's 'wb'
    * chunks in movi order — [[WavDecoder.decodeSamples]]'s contract
    * for the stream INSIDE an A/V container, so one AVI yields both a
    * video fingerprint (frames → dHash → temporal vote) and an audio
    * one (samples → window energies → [[MediaOps.audioHash]]). None
    * when the container has no PCM-16 audio stream or fails any of
    * the video tier's structural guards. */
  def decodeAudioSamples(bytes: Array[Byte]): Option[Array[Int]] =
    layout(bytes).flatMap(_.audio).map { case (_, chunkList) =>
      val total = chunkList.map(_._2 / 2).sum
      val out = new Array[Int](total)
      var o = 0
      chunkList.foreach { case (off, sz) =>
        var i = 0
        val n = sz / 2
        while (i < n) {
          out(o) = (u16(bytes, off + i * 2) << 16) >> 16
          o += 1; i += 1
        }
      }
      out
    }

  /** The [[GifDecoder.decodeComposedFrames]] contract for raw-DIB AVI:
    * one container walk, `choose` receives the frame count and returns
    * the wanted indices, result is (frameCount, index → 0xRRGGBB
    * top-down pixels) — so [[MediaOps.frameDHashWide]] samples either
    * container through one code path. */
  def decodeFrames(bytes: Array[Byte], choose: Int => Set[Int])
      : Option[(Int, Map[Int, BmpDecoder.BmpPixels])] =
    layout(bytes).flatMap { l =>
      val n = l.frames.size
      val want = choose(n).filter(i => i >= 0 && i < n)
      val rowBytes = (3 * l.width + 3) & ~3
      val out = scala.collection.mutable.Map.empty[Int, BmpDecoder.BmpPixels]
      for (i <- want) {
        val (off, sz) = l.frames(i)
        if (l.mjpeg) {
          // each MJPEG chunk is a complete JPEG — the JDK decodes it;
          // a frame whose decoded geometry disagrees with the header
          // is a malformed payload (fail the whole container, like the
          // raw tier's frame-size check)
          val slice = java.util.Arrays.copyOfRange(bytes, off, off + sz)
          ImageIoDecoder.decodePixels(slice) match {
            case Some(p) if p.width == l.width && p.height == l.height =>
              out(i) = p
            case _ => return None
          }
        } else {
          val rgb = new Array[Int](l.width * l.height)
          var y = 0
          while (y < l.height) {
            // bottom-up rows: source row (height-1-y) is output row y
            val src = off + (l.height - 1 - y) * rowBytes
            var x = 0
            while (x < l.width) {
              val o = src + 3 * x
              rgb(y * l.width + x) = (bytes(o) & 0xff) |            // B
                ((bytes(o + 1) & 0xff) << 8) |                      // G
                ((bytes(o + 2) & 0xff) << 16)                       // R
              x += 1
            }
            y += 1
          }
          out(i) = BmpDecoder.BmpPixels(l.width, l.height, rgb)
        }
      }
      Some((n, out.toMap))
    }

  /** Container metadata without decoding pixels — the [[Mp4Parser]]
    * analog for RIFF: (frames, width, height). */
  def probe(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    layout(bytes).map(l => (l.frames.size, l.width, l.height))

  /** ENCODE an MJPEG AVI: per-frame top-down 0xRRGGBB pixels written
    * through the JDK JPEG encoder into '00dc' chunks (fccHandler /
    * biCompression 'MJPG'). Lossy by nature — fixtures that need
    * formula-exact fingerprints must build their pixels with
    * comparison margins wider than the codec's error (see
    * encodeTemporalMjpegKeyed's tie-free gray construction). */
  def encodeMjpeg(width: Int, height: Int,
                  framePixels: Seq[Array[Int]], fps: Int = 10,
                  quality: Float = 0.95f): Array[Byte] = {
    require(width > 0 && height > 0 && framePixels.nonEmpty)
    val jpegs = framePixels.map { px =>
      require(px.length == width * height)
      // grayscale content (r=g=b everywhere) writes as a LUMA-only
      // JPEG: no chroma subsampling in the loop, so the codec error is
      // pure DCT rounding — at quality 1.0 the quantization tables are
      // all ones and the round-trip error stays within a few gray
      // units, far inside the fixture formulas' comparison margins
      val gray = px.forall(v =>
        ((v >> 16) & 0xff) == (v & 0xff) && ((v >> 8) & 0xff) == (v & 0xff))
      val img =
        if (gray) {
          val im = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val r = im.getRaster
          var i = 0
          while (i < px.length) {
            r.setSample(i % width, i / width, 0, px(i) & 0xff); i += 1 }
          im
        } else {
          val im = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          im.setRGB(0, 0, width, height, px, 0, width)
          im
        }
      val writer = javax.imageio.ImageIO.getImageWritersBySuffix("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(quality)
      val bo = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bo)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose(); ios.close()
      bo.toByteArray
    }
    encodeChunks(width, height, jpegs, fps, mjpeg = true)
  }

  /** ENCODE a raw-DIB AVI from per-frame top-down 0xRRGGBB pixels —
    * the fixture writer (deterministic bytes: fixed header fields, no
    * timestamps), kept beside the parser so the two halves of the
    * format stay in one file. */
  def encode(width: Int, height: Int,
             framePixels: Seq[Array[Int]], fps: Int = 10): Array[Byte] = {
    require(width > 0 && height > 0 && framePixels.nonEmpty)
    require(framePixels.forall(_.length == width * height))
    val rowBytes0 = (3 * width + 3) & ~3
    val dibs = framePixels.map { px =>
      val fb = new Array[Byte](rowBytes0 * height)
      var o = 0
      var y = height - 1 // bottom-up
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val v = px(y * width + x)
          fb(o) = (v & 0xff).toByte; fb(o + 1) = ((v >> 8) & 0xff).toByte
          fb(o + 2) = ((v >> 16) & 0xff).toByte
          o += 3; x += 1
        }
        o += rowBytes0 - 3 * width
        y -= 1
      }
      fb
    }
    encodeChunks(width, height, dibs, fps, mjpeg = false)
  }

  /** ENCODE a raw-DIB AVI with an INTERLEAVED PCM-16 mono audio
    * stream: the video frames as [[encode]] writes them, plus an
    * 'auds' strl (WAVEFORMATEX strf) and the samples split evenly
    * into per-frame '01wb' chunks interleaved after each video chunk
    * — the standard muxer layout, so the parser's movi-order chunk
    * concatenation is what reassembles the stream. */
  def encodeWithAudio(width: Int, height: Int,
                      framePixels: Seq[Array[Int]],
                      sampleRate: Int, samples: Array[Short],
                      fps: Int = 10): Array[Byte] = {
    require(width > 0 && height > 0 && framePixels.nonEmpty)
    require(framePixels.forall(_.length == width * height))
    require(sampleRate > 0 && samples.nonEmpty)
    val rowBytes0 = (3 * width + 3) & ~3
    val dibs = framePixels.map { px =>
      val fb = new Array[Byte](rowBytes0 * height)
      var o = 0
      var y = height - 1
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val v = px(y * width + x)
          fb(o) = (v & 0xff).toByte; fb(o + 1) = ((v >> 8) & 0xff).toByte
          fb(o + 2) = ((v >> 16) & 0xff).toByte
          o += 3; x += 1
        }
        o += rowBytes0 - 3 * width
        y -= 1
      }
      fb
    }
    encodeChunks(width, height, dibs, fps, mjpeg = false,
      audio = Some((sampleRate, samples)))
  }

  /** The shared RIFF writer: one video stream, frame payloads supplied
    * pre-encoded (raw bottom-up DIBs or complete JPEGs), optionally an
    * interleaved PCM-16 mono audio stream. */
  private def encodeChunks(width: Int, height: Int,
                           frameBytesSeq: Seq[Array[Byte]], fps: Int,
                           mjpeg: Boolean,
                           audio: Option[(Int, Array[Short])] = None)
      : Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { var i = 0; while (i < 4) {
      bo.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    def tag(s: String): Unit = bo.write(s.getBytes("US-ASCII"))
    val n = frameBytesSeq.size
    val maxFrame = frameBytesSeq.map(_.length).max
    val handler = if (mjpeg) "MJPG" else "DIB "
    val chunkId = if (mjpeg) "00dc" else "00db"
    // audio samples split evenly across frames (last chunk takes the
    // remainder) — the interleave grid
    val audioChunks: Seq[Array[Short]] = audio match {
      case None => Nil
      case Some((_, samp)) =>
        val per = math.max(1, samp.length / n)
        (0 until n).map { i =>
          val lo = math.min(i * per, samp.length)
          val hi = if (i == n - 1) samp.length else math.min(lo + per, samp.length)
          java.util.Arrays.copyOfRange(samp, lo, hi)
        }
    }
    val strlSz = 4 + (8 + 56) + (8 + 40)
    val strlASz = 4 + (8 + 56) + (8 + 16)
    val hdrlSz = 4 + (8 + 56) + (8 + strlSz) +
      (if (audio.isDefined) 8 + strlASz else 0)
    val moviSz = 4 +
      frameBytesSeq.map(f => 8 + f.length + (f.length & 1)).sum +
      audioChunks.map(a => 8 + 2 * a.length).sum
    val riffSz = 4 + (8 + hdrlSz) + (8 + moviSz)
    val nStreams = if (audio.isDefined) 2 else 1
    tag("RIFF"); w32(riffSz); tag("AVI ")
    tag("LIST"); w32(hdrlSz); tag("hdrl")
    tag("avih"); w32(56)
    w32(1000000L / fps); w32(maxFrame.toLong * fps); w32(0); w32(0)
    w32(n); w32(0); w32(nStreams); w32(maxFrame)
    w32(width); w32(height); w32(0); w32(0); w32(0); w32(0)
    tag("LIST"); w32(strlSz); tag("strl")
    tag("strh"); w32(56)
    tag("vids"); tag(handler); w32(0); w16(0); w16(0); w32(0)
    w32(1); w32(fps) // scale, rate
    w32(0); w32(n); w32(maxFrame); w32(0xffffffffL); w32(0)
    w16(0); w16(0); w16(width); w16(height)
    tag("strf"); w32(40)
    w32(40); w32(width); w32(height); w16(1); w16(24)
    if (mjpeg) tag("MJPG") else w32(0)
    w32(maxFrame); w32(0); w32(0); w32(0); w32(0)
    audio.foreach { case (rate, samp) =>
      tag("LIST"); w32(strlASz); tag("strl")
      tag("strh"); w32(56)
      tag("auds"); w32(0); w32(0); w16(0); w16(0); w32(0)
      w32(1); w32(rate) // scale, rate: samples per second
      w32(0); w32(samp.length); w32(2L * samp.length); w32(0xffffffffL)
      w32(2) // sampleSize: bytes per PCM-16 mono sample
      w16(0); w16(0); w16(0); w16(0)
      tag("strf"); w32(16)
      // WAVEFORMATEX: PCM, mono, rate, byte rate, block align, bits
      w16(1); w16(1); w32(rate); w32(2L * rate); w16(2); w16(16)
    }
    tag("LIST"); w32(moviSz); tag("movi")
    frameBytesSeq.zipWithIndex.foreach { case (f, i) =>
      tag(chunkId); w32(f.length)
      bo.write(f)
      if ((f.length & 1) == 1) bo.write(0) // word alignment
      if (audioChunks.nonEmpty) {
        val a = audioChunks(i)
        tag("01wb"); w32(2L * a.length)
        a.foreach(v => w16(v & 0xffff))
      }
    }
    bo.toByteArray
  }
}
