package graft

import graft.multimodal.{BmpDecoder, MediaOps, WavDecoder}

class MediaSpec extends SparkSpec {

  test("featurize runs partition-batched and is deterministic") {
    val media = MediaOps.syntheticMedia(spark, 30).repartition(4)
    val feats = MediaOps.featurize(media).collect().sortBy(_.media_id)
    assert(feats.length == 30)
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(f => f.width >= 16 && f.height >= 16))
    // determinism across runs (stub decode is pure)
    val again = MediaOps.featurize(MediaOps.syntheticMedia(spark, 30)).collect()
      .sortBy(_.media_id)
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
    // kinds preserved through the binary pipeline
    assert(feats.map(_.kind).distinct.sorted.toSeq == Seq("audio", "image", "video"))
  }

  test("real BMP decode: dimensions and channel means are exact") {
    import graft.multimodal.{BmpDecoder, MediaOps}
    import MediaOps.{MediaMeta, MediaRecord}
    import spark.implicits._
    // 4x2 image: top row solid red, bottom row solid blue
    val px = Array.fill(4)((255, 0, 0)) ++ Array.fill(4)((0, 0, 255))
    val bmp = BmpDecoder.encode(4, 2, px)
    val ds = Seq(MediaRecord(42L, MediaMeta("image", 4, 2, 0), bmp)).toDS()
    val f = MediaOps.featurize(ds).collect()(0)
    assert(f.width == 4 && f.height == 2)
    assert(f.feature(0) == 0.5f && f.feature(1) == 0.0f && f.feature(2) == 0.5f)
    assert(f.feature(7) == 1f) // real-decode marker
    // non-BMP payload falls back to the stub path
    val stub = MediaOps.featurize(
      Seq(MediaRecord(7L, MediaMeta("image", 0, 0, 0), Array[Byte](1, 2, 3, 4))).toDS()
    ).collect()(0)
    assert(stub.width >= 16) // stub-derived pseudo dims
  }

  test("real WAV decode: rate, duration, mean amplitude are exact") {
    import graft.multimodal.{MediaOps, WavDecoder}
    import MediaOps.{MediaMeta, MediaRecord}
    import spark.implicits._
    // 8 samples at 8000 Hz: alternating +/-1000 -> meanAbs 1000, 1 ms
    val samples = Array.tabulate[Short](8)(i => if (i % 2 == 0) 1000 else -1000)
    val wav = WavDecoder.encode(8000, samples)
    val ds = Seq(MediaRecord(9L, MediaMeta("audio", 0, 0, 8000), wav)).toDS()
    val f = MediaOps.featurize(ds).collect()(0)
    assert(f.width == 8000)               // sampleRate rides the width slot
    assert(f.feature(7) == 2f)            // wav-decode marker
    assert(math.abs(f.feature(0) - 1000f / 32768f) < 1e-6)
    assert(math.abs(f.feature(1) - 0.001f) < 1e-6) // 8 samples / 8 kHz
  }

  test("WavDecoder rejects malformed and non-PCM16 input") {
    import graft.multimodal.WavDecoder
    assert(WavDecoder.decode(Array[Byte](1, 2, 3)).isEmpty)
    val valid = WavDecoder.encode(16000, Array[Short](1, 2, 3, 4))
    assert(WavDecoder.decode(valid).nonEmpty)
    val badBits = valid.clone(); badBits(34) = 8 // 8-bit
    assert(WavDecoder.decode(badBits).isEmpty)
    val notRiff = valid.clone(); notRiff(0) = 'X'
    assert(WavDecoder.decode(notRiff).isEmpty)
  }

  test("BmpDecoder rejects malformed and non-24bpp input") {
    import graft.multimodal.BmpDecoder
    assert(BmpDecoder.decode(Array[Byte](1, 2, 3)).isEmpty)
    val valid = BmpDecoder.encode(2, 2, Array.fill(4)((1, 2, 3)))
    assert(BmpDecoder.decode(valid).nonEmpty)
    val truncated = valid.take(60)
    assert(BmpDecoder.decode(truncated).isEmpty)
    val badBpp = valid.clone(); badBpp(28) = 8
    assert(BmpDecoder.decode(badBpp).isEmpty)
  }

  private def encodeImage(format: String, w: Int, h: Int,
                          rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out))
    out.toByteArray
  }

  test("real PNG decode via javax.imageio: dims and channel means exact") {
    import graft.multimodal.{ImageIoDecoder, MediaOps}
    import MediaOps.{MediaMeta, MediaRecord}
    import spark.implicits._
    // 10x4: left half solid (200,100,50), right half solid (0,100,250)
    val png = encodeImage("png", 10, 4,
      (x, _) => if (x < 5) (200, 100, 50) else (0, 100, 250))
    assert(png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    val direct = ImageIoDecoder.decode(png).get
    assert(direct.width == 10 && direct.height == 4)
    assert(direct.meanR == 100.0 && direct.meanG == 100.0 && direct.meanB == 150.0)
    // and through the distributed featurize path
    val f = MediaOps.featurize(
      Seq(MediaRecord(11L, MediaMeta("image", 10, 4, 0), png)).toDS()).collect()(0)
    assert(f.width == 10 && f.height == 4)
    assert(f.feature(7) == 1f) // image-decode marker, not the stub
    assert(math.abs(f.feature(0) - 100f / 255f) < 1e-6)
    assert(math.abs(f.feature(2) - 150f / 255f) < 1e-6)
  }

  test("real JPEG decode via javax.imageio: solid color survives lossy roundtrip") {
    import graft.multimodal.{ImageIoDecoder, MediaOps}
    import MediaOps.{MediaMeta, MediaRecord}
    import spark.implicits._
    val jpg = encodeImage("jpg", 16, 16, (_, _) => (120, 60, 30))
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    val direct = ImageIoDecoder.decode(jpg).get
    assert(direct.width == 16 && direct.height == 16)
    // JPEG is lossy: solid color comes back within a couple of levels
    assert(math.abs(direct.meanR - 120.0) <= 3.0, direct)
    assert(math.abs(direct.meanG - 60.0) <= 3.0, direct)
    assert(math.abs(direct.meanB - 30.0) <= 3.0, direct)
    val f = MediaOps.featurize(
      Seq(MediaRecord(12L, MediaMeta("image", 16, 16, 0), jpg)).toDS()).collect()(0)
    assert(f.width == 16 && f.feature(7) == 1f)
  }

  private def encodeGif(frames: Seq[(Int, Int, Int)], w: Int, h: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO}
    val writer = ImageIO.getImageWritersBySuffix("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { case (r, g, b) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (r << 16) | (g << 8) | b)
      writer.writeToSequence(new IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    out.toByteArray
  }

  test("animated GIF decode: frame count and sampled per-frame means are real") {
    import graft.multimodal.{GifDecoder, MediaOps}
    import MediaOps.{MediaMeta, MediaRecord}
    import spark.implicits._
    // 3 solid frames: red, green, blue (pure colors survive the palette)
    val gif = encodeGif(Seq((255, 0, 0), (0, 255, 0), (0, 0, 255)), 6, 4)
    assert(new String(gif.take(4), "ASCII").startsWith("GIF8"))

    val anim = GifDecoder.decode(gif).get
    assert(anim.width == 6 && anim.height == 4 && anim.frames == 3)
    assert(anim.meanR == 255.0 && anim.meanG == 0.0 && anim.meanB == 0.0)

    // featurize path: marker 3, frame count in slot 5
    val ds = Seq(MediaRecord(21L, MediaMeta("video", 6, 4, 0), gif)).toDS()
    val f = MediaOps.featurize(ds).collect()(0)
    assert(f.feature(7) == 3f && f.feature(5) == 3f)
    assert(f.width == 6 && f.height == 4)

    // sampled-frame featurization decodes each frame's true colors
    val frames = MediaOps.featurizeFrames(ds, maxFrames = 3)
      .collect().sortBy(_._2)
    assert(frames.length == 3)
    assert(frames.map(_._2).toSeq == Seq(0, 1, 2))
    assert(frames(0)._5 == 255f && frames(0)._6 == 0f)   // red frame
    assert(frames(1)._6 == 255f)                         // green frame
    assert(frames(2)._7 == 255f)                         // blue frame
    // SUBSAMPLING (maxFrames < frame count): evenly-spaced indices
    // keep the endpoints — 2 of 3 samples frames 0 and 2, skipping 1
    val sub = MediaOps.featurizeFrames(ds, maxFrames = 2)
      .collect().sortBy(_._2)
    assert(sub.map(_._2).toSeq == Seq(0, 2))
    assert(sub(0)._5 == 255f && sub(1)._7 == 255f)       // red, blue
    // non-animated payloads contribute no frame rows
    val bmpOnly = Seq(MediaRecord(22L, MediaMeta("image", 2, 2, 0),
      graft.multimodal.BmpDecoder.encode(2, 2, Array.fill(4)((1, 2, 3))))).toDS()
    assert(MediaOps.featurizeFrames(bmpOnly, 3).count() == 0)
  }

  test("ImageIoDecoder rejects non-image payloads without attempting a parse") {
    import graft.multimodal.ImageIoDecoder
    assert(ImageIoDecoder.decode(null).isEmpty)
    assert(ImageIoDecoder.decode(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)).isEmpty)
    // PNG magic but garbage body -> parse fails cleanly to None
    val fake = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 0, 0, 0, 0)
    assert(ImageIoDecoder.decode(fake).isEmpty)
  }

  test("MP4 container metadata: box walk gets duration, tracks, resolution") {
    import graft.multimodal.{Mp4Parser, MediaOps}
    import MediaOps.{MediaMeta, MediaRecord}
    import spark.implicits._
    def u32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      u32(8L + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload
    // mvhd v0: version/flags, ctime, mtime, timescale=1000, duration=5000,
    // then rate/volume/reserved/matrix/predefined/next_track as zeros
    val mvhd = box("mvhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++ u32(5000) ++
        Array.fill[Byte](100 - 20)(0))
    // tkhd v0: 84-byte payload, 16.16 width/height at offsets 76/80
    def tkhd(w: Int, h: Int) = box("tkhd",
      Array.fill[Byte](76)(0) ++ u32(w.toLong << 16) ++ u32(h.toLong << 16))
    val video = box("trak", tkhd(640, 360))
    val audio = box("trak", tkhd(0, 0))
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(0)) ++
      box("moov", mvhd ++ video ++ audio)

    val m = Mp4Parser.parse(mp4).get
    assert(m.majorBrand == "isom")
    assert(m.timescale == 1000 && m.durationMs == 5000)
    assert(m.nTracks == 2)
    assert(m.width == 640 && m.height == 360)
    // non-containers are rejected, not misparsed
    assert(Mp4Parser.parse("definitely not an mp4 file".getBytes).isEmpty)
    assert(Mp4Parser.parse(Array[Byte](0, 0, 0, 1)).isEmpty)

    // featurize routes container payloads through the box walk (marker 4)
    val f = MediaOps.featurize(
      Seq(MediaRecord(9L, MediaMeta("video", 640, 360, 0), mp4)).toDS()
    ).collect()(0)
    assert(f.width == 640 && f.height == 360)
    assert(f.feature(7) == 4f, f.feature.toSeq)   // container-metadata marker
    assert(f.feature(0) == 5f)                    // 5.000 s duration
    assert(f.feature(5) == 2f)                    // track count
  }

  test("Mp4Parser never throws on arbitrary bytes") {
    import graft.multimodal.Mp4Parser
    val rnd = new scala.util.Random(11)
    // random garbage, truncated headers, and adversarial size fields
    // (0, 1=largesize, huge, negative-looking) must all parse to None or
    // Some without exceptions or hangs
    (0 until 200).foreach { i =>
      val len = rnd.nextInt(64)
      Mp4Parser.parse(Array.fill[Byte](len)(rnd.nextInt().toByte))
    }
    val ftyp = Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes ++ Array[Byte](0, 0, 0, 0)
    for (size <- Seq(0L, 1L, 7L, 0xFFFFFFFFL, 0x7FFFFFFFL)) {
      val evil = ftyp ++ Array(
        ((size >> 24) & 0xff).toByte, ((size >> 16) & 0xff).toByte,
        ((size >> 8) & 0xff).toByte, (size & 0xff).toByte) ++
        "moov".getBytes ++ Array.fill[Byte](24)(0)
      Mp4Parser.parse(evil) // must terminate without throwing
    }
  }

  test("sampleFrames explodes n rows per media row") {
    val df = MediaOps.syntheticMedia(spark, 5).toDF()
    val sampled = MediaOps.sampleFrames(df, 4)
    assert(sampled.count() == 20)
    assert(sampled.columns.contains("frame_key"))
  }

  test("resize spec travels beside the payload") {
    val df = MediaOps.withResizeSpec(MediaOps.syntheticMedia(spark, 3).toDF(), 224, 224)
    val r = df.select("resize_spec.w", "resize_spec.h").head
    assert(r.getInt(0) == 224 && r.getInt(1) == 224)
  }

  test("decodePixels round-trips encode, top-down row-major") {
    val px = Array.tabulate(6)(i => (i * 10, i * 10 + 1, i * 10 + 2)) // 3x2
    val img = BmpDecoder.decodePixels(BmpDecoder.encode(3, 2, px)).get
    assert(img.width == 3 && img.height == 2)
    val back = img.rgb.map(v => ((v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff))
    assert(back.toSeq == px.toSeq)
  }

  test("resizeNearest samples floor(X*w/outW, Y*h/outH) exactly") {
    // 4x2 source, distinct per-pixel reds; 2x1 target picks (0,0),(2,0)
    val src = Array.tabulate(8)(i => (i * 20, 0, 0))
    val out = MediaOps.resizeNearest(BmpDecoder.encode(4, 2, src), 2, 1).get
    val o = BmpDecoder.decodePixels(out).get
    assert(o.width == 2 && o.height == 1)
    assert(o.rgb.map(v => (v >> 16) & 0xff).toSeq == Seq(0, 40))

    // odd ratio: 5x3 -> 2x2 picks x in {0, 2}, y in {0, 1}
    val src2 = Array.tabulate(15)(i => (i, 0, 0))
    val o2 = BmpDecoder.decodePixels(
      MediaOps.resizeNearest(BmpDecoder.encode(5, 3, src2), 2, 2).get).get
    assert(o2.rgb.map(v => (v >> 16) & 0xff).toSeq == Seq(0, 2, 5, 7))
  }

  test("resizeImages resamples BMP payloads and passes others through") {
    import spark.implicits._
    val bmp = BmpDecoder.encode(4, 4, Array.fill(16)((200, 100, 50)))
    val wav = WavDecoder.encode(8000, Array.tabulate(10)(_.toShort))
    val media = Seq(
      MediaOps.MediaRecord(0L, MediaOps.MediaMeta("image", 4, 4, 0), bmp),
      MediaOps.MediaRecord(1L, MediaOps.MediaMeta("audio", 0, 0, 8000), wav)
    ).toDS()
    val out = MediaOps.resizeImages(media, 2, 2).collect().sortBy(_.media_id)
    val img = BmpDecoder.decodePixels(out(0).payload).get
    assert(img.width == 2 && img.height == 2)
    assert(out(0).meta.declaredWidth == 2 && out(0).meta.declaredHeight == 2)
    assert(img.rgb.forall(_ == ((200 << 16) | (100 << 8) | 50)))
    // non-BMP payload untouched, byte-for-byte
    assert(out(1).payload.toSeq == wav.toSeq)
  }

  test("dHash: identical images hash identically, a one-pixel edit flips at most " +
       "2 bits, unrelated images sit far apart, non-BMP marks undecoded") {
    import spark.implicits._
    val W = 8; val H = 6
    def img(seed: Int, editAt: Option[(Int, Int)]): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val px = Array.tabulate(W * H) { p =>
        val x = p % W; val y = p / W
        def ch(c: Int) = {
          val b = md.digest(s"$seed|$x|$y|$c".getBytes("UTF-8"))(0) & 0xff
          val bump = if (editAt.contains((x, y))) 40 else 0
          (b + bump) % 256
        }
        (ch(0), ch(1), ch(2))
      }
      BmpDecoder.encode(W, H, px)
    }
    val media = Seq(
      MediaOps.MediaRecord(0L, MediaOps.MediaMeta("image", W, H, 0), img(1, None)),
      MediaOps.MediaRecord(1L, MediaOps.MediaMeta("image", W, H, 0), img(1, None)),
      MediaOps.MediaRecord(2L, MediaOps.MediaMeta("image", W, H, 0), img(1, Some((3, 2)))),
      MediaOps.MediaRecord(3L, MediaOps.MediaMeta("image", W, H, 0), img(2, None)),
      MediaOps.MediaRecord(4L, MediaOps.MediaMeta("image", 0, 0, 0), Array[Byte](1, 2, 3))
    ).toDS()
    val rows = MediaOps.dHash(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(0) == rows(1), "identical payloads must hash identically")
    assert(rows(4)._2 == 0L, "undecodable payload must mark decoded=0")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // the (3,2) edit touches only the two horizontal comparisons at x=2,3
    assert(ham(rows(0)._1, rows(2)._1) <= 2,
      s"one-pixel edit flipped ${ham(rows(0)._1, rows(2)._1)} bits")
    assert(ham(rows(0)._1, rows(3)._1) > 8,
      s"unrelated md5 images should differ widely, got ${ham(rows(0)._1, rows(3)._1)}")
  }

  test("dHash: an oversized image downsamples to the fingerprint grid — a 2x " +
       "pixel-doubled copy hashes like its thumbnail, not as undecoded") {
    import spark.implicits._
    val W = 8; val H = 6
    val md = java.security.MessageDigest.getInstance("MD5")
    def ch(x: Int, y: Int, c: Int) =
      md.digest(s"9|$x|$y|$c".getBytes("UTF-8"))(0) & 0xff
    val small = BmpDecoder.encode(W, H, Array.tabulate(W * H) { p =>
      (ch(p % W, p / W, 0), ch(p % W, p / W, 1), ch(p % W, p / W, 2))
    })
    // 16x12: each source pixel doubled — nearest-neighbor 16x12 -> 8x6
    // picks even coordinates, recovering the small image exactly
    val big = BmpDecoder.encode(W * 2, H * 2, Array.tabulate(W * 2 * H * 2) { p =>
      val x = (p % (W * 2)) / 2; val y = (p / (W * 2)) / 2
      (ch(x, y, 0), ch(x, y, 1), ch(x, y, 2))
    })
    val rows = MediaOps.dHash(Seq(
        MediaOps.MediaRecord(0L, MediaOps.MediaMeta("image", W, H, 0), small),
        MediaOps.MediaRecord(1L, MediaOps.MediaMeta("image", W * 2, H * 2, 0), big)
      ).toDS()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1)._2 == 1L, "oversized image must decode via downscale")
    assert(rows(0) == rows(1),
      "a pixel-doubled image must fingerprint identically to its thumbnail")
  }

  test("audioHash: a one-sample click flips at most 2 bits; identical clips match; " +
       "non-WAV marks undecoded") {
    import spark.implicits._
    val N = 800
    def clip(seed: Int, clickAt: Option[Int]): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val samples = Array.tabulate(N) { i =>
        val h = md.digest(s"$seed|$i".getBytes("UTF-8"))
        val v = (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % 4001 - 2000
        (v + (if (clickAt.contains(i)) 1500 else 0)).toShort
      }
      WavDecoder.encode(16000, samples)
    }
    val media = Seq(
      MediaOps.MediaRecord(0L, MediaOps.MediaMeta("audio", 0, 0, 16000), clip(1, None)),
      MediaOps.MediaRecord(1L, MediaOps.MediaMeta("audio", 0, 0, 16000), clip(1, None)),
      MediaOps.MediaRecord(2L, MediaOps.MediaMeta("audio", 0, 0, 16000), clip(1, Some(400))),
      MediaOps.MediaRecord(3L, MediaOps.MediaMeta("audio", 0, 0, 16000), clip(2, None)),
      MediaOps.MediaRecord(4L, MediaOps.MediaMeta("audio", 0, 0, 16000), Array[Byte](9, 9))
    ).toDS()
    val rows = MediaOps.audioHash(media, 50).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(rows(0) == rows(1), "identical clips must hash identically")
    assert(rows(4)._2 == 0L, "undecodable payload must mark decoded=0")
    assert(ham(rows(0)._1, rows(2)._1) <= 2,
      s"one-sample click flipped ${ham(rows(0)._1, rows(2)._1)} bits")
    assert(ham(rows(0)._1, rows(3)._1) > 8,
      s"unrelated clips should differ widely, got ${ham(rows(0)._1, rows(3)._1)}")
  }

  test("audioHashWide: word 0 agrees with audioHash at <=64 windows; 100 windows " +
       "pack two words with the click edit confined to its window's bits") {
    import spark.implicits._
    def clip(seed: Int, n: Int, clickAt: Option[Int]): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val samples = Array.tabulate(n) { i =>
        val h = md.digest(s"$seed|$i".getBytes("UTF-8"))
        val v = (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % 4001 - 2000
        (v + (if (clickAt.contains(i)) 1500 else 0)).toShort
      }
      WavDecoder.encode(16000, samples)
    }
    def rec(id: Long, p: Array[Byte]) =
      MediaOps.MediaRecord(id, MediaOps.MediaMeta("audio", 0, 0, 16000), p)
    // parity at 50 windows (49 bits): wide word 0 == the long form
    val small = Seq(rec(0L, clip(1, 800, None)), rec(1L, clip(2, 800, None))).toDS()
    val long = MediaOps.audioHash(small, 50).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wideSmall = MediaOps.audioHashWide(small, 50).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (id <- Seq(0L, 1L)) {
      assert(wideSmall(id).length == 1 && wideSmall(id).head == long(id))
    }
    // 100 windows (99 bits = 2 words); a click at sample 800 lands in
    // window 50 -> flips at most comparisons 49/50, both in word 0
    val wide = MediaOps.audioHashWide(Seq(
        rec(0L, clip(3, 1600, None)), rec(1L, clip(3, 1600, None)),
        rec(2L, clip(3, 1600, Some(800))), rec(3L, clip(4, 1600, None))).toDS(), 100)
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    def hamW(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(wide.values.forall(_._1.length == 2))
    assert(wide(0L)._1 == wide(1L)._1)
    assert(hamW(wide(0L)._1, wide(2L)._1) <= 2 &&
           wide(0L)._1(1) == wide(2L)._1(1),
      "the click must flip <= 2 bits, all in word 0")
    assert(hamW(wide(0L)._1, wide(3L)._1) > 15)
  }

  test("frameDHash composes delta-encoded GIF frames: a sub-rectangle patch at " +
       "an offset fingerprints like the full-frame re-encode of the same video") {
    import spark.implicits._
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    // sizes chosen around a JDK GIFImageWriter defect: indexed images
    // under ~48 pixels round-trip corrupted (probed: 8x6 and 16x8 are
    // exact, 8x3/8x2/3x2 are not) — the 16x12 frame and its 8x6 patch
    // are both on the safe side, and dHash resamples the composed
    // canvas to the fingerprint grid anyway
    val W = 16; val H = 12
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def chan(seed: String): Int = md5.digest(seed.getBytes("UTF-8"))(0) & 0xff
    def indexed(w: Int, h: Int, colorAt: (Int, Int) => Int) = {
      val colors = Array.tabulate(w * h)(p => colorAt(p % w, p / w))
      val pal = colors.distinct
      val cm = new java.awt.image.IndexColorModel(8, pal.length,
        pal.map(v => ((v >> 16) & 0xff).toByte),
        pal.map(v => ((v >> 8) & 0xff).toByte),
        pal.map(v => (v & 0xff).toByte))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      var p = 0
      while (p < w * h) { img.setRGB(p % w, p / w, colors(p)); p += 1 }
      img
    }
    def base(x: Int, y: Int): Int =
      (chan(s"a|$x|$y|0") << 16) | (chan(s"a|$x|$y|1") << 8) | chan(s"a|$x|$y|2")
    def patched(x: Int, y: Int): Int =
      if (x >= 4 && x < 12 && y >= 3 && y < 9)
        (chan(s"p|$x|$y|0") << 16) | (chan(s"p|$x|$y|1") << 8) | chan(s"p|$x|$y|2")
      else base(x, y)
    def gif(frames: Seq[(java.awt.image.BufferedImage, Int, Int)]): Array[Byte] = {
      val writer = ImageIO.getImageWritersBySuffix("gif").next()
      val out = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for ((img, left, top) <- frames) {
        val wp = writer.getDefaultWriteParam
        val meta = writer.getDefaultImageMetadata(new ImageTypeSpecifier(img), wp)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        val kids = tree.getChildNodes
        var k = 0
        while (k < kids.getLength) {
          kids.item(k) match {
            case n: IIOMetadataNode if n.getNodeName == "ImageDescriptor" =>
              n.setAttribute("imageLeftPosition", left.toString)
              n.setAttribute("imageTopPosition", top.toString)
            case n: IIOMetadataNode if n.getNodeName == "GraphicControlExtension" =>
              n.setAttribute("disposalMethod", "doNotDispose")
            case _ => ()
          }
          k += 1
        }
        meta.setFromTree(fmt, tree)
        writer.writeToSequence(new IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
      writer.dispose(); ios.close()
      out.toByteArray
    }
    // DELTA form: frame 1 is only the changed 8x6 rectangle at (4, 3);
    // FULL form: frame 1 re-encodes the whole composed image
    val delta = gif(Seq((indexed(W, H, base), 0, 0),
                        (indexed(8, 6, (x, y) => patched(x + 4, y + 3)), 4, 3)))
    val full = gif(Seq((indexed(W, H, base), 0, 0),
                       (indexed(W, H, patched), 0, 0)))
    def rec(id: Long, p: Array[Byte]) =
      MediaOps.MediaRecord(id, MediaOps.MediaMeta("video", 0, 0, 0), p)
    val rows = MediaOps.frameDHash(Seq(rec(0L, delta), rec(1L, full)).toDS(), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(rows((0L, 0L)) == rows((1L, 0L)), "frame 0 must match trivially")
    assert(rows((0L, 1L)) == rows((1L, 1L)),
      "composed delta frame must fingerprint like the full-frame re-encode")
    // and the patch genuinely changed the displayed frame
    assert(rows((0L, 0L)) != rows((0L, 1L)), "patch must alter the fingerprint")
  }

  test("dHashWide: word packing agrees with dHash on a <=63-bit grid, and a " +
       "one-pixel edit on the 16x8 grid flips at most 2 bits in the right word") {
    import spark.implicits._
    def bmp(w: Int, h: Int, seed: Int, edit: Option[(Int, Int)]): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      BmpDecoder.encode(w, h, Array.tabulate(w * h) { p =>
        val x = p % w; val y = p / w
        def ch(c: Int): Int = {
          val b = md.digest(s"$seed|$x|$y|$c".getBytes("UTF-8"))(0) & 0xff
          (b + (if (edit.contains((x, y))) 40 else 0)) % 256
        }
        (ch(0), ch(1), ch(2))
      })
    }
    def rec(id: Long, p: Array[Byte]) =
      MediaOps.MediaRecord(id, MediaOps.MediaMeta("image", 0, 0, 0), p)
    // parity on the default grid: wide word 0 == the long fingerprint
    val small = Seq(rec(0L, bmp(8, 6, 1, None)), rec(1L, bmp(8, 6, 2, None))).toDS()
    val long = MediaOps.dHash(small).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wideSmall = MediaOps.dHashWide(small, 8, 6).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (id <- Seq(0L, 1L)) {
      assert(wideSmall(id).length == 1)
      assert(wideSmall(id).head == long(id), s"wide word drifted for $id")
    }
    // 16x8 grid: 120 bits over two words; an edit at pixel (12, 6)
    // touches comparisons at bits y*15+x for x in {11, 12}, y=6 ->
    // bits 101/102, i.e. word 1 only
    val wide = MediaOps.dHashWide(Seq(
        rec(0L, bmp(16, 8, 3, None)),
        rec(1L, bmp(16, 8, 3, None)),
        rec(2L, bmp(16, 8, 3, Some((12, 6)))),
        rec(3L, bmp(16, 8, 4, None))).toDS(), 16, 8)
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    def hamW(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(wide.values.forall(_._1.length == 2), "120 bits must pack 2 words")
    assert(wide(0L)._1 == wide(1L)._1, "identical images must hash identically")
    assert(hamW(wide(0L)._1, wide(2L)._1) <= 2 &&
           wide(0L)._1.head == wide(2L)._1.head,
      "the (12,6) edit must stay within 2 bits, all in word 1")
    assert(hamW(wide(0L)._1, wide(3L)._1) > 20, "unrelated images differ widely")
  }

  test("frameDHash: per-position hashes — identical GIFs match everywhere, a " +
       "one-frame edit perturbs only that position, non-animated payloads emit no rows") {
    import spark.implicits._
    val W = 8; val H = 6; val F = 4
    def gif(seed: Int, editFrame: Option[Int]): Array[Byte] = {
      import javax.imageio.{IIOImage, ImageIO}
      val md = java.security.MessageDigest.getInstance("MD5")
      val writer = ImageIO.getImageWritersBySuffix("gif").next()
      val out = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until F).foreach { f =>
        val colors = Array.tabulate(W * H) { p =>
          val x = p % W; val y = p / W
          def ch(c: Int): Int = {
            val b = md.digest(s"$seed|$f|$x|$y|$c".getBytes("UTF-8"))(0) & 0xff
            (b + (if (editFrame.contains(f) && x == 3 && y == 2) 40 else 0)) % 256
          }
          (ch(0) << 16) | (ch(1) << 8) | ch(2)
        }
        val pal = colors.distinct
        val cm = new java.awt.image.IndexColorModel(8, pal.length,
          pal.map(v => ((v >> 16) & 0xff).toByte),
          pal.map(v => ((v >> 8) & 0xff).toByte),
          pal.map(v => (v & 0xff).toByte))
        val img = new java.awt.image.BufferedImage(W, H,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        var p = 0
        while (p < W * H) { img.setRGB(p % W, p / W, colors(p)); p += 1 }
        writer.writeToSequence(new IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      writer.dispose(); ios.close()
      out.toByteArray
    }
    def rec(id: Long, p: Array[Byte]) =
      MediaOps.MediaRecord(id, MediaOps.MediaMeta("video", 0, 0, 0), p)
    val rows = MediaOps.frameDHash(Seq(
        rec(0L, gif(1, None)), rec(1L, gif(1, None)),
        rec(2L, gif(1, Some(2))), rec(3L, BmpDecoder.encode(2, 2,
          Array.fill(4)((1, 2, 3))))).toDS(), F)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(rows.keys.count(_._1 == 3L) == 0, "still image must emit no frame rows")
    assert((0 until F).forall(f => rows((0L, f.toLong)) == rows((1L, f.toLong))),
      "identical GIFs must match at every position")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert((0 until F).filter(_ != 2)
      .forall(f => rows((0L, f.toLong)) == rows((2L, f.toLong))),
      "unedited positions must stay bit-identical")
    assert(ham(rows((0L, 2L)), rows((2L, 2L))) >= 1 &&
           ham(rows((0L, 2L)), rows((2L, 2L))) <= 2,
      "the edited position must move by 1-2 bits")
  }
}
