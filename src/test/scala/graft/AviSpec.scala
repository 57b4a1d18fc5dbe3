package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{AviParser, MediaOps}

/** The raw-DIB AVI tier (round 16, VERDICT r15 Next #2): a true RIFF
  * video container through the temporal fingerprint chain. Pins the
  * parser's round-trip, the container-agnostic fingerprint contract
  * (same pixel formula through GIF and AVI ⇒ identical per-frame
  * hashes), and the GIF path's guard matrix mirrored byte-for-byte:
  * malformed modes degrade to None / zero rows, oversize is a named
  * skip, compressed streams are out of the codec-free tier. */
class AviSpec extends SparkSpec {
  import spark.implicits._

  private def px(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(p => f(p % w, p / w))

  test("encode/decode round-trip: frame count, dims, exact pixels, " +
       "bottom-up row order inverted back to top-down") {
    val w = 5; val h = 3 // 3*5 = 15 bytes/row -> exercises the 4-byte pad
    val frames = Seq(
      px(w, h)((x, y) => (x << 16) | (y << 8) | 7),
      px(w, h)((x, y) => ((x * y) << 16) | 0x40),
      px(w, h)((x, y) => (x + y) * 0x010101))
    val bytes = AviParser.encode(w, h, frames)
    assert(AviParser.probe(bytes).contains((3, w, h)))
    val Some((n, byIdx)) = AviParser.decodeFrames(bytes, _ => Set(0, 2))
    assert(n == 3 && byIdx.keySet == Set(0, 2))
    for ((i, p) <- byIdx) {
      assert(p.width == w && p.height == h)
      assert(p.rgb.toSeq == frames(i).toSeq, s"frame $i pixels drifted")
    }
  }

  test("container-agnostic fingerprints: the SAME temporal fixture " +
       "through GIF and AVI yields identical per-frame wide dHashes") {
    import graft.multimodal.MediaOps.{MediaMeta, MediaRecord}
    val W = 16; val H = 8; val F = 4
    def rec(id: Long, payload: Array[Byte]) =
      MediaRecord(id, MediaMeta("video", W, H, 0), payload)
    val ids = Seq((0L, 0L, -1), (1L, 1L, -1), (2L, 0L, 2)) // (id, key, bump)
    val gifs = spark.createDataset(ids.map { case (id, k, b) =>
      rec(id, graft.jobs.JobRecordGate.encodeTemporalGifKeyed(k, b, W, H, F)) })
    val avis = spark.createDataset(ids.map { case (id, k, b) =>
      rec(id, graft.jobs.JobRecordGate.encodeTemporalAviKeyed(k, b, W, H, F)) })
    def rows(ds: org.apache.spark.sql.Dataset[MediaRecord]) =
      MediaOps.frameDHashWide(ds, F, W, H)
        .select(col("media_id"), col("frame_idx"), col("fhash"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Long](2).toSeq)).toSet
    val g = rows(gifs); val a = rows(avis)
    assert(g.size == ids.size * F, s"expected ${ids.size * F} rows, got ${g.size}")
    assert(g == a, "GIF and AVI forms of one pixel formula must fingerprint " +
      "identically — the vote arm is container-agnostic")
    // and the bump really is a near-edit: frame 2 of id 2 differs from
    // id 0's by <= 2 comparison bits, other frames are identical
    def fp(s: Set[(Long, Long, Seq[Long])], id: Long, f: Long) =
      s.find(r => r._1 == id && r._2 == f).get._3
    for (f <- 0L until F.toLong) {
      val ham = fp(a, 0L, f).zip(fp(a, 2L, f))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if (f == 2L) assert(ham >= 1 && ham <= 2, s"bump frame hamming $ham")
      else assert(ham == 0, s"unedited frame $f drifted (hamming $ham)")
    }
  }

  test("guard matrix: malformed modes degrade to None, oversize is a " +
       "named skip, compressed streams need a codec") {
    val good = AviParser.encode(4, 4, Seq(px(4, 4)((x, y) => x + y)))
    def patched(off: Int, v: Long): Array[Byte] = patched0(good, off, v)
    // strf body starts at 172 (RIFF 12 + LIST/hdrl 12 + avih 64 +
    // LIST/strl 12 + strh 64 + strf header 8): biWidth at +4,
    // biHeight at +8, biBitCount at +14 (u16), biCompression at +16
    assert(AviParser.probe(good).contains((1, 4, 4)), "offset map drifted")
    assert(AviParser.decodeFrames(null, _ => Set(0)).isEmpty)
    assert(AviParser.decodeFrames("notavi".getBytes, _ => Set(0)).isEmpty)
    assert(AviParser.decodeFrames(good.take(40), _ => Set(0)).isEmpty,
      "truncated header must be malformed, not a crash")
    assert(AviParser.decodeFrames(good.dropRight(7), _ => Set(0)).isEmpty,
      "truncated frame chunk must be malformed")
    assert(AviParser.decodeFrames(patched(176, 0L), _ => Set(0)).isEmpty,
      "zero width is malformed")
    assert(AviParser.decodeFrames(patched(180, 0xffffffffL), _ => Set(0)).isEmpty,
      "negative (top-down) height is outside the raw tier")
    assert(AviParser.decodeFrames(patched(176, 2L), _ => Set(0)).isEmpty,
      "frame bytes disagreeing with header geometry is malformed")
    assert(AviParser.decodeFrames(patched(188, 0x47504a4dL), _ => Set(0)).isEmpty,
      "compressed (MJPG) streams need a codec — out of the pure-JVM tier")
    // oversize: a declared 5000x5000 frame (25M px > 2^24) is SKIPPED
    // before any pixel allocation — the GIF logical-screen guard's twin
    assert(AviParser.decodeFrames(
        patched0(patched(176, 5000L), 180, 5000L), _ => Set(0)).isEmpty,
      "oversized frames are skipped, never allocated")
    // and the Spark path emits no rows for any of them
    import graft.multimodal.MediaOps.{MediaMeta, MediaRecord}
    val bad = spark.createDataset(Seq(
      MediaRecord(0L, MediaMeta("video", 4, 4, 0), good.dropRight(7)),
      MediaRecord(1L, MediaMeta("video", 4, 4, 0), "junk".getBytes)))
    assert(MediaOps.frameDHashWide(bad, 4, 8, 6).count() == 0)
  }

  private def patched0(b0: Array[Byte], off: Int, v: Long): Array[Byte] = {
    val b = b0.clone()
    var i = 0
    while (i < 4) { b(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  test("multi-stream + interleaved AVIs decode: audio-first stream " +
       "numbering and LIST-rec-wrapped frame chunks (second review pass)") {
    // hand-assemble a 2-stream AVI: audio strl DECLARED FIRST, video
    // strl second -> video frames are '01db' chunks, here wrapped in
    // the standard 'LIST rec ' interleave grouping. A LIFO region walk
    // numbered the streams backwards and a movi walk that skipped
    // 'rec ' lists both decoded this to None.
    val w = 4; val h = 2
    val frame = px(w, h)((x, y) => (x * 40 << 16) | (y * 90 << 8) | 5)
    val bo = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { var i = 0; while (i < 4) {
      bo.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    def tag(t: String): Unit = bo.write(t.getBytes("US-ASCII"))
    val rowBytes = (3 * w + 3) & ~3
    val frameBytes = rowBytes * h
    def strl(fcc: String, handler: String, strfBody: () => Unit,
             strfSz: Int): Unit = {
      val sz = 4 + (8 + 56) + (8 + strfSz)
      tag("LIST"); w32(sz); tag("strl")
      tag("strh"); w32(56); tag(fcc); tag(handler)
      (0 until 12).foreach(_ => w32(0))
      tag("strf"); w32(strfSz); strfBody()
    }
    def audioStrf(): Unit = { // minimal WAVEFORMATEX (16 bytes)
      w16(1); w16(1); w32(8000); w32(16000); w16(2); w16(16)
    }
    def videoStrf(): Unit = {
      w32(40); w32(w); w32(h); w16(1); w16(24)
      w32(0); w32(frameBytes); w32(0); w32(0); w32(0); w32(0)
    }
    val strlAudioSz = 8 + (4 + 64 + 8 + 16)
    val strlVideoSz = 8 + (4 + 64 + 8 + 40)
    val hdrlSz = 4 + (8 + 56) + strlAudioSz + strlVideoSz
    val recSz = 4 + (8 + frameBytes)
    val moviSz = 4 + (8 + recSz)
    val riffSz = 4 + (8 + hdrlSz) + (8 + moviSz)
    tag("RIFF"); w32(riffSz); tag("AVI ")
    tag("LIST"); w32(hdrlSz); tag("hdrl")
    tag("avih"); w32(56)
    (0 until 14).foreach(_ => w32(0))
    strl("auds", "    ", audioStrf _, 16)
    strl("vids", "DIB ", videoStrf _, 40)
    tag("LIST"); w32(moviSz); tag("movi")
    tag("LIST"); w32(recSz); tag("rec ")
    tag("01db"); w32(frameBytes)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = frame(y * w + x)
        bo.write(v & 0xff); bo.write((v >> 8) & 0xff); bo.write((v >> 16) & 0xff)
        x += 1
      }
      y -= 1
    }
    val bytes = bo.toByteArray
    assert(AviParser.probe(bytes).contains((1, w, h)),
      "audio-first interleaved AVI must probe as one video frame")
    val Some((n, byIdx)) = AviParser.decodeFrames(bytes, _ => Set(0))
    assert(n == 1 && byIdx(0).rgb.toSeq == frame.toSeq,
      "stream-1 frames inside LIST rec must decode to the exact pixels")
  }

  test("MJPEG tier: real JPEG frames decode through the LOSSY codec to " +
       "FORMULA-EXACT fingerprints (the margin construction holds)") {
    import graft.multimodal.MediaOps.{MediaMeta, MediaRecord}
    val W = 16; val H = 8; val F = 4
    // expected fingerprints straight from the level formula — no codec
    def expectedWords(key: Long, f: Int, bump: Int): Seq[Long] = {
      val lv = graft.jobs.JobRecordGate.mjpegLevels(key, f, bump, W, H)
      val out = new Array[Long]((H * (W - 1) + 63) / 64)
      for (y <- 0 until H; x <- 0 until W - 1
           if lv(y * W + x + 1) > lv(y * W + x)) {
        val b = y * (W - 1) + x
        out(b >> 6) |= 1L << (b & 63)
      }
      out.toSeq
    }
    val ids = Seq((0L, 0L, -1), (1L, 5L, -1), (2L, 0L, 2), (3L, 7L, 1))
    val recs = spark.createDataset(ids.map { case (id, k, b) =>
      MediaRecord(id, MediaMeta("video", W, H, 0),
        graft.jobs.JobRecordGate.encodeTemporalMjpegKeyed(k, b, W, H, F)) })
    val got = MediaOps.frameDHashWide(recs, F, W, H)
      .select(col("media_id"), col("frame_idx"), col("fhash"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getSeq[Long](2).toSeq)).toMap
    assert(got.size == ids.size * F, s"expected ${ids.size * F} rows")
    for ((id, k, b) <- ids; f <- 0 until F) {
      val exp = expectedWords(k, f, b)
      assert(got((id, f.toLong)) == exp,
        s"JPEG round-trip broke a comparison margin at id=$id f=$f: " +
        s"got ${got((id, f.toLong))}, formula says $exp")
    }
    // the bump really is a bounded edit: 1-2 comparisons at frame 2
    val ham = expectedWords(0L, 2, 2).zip(expectedWords(0L, 2, -1))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(ham >= 0 && ham <= 2, s"bump hamming $ham out of contract")
  }

  test("interleaved PCM audio (round 17, q174): one A/V container " +
       "yields BOTH fingerprint modalities, and the audio chain matches " +
       "the same samples through a bare WAV") {
    import graft.multimodal.{MediaOps, WavDecoder}
    import graft.multimodal.MediaOps.{MediaMeta, MediaRecord}
    val W = 16; val H = 8
    val samples = Array.tabulate[Short](800) { i =>
      (((i * 2654435761L) % 4001) - 2000).toShort
    }
    val frames = (0 until 4).map(f => px(W, H)((x, y) =>
      ((x * 7 + y * 13 + f) & 0xff) * 0x010101))
    val av = AviParser.encodeWithAudio(W, H, frames, 16000, samples)

    // the audio stream demuxes to the exact samples (sign-extended,
    // concatenated across the per-frame '01wb' chunks)
    assert(AviParser.decodeAudioSamples(av).exists(
      _.toSeq == samples.map(_.toInt).toSeq),
      "interleaved PCM samples drifted through the demux")
    // the VIDEO stream still decodes exactly — audio chunks are
    // invisible to the frame walk
    val Some((n, byIdx)) = AviParser.decodeFrames(av, _ => Set(0, 3))
    assert(n == 4 && byIdx(0).rgb.toSeq == frames(0).toSeq &&
      byIdx(3).rgb.toSeq == frames(3).toSeq)

    // one payload, both fingerprints: audioHash(AVI) == audioHash(WAV
    // of the same samples), and frameDHashWide emits 4 decoded frames
    def rec(id: Long, payload: Array[Byte], kind: String) = MediaRecord(
      id, MediaMeta(kind, W, H, 16000), payload)
    val avDs = spark.createDataset(Seq(rec(1L, av, "video")))
    val wavDs = spark.createDataset(
      Seq(rec(1L, WavDecoder.encode(16000, samples), "audio")))
    val hAvi = MediaOps.audioHash(avDs, 50).collect().head
    val hWav = MediaOps.audioHash(wavDs, 50).collect().head
    assert(hAvi.getLong(2) == 1L, "AVI audio must decode")
    assert(hAvi.getLong(1) == hWav.getLong(1),
      "the same samples must hash identically through AVI and WAV")
    val fps = MediaOps.frameDHashWide(avDs, maxFrames = 4, 16, 8).count()
    assert(fps == 4L, "the A/V container's video arm must still emit frames")

    // guard: a non-PCM audio format reads as "no audio stream" while
    // the video tier stays intact
    val mutated = av.clone()
    val fmtOff = indexOfSeq(mutated, "auds".getBytes("US-ASCII")) match {
      case i if i > 0 =>
        // strf follows strh: 8 (strh hdr) + 56 (strh body) + 8 (strf
        // hdr) after the 'auds' fourcc starts the WAVEFORMATEX
        i + 4 + 52 + 8
      case _ => fail("encoder must write an auds strh")
    }
    mutated(fmtOff) = 2 // wFormatTag: ADPCM — out of the PCM-16 tier
    assert(AviParser.decodeAudioSamples(mutated).isEmpty,
      "non-PCM audio must degrade to None, never mis-decode")
    assert(AviParser.probe(mutated).contains((4, W, H)),
      "a non-PCM audio stream must not take down the video tier")
  }

  private def indexOfSeq(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  test("AviParser never throws on arbitrary bytes") {
    val rnd = new scala.util.Random(42)
    for (len <- Seq(0, 1, 11, 12, 64, 500)) {
      val b = new Array[Byte](len); rnd.nextBytes(b)
      assert(AviParser.decodeFrames(b, _ => Set(0)).isEmpty)
      // RIFF magic with garbage body must still degrade, not crash
      if (len >= 12) {
        System.arraycopy("RIFF".getBytes, 0, b, 0, 4)
        System.arraycopy("AVI ".getBytes, 0, b, 8, 4)
        AviParser.decodeFrames(b, _ => Set(0)) // any result, no throw
      }
    }
  }
}
