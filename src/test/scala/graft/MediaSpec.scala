package graft

import graft.multimodal.MediaOps

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
}
