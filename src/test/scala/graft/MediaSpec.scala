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
