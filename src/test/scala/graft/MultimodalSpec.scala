package graft

import graft.sources.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def mediaDf = {
    val rows = java.util.Arrays.asList(
      Row(1L, "video", Row(null, null, 3500L, null, "h264"), Array[Byte](1, 2, 3)),
      Row(2L, "video", Row(null, null, 0L, null, "h264"), Array[Byte](9)),
      Row(3L, "video", Row(null, null, 99999L, null, "h264"), Array[Byte](4, 5)),
      Row(4L, "image", Row(64, 48, null, null, "png"), Array[Byte](7, 8)),
      Row(5L, "image", Row(null, null, null, null, null), null),
      Row(6L, "audio", Row(null, null, 2000L, 16000, "pcm"), Array[Byte](1, 1)))
    spark.createDataFrame(rows, Multimodal.mediaSchema)
  }

  test("sampleFrames: stride-spaced frames, zero-duration skipped, capped") {
    val frames = Multimodal.sampleFrames(mediaDf, strideMs = 1000L, maxFrames = 8)
    val byAsset = frames.collect().groupBy(_.getLong(0))
    assert(byAsset(1L).length == 3)            // 3500ms / 1000ms
    assert(!byAsset.contains(2L))              // zero duration → no frames
    assert(byAsset(3L).length == 8)            // capped at maxFrames
    val ts = byAsset(1L).map(_.getLong(2)).sorted
    assert(ts.toSeq == Seq(0L, 1000L, 2000L))
    // deterministic frame bytes
    val again = Multimodal.sampleFrames(mediaDf, 1000L, 8).collect()
      .groupBy(_.getLong(0))
    assert(byAsset(1L).map(_.getAs[Array[Byte]]("frame").toSeq).toSeq ==
      again(1L).map(_.getAs[Array[Byte]]("frame").toSeq).toSeq)
  }

  test("resizeImages: fixed-shape output, null payload propagates as null") {
    val out = Multimodal.resizeImages(mediaDf, 8, 8).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Array[Byte]]("resized"))).toMap
    assert(out(4L).get.length == 8 * 8 * 3)
    assert(out(5L).isEmpty)
  }

  test("audioFeatures: fixed-dim bounded vector per audio asset") {
    val out = Multimodal.audioFeatures(mediaDf, dim = 16).collect()
    assert(out.length == 1)
    val v = out.head.getSeq[Float](out.head.fieldIndex("features"))
    assert(v.length == 16 && v.forall(x => x >= -1f && x <= 1f))
  }
}
