package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media schema: binary payload + typed metadata struct") {
    val df = Multimodal.syntheticMedia(spark, 20).toDF()
    val schema = df.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
  }

  test("feature extraction is deterministic and bounded") {
    val media = Multimodal.syntheticMedia(spark, 50)
    val f1 = Multimodal.imageFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.imageFeatures(Multimodal.syntheticMedia(spark, 50))
      .collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq, "same payload -> same features")
    f1.foreach { f =>
      assert(f.mean_intensity >= 0 && f.mean_intensity <= 255)
      assert(f.histogram.sum == f.width * f.height, "histogram covers every pixel")
    }
  }

  test("frame sampling emits every stride-th frame of video rows only") {
    val media = Multimodal.syntheticMedia(spark, 40)
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_no % 2 == 0))
    val videoIds = media.filter(_.meta.kind == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet == videoIds)
  }

  test("decode partitioning caps rows per partition; features drop the payload") {
    val media = Multimodal.syntheticMedia(spark, 100)
    val parted = Multimodal.partitionForDecode(media, maxRowsPerPartition = 10)
    assert(parted.rdd.getNumPartitions >= 10)
    val feats = Multimodal.imageFeatures(parted).toDF()
    assert(!feats.columns.contains("content"), "binary must not flow downstream")
  }
}
