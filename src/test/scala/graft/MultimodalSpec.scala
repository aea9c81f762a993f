package graft

import graft.operators.multimodal.Multimodal

/** Multimodal plumbing: deterministic synthesis, batched feature
  * extraction, frame sampling, size-based partitioning.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthesize is deterministic") {
    val a = Multimodal.synthesize(spark, 50).collect().map(r => (r.media_id, r.payload.toSeq))
    val b = Multimodal.synthesize(spark, 50).collect().map(r => (r.media_id, r.payload.toSeq))
    assert(a.sameElements(b))
  }

  test("extractFeatures: stable sha + fixed-dim features") {
    val feats = Multimodal.extractFeatures(Multimodal.synthesize(spark, 30), dim = 8).collect()
    assert(feats.length == 30)
    assert(feats.forall(_.features.length == 8))
    val again = Multimodal.extractFeatures(Multimodal.synthesize(spark, 30), dim = 8).collect()
    val byId = feats.map(f => f.media_id -> f.sha).toMap
    val byIdAgain = again.map(f => f.media_id -> f.sha).toMap
    assert(byId == byIdAgain)
  }

  test("sampleFrames: one frame per interval, only for video rows") {
    val media = Multimodal.synthesize(spark, 30)
    val frames = Multimodal.sampleFrames(media, everyMs = 1000)
    val perMedia = frames.groupByKey(_.media_id).count().collect().toMap
    val videos = media.filter(_.kind == "video").collect()
    assert(perMedia.keySet == videos.map(_.media_id).toSet)
    videos.foreach { v =>
      assert(perMedia(v.media_id) == math.max(1, v.duration_ms / 1000))
    }
  }

  test("repartitionBySize targets byte budget") {
    val df = Multimodal.synthesize(spark, 100).toDF()
      .withColumn("n_bytes", org.apache.spark.sql.functions.length(org.apache.spark.sql.functions.col("payload")))
    val out = Multimodal.repartitionBySize(df, "n_bytes", 16 * 1024)
    assert(out.rdd.getNumPartitions >= 2)
    assert(out.count() == 100)
  }
}
