package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._
import graft.streaming.FunnelDetector
import graft.streaming.FunnelDetector.FunnelEvent

/** Streaming funnel == the batch q10 semantics, emitted incrementally:
  * a conversion appears exactly once, in the micro-batch where its
  * last leg lands, with the same strict step ordering.
  */
class FunnelDetectorSpec extends SparkSpec {

  test("conversions match the batch funnel; one emission, cross-batch legs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val batch1 = Seq(
      FunnelEvent(1L, "view", 10), FunnelEvent(1L, "click", 20),
      FunnelEvent(2L, "click", 5), FunnelEvent(2L, "view", 8), // click BEFORE view: ignored
      FunnelEvent(3L, "view", 1), FunnelEvent(3L, "click", 2),
      FunnelEvent(3L, "purchase", 3) // full funnel inside one batch
    )
    val batch2 = Seq(
      FunnelEvent(1L, "purchase", 30),   // completes user 1
      FunnelEvent(2L, "click", 12), FunnelEvent(2L, "purchase", 15), // completes user 2
      FunnelEvent(3L, "purchase", 99)    // already converted: no re-emission
    )
    val input = MemoryStream[FunnelEvent]
    val q = FunnelDetector.conversions(input.toDS())
      .writeStream.format("memory").queryName("funnelstream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      val after1 = spark.table("funnelstream").collect()
      assert(after1.map(_.getLong(0)).toSeq == Seq(3L),
        "only the in-batch full funnel converts in batch 1")
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("funnelstream").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      1L -> ((10L, 20L, 30L)),
      2L -> ((8L, 12L, 15L)),
      3L -> ((1L, 2L, 3L))))
    // exactly one emission per user
    assert(spark.table("funnelstream").count() == 3)
    // parity with the batch formulation over the union of all events
    val all = (batch1 ++ batch2).toDS()
    val v = all.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_ms").as("tv"))
    val c = all.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts_ms") > col("tv"))
      .groupBy("user_id").agg(min("ts_ms").as("tc"), min("tv").as("tv"))
    val p = all.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts_ms") > col("tc"))
      .groupBy("user_id").agg(min("ts_ms").as("tp"), min("tv").as("tv"), min("tc").as("tc"))
    val batchTruth = p.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(1))).toMap
    assert(out == batchTruth)
  }
}
