package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.WindowedStats

/** O9 — event-time windows + watermark late-data semantics through real
  * Structured Streaming (MemoryStream → windowed agg → memory sink).
  */
class WindowedStatsSpec extends SparkSpec {

  private def ts(minute: Int) = new Timestamp(3600_000L + minute * 60_000L)

  test("streaming tumbling window finalizes when the watermark passes; late rows are dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "k", "v")
    val q = WindowedStats.windowedCounts(df, "ts", "k", "v", "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("winout").outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(1), 1L, 1.0), (ts(2), 1L, 2.0), (ts(11), 1L, 4.0))
      q.processAllAvailable()
      // watermark = 11min - 5min = 6min: window [0,10) not yet closed in
      // the same micro-batch — append emits it once the NEXT batch sees
      // the advanced watermark
      input.addData((ts(40), 2L, 8.0)) // pushes watermark to 35min
      q.processAllAvailable()
      val closed = spark.table("winout")
        .select("k", "n_events", "sum_value").as[(Long, Long, Double)].collect().toSet
      assert(closed.contains((1L, 2L, 3.0))) // [0,10) window: rows at 1,2min
      assert(closed.contains((1L, 1L, 4.0))) // [10,20)
      // a late row behind the watermark must be DROPPED, not re-opened
      input.addData((ts(3), 1L, 99.0))
      input.addData((ts(80), 2L, 1.0)) // advance again so anything pending flushes
      q.processAllAvailable()
      val all = spark.table("winout").select("sum_value").as[Double].collect()
      assert(!all.contains(99.0) && !all.contains(102.0))
    } finally q.stop()
  }

  test("session windows fold events within the gap") {
    import spark.implicits._
    val df = Seq(
      (ts(0), 1L, 1.0), (ts(2), 1L, 1.0), (ts(3), 1L, 1.0), // one session
      (ts(30), 1L, 1.0),                                    // second session
      (ts(1), 2L, 1.0)
    ).toDF("ts", "k", "v")
    val out = WindowedStats.sessionCounts(df, "ts", "k", gap = "5 minutes")
      .select("k", "n_events").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 3L), (1L, 1L), (2L, 1L)))
  }
}
