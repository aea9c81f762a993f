package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.text.TextAnalysis

/** The Gopher gate over real Structured Streaming: a stateless per-row
  * projection must produce EXACTLY the batch rows, micro-batch by
  * micro-batch — the batch/stream unification the curation front-door
  * relies on (score at ingest, not in a nightly sweep).
  */
class StreamingQualityGateSpec extends SparkSpec {

  test("streaming gate rows == batch gate rows, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val good = ("the quick brown foxes jumped over the lazy dogs and " +
      "that was fine because they have been with friends near the river " +
      "where tall trees grow and birds sing songs every single morning ").trim
    val rows = Seq(
      1L -> good, 2L -> "too short", 3L -> (good + " extra words here"),
      4L -> Seq.fill(60)("a").mkString(" "), 5L -> "")
    val input = MemoryStream[(Long, String)]
    val gated = TextAnalysis.gopherGate(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = gated.writeStream.format("memory").queryName("sgate")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sgate").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val batch = TextAnalysis.gopherGate(
        rows.toDF("doc_id", "text"), "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(streamed == batch)
    assert(streamed.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }
}
