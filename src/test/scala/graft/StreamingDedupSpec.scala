package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingDedup

/** Streaming first-wins dedup through real Structured Streaming
  * (MemoryStream → dropDuplicatesWithinWatermark → memory sink).
  */
class StreamingDedupSpec extends SparkSpec {

  private def ts(minute: Int) = new Timestamp(3600_000L + minute * 60_000L)

  test("indexedIngest: stream grows the shared index; later near-copies drop") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = graft.TempDirs.scratch("graft-ingest")
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[(Long, String)]
    val base = "the quick brown fox jumps over the lazy dog again and again in the yard"
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(StreamingDedup.indexedIngest(s"$dir/idx", "doc_id", "text") {
        (df, _) => accepted.synchronized {
          accepted ++= df.select("doc_id").as[Long].collect() }
      })
      .start()
    try {
      input.addData((1L, base),
        (2L, "completely different content about spark engines and columnar parquet files"))
      q.processAllAvailable()
      // batch 2: a near-copy of doc 1 (one word appended) + a fresh doc
      input.addData((3L, base + " tonight"),
        (4L, "unrelated new text describing streaming state stores and watermark semantics"))
      q.processAllAvailable()
      assert(accepted.toSet == Set(1L, 2L, 4L), s"got ${accepted.toSet}")
      // the shared index holds exactly the accepted docs' signatures —
      // the batch path reads the same files
      val indexed = spark.read.parquet(s"$dir/idx/sigs").select("doc_id").as[Long].collect().toSet
      assert(indexed == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("first copy wins; duplicates across micro-batches are dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Timestamp)]
    val df = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedup.firstWins(df, "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("sdedup").outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, "alpha beta", ts(0)), (2L, "Alpha   beta", ts(1)), (3L, "gamma", ts(1)))
      q.processAllAvailable()
      // batch 2: another normalized-equal copy, still within the watermark
      input.addData((4L, "ALPHA BETA", ts(2)), (5L, "delta", ts(3)))
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L, 5L), s"got $ids")
    } finally q.stop()
  }

  test("nearFirstWins drops simhash-colliding near copies, keeps distinct docs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val input = MemoryStream[(Long, String, Timestamp)]
    val df = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedup.nearFirstWins(df, "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("sneardedup").outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, base, ts(0)))
      q.processAllAvailable()
      // same token multiset, different whitespace/case -> same fingerprint
      input.addData((2L, base.toUpperCase + "  ", ts(1)),
        (3L, "completely different content about databases and engines", ts(1)))
      q.processAllAvailable()
      val ids = spark.table("sneardedup").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("state expires past the watermark horizon: an old fingerprint re-admits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Timestamp)]
    val df = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedup.firstWins(df, "text", "ts", "5 minutes")
      .writeStream.format("memory").queryName("sdedup2").outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, "omega", ts(0)))
      q.processAllAvailable()
      // push the watermark far past ts(0)+5min, expiring the state row
      input.addData((2L, "filler", ts(60)))
      q.processAllAvailable()
      // same content again, long after the horizon: state is gone, row re-admits
      input.addData((3L, "omega", ts(61)))
      q.processAllAvailable()
      val ids = spark.table("sdedup2").select("doc_id").as[Long].collect().toSet
      assert(ids.contains(1L) && ids.contains(3L), s"got $ids")
    } finally q.stop()
  }
}
