package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._
import graft.operators.TableStats
import graft.streaming.CorpusMonitor

/** Streaming monitors == their batch forms, micro-batch by micro-batch:
  * the sketch state is the fixed cell grid / bounded bin table, so the
  * stream can run forever without state growth.
  */
class StreamingMonitorSpec extends SparkSpec {

  test("streaming count-min cells == batch sketch over the stream prefix") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val words = Seq("the", "cat", "sat", "the", "mat", "the", "dog", "cat")
    val input = MemoryStream[String]
    val q = CorpusMonitor.streamingCmSketch(
        input.toDF().toDF("token"), "token", depth = 3, width = 16)
      .writeStream.format("memory").queryName("cmstream")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(words.take(3): _*)
      q.processAllAvailable()
      input.addData(words.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    // memory sink in Update mode keeps every emitted version; the live
    // state is the LAST row per cell
    val streamed = spark.table("cmstream")
      .groupBy("cm_row", "cm_bucket").agg(max("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = TableStats.cmSketch(words.toDF("token"), "token", depth = 3, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch && batch.nonEmpty)
  }

  test("cm sketch state survives a checkpointed restart (counts keep accumulating)") {
    import spark.implicits._
    val src = graft.TempDirs.scratch("graft-cm-src")
    val ckpt = graft.TempDirs.scratch("graft-cm-ckpt")
    val cells = scala.collection.concurrent.TrieMap[(Int, Long), Long]()
    def run(): Unit = {
      val q = CorpusMonitor.streamingCmSketch(
          spark.readStream.schema("token string").parquet(src), "token",
          depth = 3, width = 16)
        .writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => cells((r.getInt(0), r.getLong(1))) = r.getLong(2))
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    val batch1 = Seq("the", "cat", "the"); val batch2 = Seq("the", "dog", "cat", "cat")
    batch1.toDF("token").write.mode("append").parquet(src)
    run()
    batch2.toDF("token").write.mode("append").parquet(src)
    run() // fresh query, same checkpoint: state store must carry the counts
    val expect = TableStats.cmSketch((batch1 ++ batch2).toDF("token"), "token", 3, 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells.toMap == expect)
  }

  test("per-batch drift against a static baseline == batch psiDrift of each slice") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val baseline = (1 to 200).map(i => ("s", i % 8L)).toDF("g", "v")
    val slice1 = (1 to 50).map(i => ("s", i % 8L))     // same shape: tiny PSI
    val slice2 = (1 to 50).map(i => ("s", 7L))         // collapsed: large PSI
    val seen = scala.collection.mutable.Map[Long, Long]()
    val input = MemoryStream[(String, Long)]
    val q = CorpusMonitor.driftAgainstBaseline(
        input.toDF().toDF("g", "v"), baseline, "g", col("v"),
        (id, rows) => seen.synchronized { seen(id) = rows.head.getLong(4) })
      .queryName("driftstream").start()
    try {
      input.addData(slice1: _*)
      q.processAllAvailable()
      input.addData(slice2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val expect1 = TableStats.psiDrift(baseline, slice1.toDF("g", "v"), "g", col("v"))
      .collect().head.getLong(4)
    val expect2 = TableStats.psiDrift(baseline, slice2.toDF("g", "v"), "g", col("v"))
      .collect().head.getLong(4)
    assert(seen.toMap == Map(0L -> expect1, 1L -> expect2))
    assert(expect2 > 200000L && expect1 < expect2,
      s"collapsed slice must alarm: $expect1 vs $expect2")
  }
}
