package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{EnrichEvent, EnrichedFact, StreamingEnrich}

/** Streaming temporal enrichment: latest-prior dimension version per
  * fact, O(1) state per key, across micro-batch boundaries.
  */
class StreamingEnrichSpec extends SparkSpec {

  private def dim(key: Long, seq: Long, v: String) =
    EnrichEvent(key, seq, "dim", Some(v), None)
  private def fact(key: Long, seq: Long, id: Long) =
    EnrichEvent(key, seq, "fact", None, Some(id))

  test("facts see the latest at-or-before version; state persists across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EnrichEvent]
    val q = StreamingEnrich.temporalEnrich(input.toDS())
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1, deliberately out of arrival order within the batch:
      // fact@5 arrives before dim@3 but must still see v1
      input.addData(fact(1L, 5, 100), dim(1L, 3, "v1"), fact(1L, 2, 99))
      q.processAllAvailable()
      // batch 2: fact on the same key sees batch 1's state; a newer
      // dim version then takes over; an unrelated key enriches null
      input.addData(fact(1L, 6, 101), dim(1L, 7, "v2"), fact(1L, 8, 102),
        fact(2L, 1, 200))
      q.processAllAvailable()
      val rows = spark.table("enriched").as[EnrichedFact].collect()
        .map(f => f.factId -> ((f.dim, f.dimSeq))).toMap
      assert(rows(99L) === ((None, None)))            // before any version
      assert(rows(100L) === ((Some("v1"), Some(3L)))) // intra-batch disorder resolved
      assert(rows(101L) === ((Some("v1"), Some(3L)))) // state crossed the batch
      assert(rows(102L) === ((Some("v2"), Some(7L)))) // newer version took over
      assert(rows(200L) === ((None, None)))           // key with no dim rows
    } finally q.stop()
  }

  test("seq ties: dim applies before the fact at the same seq; max payload wins deterministically") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EnrichEvent]
    val q = StreamingEnrich.temporalEnrich(input.toDS())
      .writeStream.format("memory").queryName("enriched_ties")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(dim(1L, 5, "a"), dim(1L, 5, "b"), fact(1L, 5, 1))
      q.processAllAvailable()
      val rows = spark.table("enriched_ties").as[EnrichedFact].collect()
      assert(rows.toSeq === Seq(EnrichedFact(1L, 1L, 5L, Some("b"), Some(5L))))
    } finally q.stop()
  }

  test("idle TTL mode: enrichment works with the processing-time timeout armed") {
    // the eviction itself needs wall-clock advance (not deterministic in
    // a spec); this pins that arming the timeout path doesn't disturb
    // the enrichment semantics
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EnrichEvent]
    val q = StreamingEnrich.temporalEnrich(input.toDS(), idleTtlMs = 3600000L)
      .writeStream.format("memory").queryName("enriched_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      // once a processing-time timeout is armed the stream triggers
      // continuously to check deadlines, so processAllAvailable never
      // settles — poll the sink with a deadline instead
      input.addData(dim(1L, 1, "v"), fact(1L, 2, 10))
      input.addData(fact(1L, 3, 11))
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("enriched_ttl").count() < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val rows = spark.table("enriched_ttl").as[EnrichedFact].collect()
        .map(f => f.factId -> f.dim).toMap
      assert(rows === Map(10L -> Some("v"), 11L -> Some("v")))
    } finally q.stop()
  }
}
