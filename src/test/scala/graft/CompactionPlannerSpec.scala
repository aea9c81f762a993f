package graft

import org.apache.spark.sql.functions._
import graft.sinks.CompactionPlanner

class CompactionPlannerSpec extends SparkSpec {
  import spark.implicits._

  test("order-preserving bin packing: buckets fill to target, oversize isolates") {
    val files = Seq(("a", 40L), ("b", 40L), ("c", 200L), ("d", 10L), ("e", 95L))
      .toDF("k", "bytes")
    val got = CompactionPlanner.plan(files, "k", "bytes", targetBytes = 100L)
      .orderBy("k").select("k", "bucket").as[(String, Long)].collect().toSeq
    // prior sums: a=0, b=40, c=80, d=280, e=290 -> buckets 0,0,0,2,2
    assert(got == Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 2L), ("e", 2L)))
  }

  test("event day files: null ts excluded, bytes = overhead + props length") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "{\"k\":1}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), null.asInstanceOf[String]),
      (3L, null.asInstanceOf[java.sql.Timestamp], "{\"x\":2}"))
      .toDF("event_id", "ts", "props")
    val got = CompactionPlanner.eventDayFiles(ev, "ts", "props")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("2024-01-01", 2 * 64 + 7L)))
  }

  test("pmi: a true collocation outranks frequent-but-independent pairs") {
    import graft.operators.text.TextAnalysis
    // 'new york' always adjacent; 'the'/'cat' frequent but independent
    val docs = (0 until 30).map { i =>
      (i.toLong, s"new york trip $i the cat the dog the bird cat the")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "text", k = 5, minCount = 5)
      .select("w1", "w2").as[(String, String)].collect().toSeq
    assert(got.head == ("new", "york"), s"collocation should rank first, got $got")
  }
}
