package graft

import org.apache.spark.sql.functions._
import graft.operators.SeqPacking

class SeqPackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("packs greedily in id order within each shard") {
    // tokens: 3, 3, 3, 3 with budget 7 -> windows [0,0],[1,1]
    val d = docs(
      (1L, "a b c", "s1"), (2L, "d e f", "s1"),
      (3L, "g h i", "s1"), (4L, "j k l", "s1"))
    val got = SeqPacking.pack(d, "doc_id", "text", "source", 7)
      .collect().sortBy(_.doc_id).map(p => (p.doc_id, p.n_tokens, p.window_idx))
    assert(got.toSeq == Seq((1L, 3, 0L), (2L, 3, 0L), (3L, 3, 1L), (4L, 3, 1L)))
  }

  test("a doc filling the budget exactly closes the window") {
    val d = docs((1L, "a b c d", "s"), (2L, "e", "s"))
    val got = SeqPacking.pack(d, "doc_id", "text", "source", 4)
      .collect().sortBy(_.doc_id).map(p => (p.doc_id, p.window_idx))
    assert(got.toSeq == Seq((1L, 0L), (2L, 1L)))
  }

  test("over-budget docs are clamped and occupy a window alone") {
    val d = docs((1L, "a b c d e f g h", "s"), (2L, "x", "s"), (3L, "y z", "s"))
    val got = SeqPacking.pack(d, "doc_id", "text", "source", 3)
      .collect().sortBy(_.doc_id).map(p => (p.doc_id, p.n_tokens, p.window_idx))
    assert(got.toSeq == Seq((1L, 3, 0L), (2L, 1, 1L), (3L, 2, 1L)))
  }

  test("shards pack independently; empty text counts zero tokens") {
    val d = docs((1L, "a b", "s1"), (2L, "", "s2"), (3L, "c d", "s2"))
    val got = SeqPacking.pack(d, "doc_id", "text", "source", 2)
      .collect().map(p => (p.shard, p.doc_id, p.n_tokens, p.window_idx)).toSet
    assert(got == Set(("s1", 1L, 2, 0L), ("s2", 2L, 0, 0L), ("s2", 3L, 2, 0L)))
  }

  test("null text and null shard survive: 0 tokens, nulls pack as their own shard") {
    val d = Seq(
      (1L, null.asInstanceOf[String], "s1"), (2L, "a b", "s1"),
      (3L, "c d", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")
    val got = SeqPacking.pack(d, "doc_id", "text", "source", 2)
      .collect().map(p => (Option(p.shard), p.doc_id, p.n_tokens, p.window_idx)).toSet
    assert(got == Set(
      (Some("s1"), 1L, 0, 0L), (Some("s1"), 2L, 2, 0L),
      (None, 3L, 2, 0L)))
  }

  test("fixture invariants: fill <= budget, contiguous window ids, total preserved") {
    val d = Tables.load(spark, sf, "documents")
    val packed = SeqPacking.pack(d, "doc_id", "text", "source", 256).toDF()
    val stats = SeqPacking.packStats(packed, 256)
    assert(stats.filter(col("window_tokens") > 256).isEmpty, "window over budget")
    // window ids are 0..max contiguous per shard
    val bad = stats.groupBy("shard")
      .agg(max("window_idx").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n") - 1)
    assert(bad.isEmpty, "non-contiguous window ids")
    // every doc appears exactly once
    assert(packed.count() == d.count())
    // matches a driver-side reference fold per shard
    val ref = d.select(col("source"), col("doc_id"),
        least(graft.operators.text.TextAnalysis.tokenCount(col("text")), lit(256)).as("ntok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).iterator.flatMap { case (shard, rows) =>
        var acc = 0L; var win = 0L
        rows.sortBy(_._2).map { case (_, id, ntok) =>
          if (acc + ntok > 256) { win += 1; acc = ntok.toLong } else acc += ntok
          (shard, id) -> win
        }
      }.toMap
    val got = packed.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == ref)
  }
}
