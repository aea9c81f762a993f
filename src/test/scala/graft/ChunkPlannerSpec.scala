package graft

import org.apache.spark.sql.functions._
import graft.sources.ChunkPlanner

/** S3/S4 — keyset chunk predicates must partition the table exactly
  * (no loss, no duplication), mirroring the reference chunk walk
  * (`driver/mysql/dumper.go:106-156`).
  */
class ChunkPlannerSpec extends SparkSpec {

  test("greaterThan expands composite-key row comparison") {
    val p = ChunkPlanner.greaterThan(Seq("a", "b"), Seq(5, 7))
    assert(p == "((a > 5) OR (a = 5 AND b > 7))")
  }

  test("string bounds are quoted and escaped") {
    val p = ChunkPlanner.greaterThan(Seq("s"), Seq("o'brien"))
    assert(p == "((s > 'o''brien'))")
  }

  test("chunk predicates cover lineitem exactly once (composite key)") {
    val li = Tables.load(spark, sf, "lineitem")
    val total = li.count()
    val chunked = ChunkPlanner.chunkedRead(spark, li, Seq("l_orderkey", "l_linenumber"), 7)
    assert(chunked.count() == total)
    // (l_orderkey, l_linenumber) is NOT unique in the fixture — rows with
    // a duplicated key still land in exactly one chunk (boundaries are
    // key values), so per-key multiplicities must be preserved
    val orig = li.groupBy("l_orderkey", "l_linenumber").count()
    val got = chunked.groupBy("l_orderkey", "l_linenumber").count()
    assert(got.except(orig).count() == 0 && orig.except(got).count() == 0)
  }

  test("single-column key, more chunks than rows degrades gracefully") {
    import spark.implicits._
    val tiny = Seq(1L, 2L, 3L).toDF("k")
    val chunked = ChunkPlanner.chunkedRead(spark, tiny, Seq("k"), 8)
    assert(chunked.count() == 3)
    assert(chunked.distinct().count() == 3)
  }

  test("predicates are valid pushdown SQL (usable as jdbc predicates)") {
    val li = Tables.load(spark, sf, "lineitem")
    val preds = ChunkPlanner.chunkPredicates(li, Seq("l_orderkey", "l_linenumber"), 4)
    assert(preds.nonEmpty)
    // each predicate must parse and filter independently
    preds.foreach(p => li.filter(expr(p)).count())
  }
}
