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

  test("nullable key: null rows land in exactly one chunk (no loss)") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (if (i % 37 == 0) None else Some(i), i))
      .toDF("k", "payload")
    val chunked = ChunkPlanner.chunkedRead(spark, df, Seq("k"), 5)
    assert(chunked.count() == 1000)
    assert(chunked.select("payload").distinct().count() == 1000)
    // null keys must never be boundary values
    val bs = ChunkPlanner.boundaries(df, Seq("k"), 5)
    assert(bs.forall(b => b.forall(_ != null)))
  }

  test("boundary sequence is monotone under the engine's own ordering") {
    import spark.implicits._
    // mixed-case + non-ASCII strings: driver Comparable (UTF-16 code
    // units) and engine ordering could disagree — boundaries must come
    // back already in engine sort order
    val df = Seq("apple", "Ärger", "zebra", "Banana", "émigré", "ωmega", "banana", "ZEBRA")
      .flatMap(s => (1 to 50).map(i => s + i)).toDF("s")
    val bs = ChunkPlanner.boundaries(df, Seq("s"), 4, sampleTarget = 1000000)
    val fromEngine = df.select(col("s")).orderBy(col("s").asc).collect().map(_.getString(0))
    val idx = bs.map(b => fromEngine.indexOf(b.head.asInstanceOf[String]))
    assert(idx == idx.sorted, s"boundaries not monotone under engine order: $bs")
    val chunked = ChunkPlanner.chunkedRead(spark, df, Seq("s"), 4)
    assert(chunked.count() == df.count())
    assert(chunked.distinct().count() == df.distinct().count())
  }

  test("S4 offset fallback pages cover the table exactly") {
    val qs = ChunkPlanner.offsetFallbackQueries("shop.nokey", None, total = 10500, chunkRows = 4000)
    assert(qs == Seq(
      "SELECT * FROM shop.nokey LIMIT 4000 OFFSET 0",
      "SELECT * FROM shop.nokey LIMIT 4000 OFFSET 4000",
      "SELECT * FROM shop.nokey LIMIT 4000 OFFSET 8000"))
    val filtered = ChunkPlanner.offsetFallbackQueries("t", Some("x > 0"), 1, 100)
    assert(filtered == Seq("SELECT * FROM t WHERE x > 0 LIMIT 100 OFFSET 0"))
  }

  test("predicates are valid pushdown SQL (usable as jdbc predicates)") {
    val li = Tables.load(spark, sf, "lineitem")
    val preds = ChunkPlanner.chunkPredicates(li, Seq("l_orderkey", "l_linenumber"), 4)
    assert(preds.nonEmpty)
    // each predicate must parse and filter independently
    preds.foreach(p => li.filter(expr(p)).count())
  }
}
