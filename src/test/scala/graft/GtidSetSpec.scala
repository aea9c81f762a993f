package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GtidSetAgg, IntervalSet}

/** A5 — interval-set algebra; mirrors the reference's GTID set semantics
  * (`driver/mysql/base/utils.go:387-441`, StringInterval rendering).
  */
class GtidSetSpec extends AnyFunSuite {

  test("add + normalize renders canonical interval string") {
    val s = Seq(1L, 2L, 3L, 5L, 7L, 8L, 9L, 20L).foldLeft(IntervalSet.empty)(_.add(_))
    assert(s.render == "1-3:5:7-9:20")
  }

  test("adjacent and overlapping intervals coalesce on merge") {
    val a = IntervalSet.parse("1-5:10-12")
    val b = IntervalSet.parse("6-9:11-15")
    assert(a.merge(b).render == "1-15")
  }

  test("contains: value and subset") {
    val s = IntervalSet.parse("1-5:8:10-20")
    assert(s.contains(3L) && s.contains(8L) && !s.contains(7L))
    assert(s.contains(IntervalSet.parse("2-4:11-19")))
    assert(!s.contains(IntervalSet.parse("4-9")))
  }

  test("subtract = GtidSetDiff semantics") {
    val s = IntervalSet.parse("1-10")
    assert(s.subtract(IntervalSet.parse("3-5:9")).render == "1-2:6-8:10")
    assert(IntervalSet.parse("5").subtract(IntervalSet.parse("1-10")).render == "")
  }

  test("count") {
    assert(IntervalSet.parse("1-3:7:9-10").count == 6L)
  }

  test("parse round-trips render") {
    val r = "1-3:5:7-9"
    assert(IntervalSet.parse(r).render == r)
  }

  test("aggregator over a DataFrame folds GNOs per group") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 4L), ("b", 7L), ("b", 8L), ("a", 3L))
      .toDF("sid", "gno")
    val out = df.groupBy($"sid").agg(GtidSetAgg.column($"gno").as("set"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "1-4", "b" -> "7-8"))
  }

  test("GtidSetImpAgg matches the encoder-based Aggregator on random GNO streams") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map(_ => (rnd.nextInt(20).toLong, (rnd.nextInt(400) + 1).toLong))
    val df = rows.toDF("sid", "gno").repartition(8)
    val imp = df.groupBy("sid").agg(GtidSetAgg.column(col("gno")).as("s"))
      .as[(Long, String)].collect().toMap
    val ref = df.groupBy("sid").agg(GtidSetAgg.columnViaEncoder(col("gno")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(imp == ref)
    // dense run collapses to one interval
    val dense = (1L to 1000L).map(g => (1L, g)).toDF("sid", "gno")
    val one = dense.groupBy("sid").agg(GtidSetAgg.column(col("gno")).as("s"))
      .as[(Long, String)].collect().head._2
    assert(one == "1-1000")
  }
}
