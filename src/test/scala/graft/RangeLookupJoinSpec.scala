package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.RangeLookupJoin

class RangeLookupJoinSpec extends SparkSpec {
  import spark.implicits._

  test("containment semantics: inclusive lo, exclusive hi, empty/null drop") {
    val pts = Seq((1L, 0.0), (2L, 5.0), (3L, 10.0), (4L, -3.0), (5L, Double.NaN))
      .toDF("id", "v").filter(!isnan(col("v"))) // NaN compares false anyway
    val iv = Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0), ("empty", 7.0, 7.0), ("neg", -5.0, 0.0))
      .toDF("tag", "lo", "hi")
    val out = RangeLookupJoin.pointInInterval(pts, iv, "v", "lo", "hi", width = 4.0)
      .select("id", "tag").orderBy("id").collect()
    assert(out.toSeq === Seq(Row(1L, "a"), Row(2L, "a"), Row(3L, "b"), Row(4L, "neg")))
  }

  test("no duplicate matches: every (point, interval) pair meets in one bucket") {
    // wide interval spanning many buckets; overlapping intervals both match
    val pts = Seq((1L, 50.0)).toDF("id", "v")
    val iv = Seq(("wide", 0.0, 1000.0), ("alsowide", 40.0, 60.0)).toDF("tag", "lo", "hi")
    val out = RangeLookupJoin.pointInInterval(pts, iv, "v", "lo", "hi", width = 7.0)
      .select("tag").orderBy("tag").as[String].collect()
    assert(out.toSeq === Seq("alsowide", "wide"))
  }

  test("exclusive bound on a bucket edge claims no extra bucket") {
    // hi = 12 with width 4: buckets 0..2, NOT bucket 3; point 12.0 must miss
    val pts = Seq((1L, 12.0), (2L, 11.999)).toDF("id", "v")
    val iv = Seq(("e", 0.0, 12.0)).toDF("tag", "lo", "hi")
    val out = RangeLookupJoin.pointInInterval(pts, iv, "v", "lo", "hi", width = 4.0)
      .select("id").as[Long].collect()
    assert(out.toSeq === Seq(2L))
  }

  test("reserved _bucket column and runaway intervals are rejected") {
    val pts = Seq((1L, 5.0)).toDF("id", "v")
    val iv = Seq(("a", 0.0, 10.0)).toDF("tag", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeLookupJoin.pointInInterval(pts.withColumn("_bucket", lit(1)), iv, "v", "lo", "hi", 4.0)
    }
    // a catch-all interval must fail loudly, not OOM the explode
    val catchAll = Seq(("all", 0.0, Double.PositiveInfinity)).toDF("tag", "lo", "hi")
    val e = intercept[Exception] {
      RangeLookupJoin.pointInInterval(pts, catchAll, "v", "lo", "hi", 4.0).collect()
    }
    assert(e.getMessage.contains("buckets") || e.getCause != null)
  }

  test("matches the naive inequality join on fixture data") {
    val bands = Tables.load(spark, sf, "nation").select(col("n_name").as("band"),
      (col("n_nationkey") * col("n_nationkey") * 600).cast("double").as("lo"),
      ((col("n_nationkey") + 1) * (col("n_nationkey") + 1) * 600).cast("double").as("hi"))
    val pts = Tables.load(spark, sf, "orders").select(col("o_orderkey"), col("o_totalprice"))
    val fast = RangeLookupJoin.pointInInterval(pts, bands, "o_totalprice", "lo", "hi", 20000.0)
      .select("o_orderkey", "band").orderBy("o_orderkey").collect()
    val naive = pts.join(bands,
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .select("o_orderkey", "band").orderBy("o_orderkey").collect()
    assert(fast.toSeq === naive.toSeq && fast.nonEmpty)
  }

  test("intervalOverlap: exactly-once across shared buckets, half-open edges") {
    // a×x share MANY buckets (both wide) — must still emit once;
    // touching-at-edge pairs (hi == lo) must NOT match (half-open)
    val l = Seq(("a", 0.0, 100.0), ("b", 10.0, 12.0), ("c", 50.0, 51.0))
      .toDF("ltag", "l_lo", "l_hi")
    val r = Seq(("x", 5.0, 95.0), ("y", 12.0, 14.0), ("z", 200.0, 300.0))
      .toDF("rtag", "r_lo", "r_hi")
    val out = RangeLookupJoin.intervalOverlap(l, r, "l_lo", "l_hi", "r_lo", "r_hi", width = 3.0)
      .select("ltag", "rtag").as[(String, String)].collect().sorted
    // b=[10,12) touches y=[12,14) at the edge only: no match
    assert(out.toSeq === Seq(("a", "x"), ("a", "y"), ("b", "x"), ("c", "x")))
  }

  test("intervalOverlap with equiKeys matches the naive per-key overlap join") {
    val l = (1 to 60).map(i => (i % 5L, s"L$i", i * 3.0, i * 3.0 + (i % 7) + 1.0))
      .toDF("k", "ltag", "l_lo", "l_hi")
    val r = (1 to 60).map(i => (i % 5L, s"R$i", i * 2.5, i * 2.5 + (i % 5) + 1.0))
      .toDF("k", "rtag", "r_lo", "r_hi")
    val naive = l.join(r, Seq("k"))
      .filter(col("l_lo") < col("r_hi") && col("r_lo") < col("l_hi"))
      .select("ltag", "rtag").as[(String, String)].collect().toSet
    val fast = RangeLookupJoin.intervalOverlap(l, r, "l_lo", "l_hi", "r_lo", "r_hi",
        width = 4.0, equiKeys = Seq("k"))
      .select("ltag", "rtag").as[(String, String)].collect()
    assert(fast.length == fast.toSet.size, "pair emitted more than once")
    assert(fast.toSet == naive && naive.nonEmpty)
  }
}
