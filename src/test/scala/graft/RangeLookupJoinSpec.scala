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
}
