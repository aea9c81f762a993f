package graft

import org.apache.spark.sql.functions._
import graft.sinks.BucketedLayout

/** Pins the co-located-join property: joining two tables bucketed on
  * the join key must not shuffle either side. This is the layout lever
  * for recurring 100 TB fact-to-fact joins — the Exchange the plan
  * would otherwise contain IS the cluster's dominant cost.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join over same-bucketed tables runs with zero Exchange") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a real join (broadcast would hide the exchange question)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      BucketedLayout.writeBucketed(
        Tables.load(spark, sf, "orders"), "b_orders", 8, "o_orderkey")
      BucketedLayout.writeBucketed(
        Tables.load(spark, sf, "lineitem"), "b_lineitem", 8, "l_orderkey")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_quantity"))
      assert(joined.count() > 0)
      joined.collect() // finalize the adaptive plan on THIS queryExecution
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("mismatched bucket counts fall back to shuffling only the mismatched side") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      BucketedLayout.writeBucketed(
        Tables.load(spark, sf, "orders"), "b8_orders", 8, "o_orderkey")
      BucketedLayout.writeBucketed(
        Tables.load(spark, sf, "lineitem"), "b4_lineitem", 4, "l_orderkey")
      val joined = spark.table("b8_orders")
        .join(spark.table("b4_lineitem"), col("o_orderkey") === col("l_orderkey"))
      joined.collect()
      // AQE prints the final AND the initial plan — only the final counts
      val p = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges == 1, s"expected exactly the mismatched side to shuffle:\n$p")
      assert(p.contains("Bucketed: true"), s"the matched side must scan bucketed:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS b8_orders")
      spark.sql("DROP TABLE IF EXISTS b4_lineitem")
    }
  }
}
