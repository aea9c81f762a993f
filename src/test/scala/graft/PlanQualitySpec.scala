package graft

import org.apache.spark.sql.functions._

/** Guards the physical-plan properties the 100 TB design depends on —
  * a regression here is a scale bug even when results stay correct.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q2_join_enrich broadcasts the dimension sides") {
    val p = plan("q2_join_enrich")
    assert(p.contains("BroadcastHashJoin"), "dimension joins must broadcast")
  }

  test("filters push down to the parquet scan") {
    val df = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 1000.0)
      .select(col("o_orderkey"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,1000.0)]"), p)
  }

  test("column pruning reaches the scan (ReadSchema carries only used columns)") {
    val df = Tables.load(spark, sf, "lineitem").select(col("l_orderkey"), col("l_quantity"))
    val p = df.queryExecution.executedPlan.toString
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_extendedprice"), s"pruned column still read: $read")
  }

  test("no dedup/similarity plan contains a cartesian or nested-loop join") {
    for (q <- Seq("dedup_ngram", "dedup_minhash", "dedup_simhash", "sim_lsh_topk")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("hot expressions stay inside whole-stage codegen") {
    // the shingling scan stage of ngram dedup must be codegen'd (the
    // native graft_shingles expression, not an interpreted HOF chain)
    val df = SparkEntry.queries("dedup_ngram")(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_shingles"),
      "native shingles expression missing from plan")
    // the inferred-filter rule would re-run graft_shingles per row in a
    // duplicate pre-Generate predicate — excluded in GraftSession
    assert("graft_shingles".r.findAllIn(optimized).length == 1,
      "graft_shingles must be evaluated exactly once per row")
    // WSCG annotations only exist on the finalized adaptive plan, and
    // only this df's own queryExecution finalizes on collect (a write
    // wraps the plan in a fresh execution)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"))
    assert(finalPlan.contains("*("), "no WholeStageCodegen stages (\"*(n)\" markers) at all?")
  }

  test("stop-at-gtid filter is a pushable BETWEEN disjunction, not a UDF") {
    val p = plan("o11_stop_at_gtid")
    assert(!p.toLowerCase.contains("scalaudf"), "interval filter must not be a UDF")
    assert(p.contains("PushedFilters: [Or(And(GreaterThanOrEqual(event_id,1)"), p)
  }

  test("q1 aggregate is partial (map-side combine) before the exchange") {
    val p = plan("q1_agg")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate, got $hashAggs")
  }
}
