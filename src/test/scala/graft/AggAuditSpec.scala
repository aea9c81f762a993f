package graft

/** Repo-wide physical-plan hygiene gate — the sweep form of
  * PlanQualitySpec's per-family pins, run over EVERY declared query's
  * plan at sf0.001. Each property here is a 100 TB design rule whose
  * violation stays invisible at test scale:
  *   - no CartesianProduct anywhere (quadratic shuffle);
  *   - no partial-less aggregation: every SortAggregate family must
  *     have >= 2 stages (a lone one means rows shuffle unreduced —
  *     the countDistinct+string-buffer trap changeStats hit);
  *   - no plan literal above 4 MB except the eval-BOUNDED
  *     contamination sketches (their bound is documented at
  *     Contamination.evalOverlapBloom) — anything else embedding
  *     megabytes in the plan is a driver-merged structure that grows
  *     with the data.
  */
class AggAuditSpec extends SparkSpec {
  test("every query plan: no cartesian, no partial-less sort-agg, no unbounded literal") {
    val evalBoundedLiteral = Set("contamination_bloom")
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
      val p = SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct")) offenders += s"$n: CartesianProduct"
      val sortAggs = p.linesIterator.count(_.contains("SortAggregate"))
      if (sortAggs == 1) offenders += s"$n: single-stage SortAggregate (no partial)"
      if (!evalBoundedLiteral(n) && p.linesIterator.exists(_.length > (4 << 20)))
        offenders += s"$n: >4MB plan line (embedded literal?)"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
