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
      // a final-mode SortAggregate (functions=[min(...)]) must be fed
      // by at least as many partial-mode ones (functions=[partial_...]);
      // counting LINES by mode — not a global line count, which lets a
      // healthy pair mask a partial-less aggregate elsewhere in the plan
      val sortAggLines = p.linesIterator.filter(_.contains("SortAggregate")).toSeq
      val partialSort = sortAggLines.count(_.contains("partial_"))
      val finalSort = sortAggLines.length - partialSort
      if (finalSort > partialSort)
        offenders += s"$n: $finalSort final SortAggregate(s) vs $partialSort partial"
      if (!evalBoundedLiteral(n) && p.linesIterator.exists(_.length > (4 << 20)))
        offenders += s"$n: >4MB plan line (embedded literal?)"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
