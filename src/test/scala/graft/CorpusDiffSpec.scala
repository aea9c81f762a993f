package graft

import org.apache.spark.sql.Row
import graft.operators.CorpusDiff

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added/removed/modified/unchanged; normalization churn is not a change") {
    val oldV = Seq(
      (1L, Option("alpha beta")),
      (2L, Option("gamma delta")),
      (3L, Option("kept  EXACTLY")),          // whitespace+case churn only
      (5L, Option.empty[String])               // null content both sides
    ).toDF("doc_id", "text")
    val newV = Seq(
      (2L, Option("gamma delta EDITED")),
      (3L, Option("Kept exactly")),
      (4L, Option("brand new")),
      (5L, Option.empty[String])
    ).toDF("doc_id", "text")
    val out = CorpusDiff.diff(oldV, newV, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.toSeq === Seq(
      Row(1L, "removed"),
      Row(2L, "modified"),
      Row(3L, "unchanged"),   // normText collapses the churn
      Row(4L, "added"),
      Row(5L, "unchanged")))  // null === null via the sentinel digest
  }

  test("diffStats aggregates the classification") {
    val oldV = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val newV = Seq((2L, "b2"), (3L, "c")).toDF("doc_id", "text")
    val m = CorpusDiff.diffStats(oldV, newV, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("removed" -> 1L, "modified" -> 1L, "added" -> 1L))
  }
}
