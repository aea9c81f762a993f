package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row picks up the payload of the
  * latest right row with the same key and `rightTime <= leftTime`
  * (inclusive), or nulls when no such row exists — the "state at event
  * time" join a CDC/analytics consumer asks constantly (latest order
  * before a click, last config before a metric, nearest prior
  * checkpoint). Beyond-parity §2.4: the reference has no set-oriented
  * join surface at all; DuckDB's native `ASOF JOIN` serves as the
  * oracle.
  *
  * Scale shape (the part that matters at 100 TB): the naive encodings
  * are a range join (Catalyst falls back to BroadcastNestedLoop /
  * cartesian — quadratic) or a per-key `collect_list` (unbounded state
  * on hot keys). This instead unions both sides into one spine,
  * hash-partitions ONCE on the key, sorts within partitions by
  * (time, side), and carries the right payload forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding window — linear
  * work, one Exchange total, no per-key memory beyond the sort spill
  * Spark already manages. Skewed keys ride AQE like any other window.
  *
  * Tie rules: right rows sort before left rows at equal time, so
  * equal-time matches are inclusive (mirrors DuckDB `ON l.t >= r.t`).
  * Several right rows at the same (key, time) are ordered by
  * `rightTiebreak` and the last one wins, making the pick
  * deterministic; rows with null right time can never match and are
  * dropped; left rows with null time sort first and match nothing.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry onto matching left rows
    * @param rightTiebreak orders equal-(key,time) right rows; the max
    *   in the column's natural ordering wins (any orderable type)
    * @param forward false = latest right row at-or-BEFORE the left time
    *   (DuckDB `l.t >= r.t`); true = earliest right row at-or-AFTER it
    *   (`l.t <= r.t`) — "time to next event" attribution. Same single
    *   shuffle; only the in-partition sort direction flips.
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payload: Seq[String],
           rightTiebreak: Option[String] = None,
           forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(leftCols.intersect(payload).isEmpty,
      s"payload ${payload.intersect(leftCols)} collides with left columns")
    val reserved = Seq("_k", "_t", "_side", "_tb", "_p")
    require(leftCols.intersect(reserved).isEmpty,
      s"left columns ${leftCols.intersect(reserved)} collide with as-of internals")

    // the payload travels as ONE struct so a null payload *value* can
    // never tear a row apart (per-column last(ignoreNulls) would skip
    // back to an older right row for just that column)
    // null keys must not match each other (SQL equi-join semantics:
    // NULL = NULL is no match) — drop null-key right rows so a
    // null-key left row rides its partition alone and carries nulls.
    // The left side's _tb sentinel is a typed null so any orderable
    // tiebreak type (timestamp, string, numeric) unions cleanly; left
    // rows never compete on _tb anyway (_side separates them first)
    val tb = rightTiebreak.map(col).getOrElse(lit(0L))
    val tbLeft = rightTiebreak
      .map(c => lit(null).cast(right.schema(c).dataType))
      .getOrElse(lit(0L))
    val r = right.filter(col(rightTime).isNotNull && col(rightKey).isNotNull).select(
      (Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
        tb.as("_tb"), struct(payload.map(col): _*).as("_p")) ++
        leftCols.map(c => lit(null).as(c))): _*)
    val l = left.select(
      (Seq(col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
        tbLeft.as("_tb"), lit(null).cast(r.schema("_p").dataType).as("_p")) ++
        leftCols.map(col)): _*)

    // one shuffle: partition by key, in-partition sort by (time, side,
    // tiebreak); window frame is unbounded-preceding so the sort is
    // reused, never re-shuffled. Forward mode walks time descending, so
    // "last seen right row" = the earliest one at-or-after the left
    // time; nulls still sort first so a null left time matches nothing
    val tOrder = if (forward) col("_t").desc_nulls_first else col("_t").asc_nulls_first
    val w = Window.partitionBy(col("_k"))
      .orderBy(tOrder, col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col("_p." + p).as(p)): _*)
  }

  /** BOTH directions over ONE spine: each left row picks up the latest
    * right row at-or-BEFORE its time AND the earliest at-or-AFTER it —
    * the "nearest capture / nearest event" primitive (the caller
    * compares the two distances). Payload columns come back suffixed
    * `_before` / `_after`, null on a side with no right row.
    *
    * Scale shape: the two directions share the union spine and its ONE
    * hash Exchange — running [[asOf]] twice would shuffle the right
    * side (the big side: an archive index, an event log) twice and
    * re-shuffle the half-joined left a third time. The two window
    * passes order the same partitions opposite ways, so Spark reuses
    * the exchange and pays only the second in-partition sort. Tie
    * rules match [[asOf]] exactly in both directions (equal-time right
    * rows are inclusive on BOTH sides; `rightTiebreak`'s max wins).
    */
  def asOfBoth(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               payload: Seq[String],
               rightTiebreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val suffixed = payload.flatMap(p => Seq(p + "_before", p + "_after"))
    require(leftCols.intersect(suffixed).isEmpty,
      s"suffixed payload ${suffixed.intersect(leftCols)} collides with left columns")
    val reserved = Seq("_k", "_t", "_side", "_tb", "_p", "_pb", "_pf")
    require(leftCols.intersect(reserved).isEmpty,
      s"left columns ${leftCols.intersect(reserved)} collide with as-of internals")
    val tb = rightTiebreak.map(col).getOrElse(lit(0L))
    val tbLeft = rightTiebreak
      .map(c => lit(null).cast(right.schema(c).dataType))
      .getOrElse(lit(0L))
    val r = right.filter(col(rightTime).isNotNull && col(rightKey).isNotNull).select(
      (Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
        tb.as("_tb"), struct(payload.map(col): _*).as("_p")) ++
        leftCols.map(c => lit(null).as(c))): _*)
    val l = left.select(
      (Seq(col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
        tbLeft.as("_tb"), lit(null).cast(r.schema("_p").dataType).as("_p")) ++
        leftCols.map(col)): _*)
    // same partitioning, opposite in-partition orders — the asc pass is
    // asOf's backward walk, the desc pass its forward walk; both keep
    // right rows BEFORE left rows at equal time (inclusive matches)
    val wBack = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc_nulls_first, col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col("_k"))
      .orderBy(col("_t").desc_nulls_first, col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("_pb", last(col("_p"), ignoreNulls = true).over(wBack))
      .withColumn("_pf", last(col("_p"), ignoreNulls = true).over(wFwd))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("_pb." + p).as(p + "_before")) ++
        payload.map(p => col("_pf." + p).as(p + "_after")): _*)
  }
}
