package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A5 / §2.6 — GTID interval-set algebra (reference
  * `driver/mysql/base/utils.go:387-441` GtidSetDiff,
  * `applier_gtid_executed.go:248-291` compaction,
  * `base/utils.go:203-214` StringInterval).
  *
  * The one genuinely custom aggregate in the engine: fold a set of
  * transaction numbers (GNOs) into a canonical interval-set string
  * "1-5:7:9-12", with contains / union / subtract algebra for
  * exactly-once bookkeeping. Implemented as a typed
  * `Aggregator[Long, IntervalSet, String]` so Spark runs it with
  * map-side partial aggregation — each partition folds its GNOs into a
  * compact interval list before the shuffle, so 10^9 GNOs reduce to a few
  * hundred intervals on the wire.
  */
final case class IntervalSet(intervals: List[(Long, Long)]) {

  def add(v: Long): IntervalSet = merge(IntervalSet(List((v, v))))

  /** Union with normalization: sort, then coalesce overlapping/adjacent. */
  def merge(other: IntervalSet): IntervalSet = {
    val all = (intervals ++ other.intervals).sortBy(_._1)
    val out = all.foldLeft(List.empty[(Long, Long)]) {
      case (Nil, iv) => iv :: Nil
      case (acc @ ((lo, hi) :: rest), (l, h)) =>
        if (l <= hi + 1) (lo, math.max(hi, h)) :: rest else (l, h) :: acc
    }
    IntervalSet(out.reverse)
  }

  def contains(v: Long): Boolean =
    intervals.exists { case (lo, hi) => v >= lo && v <= hi }

  def contains(other: IntervalSet): Boolean =
    other.intervals.forall { case (lo, hi) =>
      intervals.exists { case (l, h) => lo >= l && hi <= h }
    }

  /** this \ other — reference GtidSetDiff computes what the source must
    * resend (`base/utils.go:387`).
    */
  def subtract(other: IntervalSet): IntervalSet = {
    def sub1(iv: (Long, Long), cut: (Long, Long)): List[(Long, Long)] = {
      val (lo, hi) = iv; val (cl, ch) = cut
      if (ch < lo || cl > hi) List(iv)
      else List((lo, cl - 1), (ch + 1, hi)).filter { case (a, b) => a <= b }
    }
    IntervalSet(other.intervals.foldLeft(intervals)((acc, cut) => acc.flatMap(sub1(_, cut))))
  }

  /** Canonical "lo-hi:lo:lo-hi" rendering (reference StringInterval). */
  def render: String =
    intervals.map { case (lo, hi) => if (lo == hi) s"$lo" else s"$lo-$hi" }.mkString(":")

  def count: Long = intervals.map { case (lo, hi) => hi - lo + 1 }.sum
}

object IntervalSet {
  val empty: IntervalSet = IntervalSet(Nil)

  def parse(s: String): IntervalSet =
    if (s == null || s.isEmpty) empty
    else IntervalSet(
      s.split(':').toList.map { part =>
        part.split('-') match {
          case Array(one)     => (one.toLong, one.toLong)
          case Array(lo, hi)  => (lo.toLong, hi.toLong)
          case _ => throw new IllegalArgumentException(s"bad interval: $part")
        }
      }
    ).merge(empty) // normalize
}

/** Typed aggregator: GNO column → interval-set string per group. Usage:
  * `events.groupBy("sid").agg(GtidSetAgg.column(col("gno")))`.
  */
object GtidSetAgg extends Aggregator[Long, IntervalSet, String] {
  def zero: IntervalSet = IntervalSet.empty
  def reduce(b: IntervalSet, a: Long): IntervalSet = b.add(a)
  def merge(b1: IntervalSet, b2: IntervalSet): IntervalSet = b1.merge(b2)
  def finish(r: IntervalSet): String = r.render
  def bufferEncoder: Encoder[IntervalSet] = Encoders.product[IntervalSet]
  def outputEncoder: Encoder[String] = Encoders.STRING

  import org.apache.spark.sql.{Column, functions => F}

  /** The production path: [[GtidSetImpAgg]] (buffer stays a JVM object;
    * the udaf/Aggregator form re-encodes it per row). Registered as
    * `graft_gtid_set` by GraftExtensions.
    */
  def column(gno: Column): Column = F.call_function("graft_gtid_set", gno)

  /** Encoder-based reference form — GtidSetSpec checks the imperative
    * aggregate against it on random inputs.
    */
  def columnViaEncoder(gno: Column): Column = F.udaf(this).apply(gno)
}
