package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "k1"), // after r@5 and r@10 -> ties to r@10 (inclusive)
    (2L, 7L, "k1"),  // between 5 and 10 -> r@5
    (3L, 4L, "k1"),  // before every right row -> null
    (4L, 99L, "k2"), // key with no right rows at all -> null
    (5L, 10L, "k3")  // tie at t=10 with two right rows -> max tiebreak wins
  ).toDF("id", "t", "k")

  private def right = Seq(
    ("k1", 5L, 100L, "a"),
    ("k1", 10L, 200L, "b"),
    ("k3", 10L, 300L, "c"),
    ("k3", 10L, 400L, "d")
  ).toDF("k", "rt", "ord", "tag")

  private def run = AsOfJoin.asOf(left, right, "k", "k", "t", "rt",
    payload = Seq("ord", "tag"), rightTiebreak = Some("ord"))
    .orderBy("id").collect()

  test("backward inclusive match, no-match nulls, tiebreak determinism") {
    assert(run.toSeq === Seq(
      Row(1L, 10L, "k1", 200L, "b"),
      Row(2L, 7L, "k1", 100L, "a"),
      Row(3L, 4L, "k1", null, null),
      Row(4L, 99L, "k2", null, null),
      Row(5L, 10L, "k3", 400L, "d")
    ))
  }

  test("null right time never matches; null left time matches nothing") {
    val l = Seq((1L, Option(5L), "k"), (2L, Option.empty[Long], "k")).toDF("id", "t", "k")
    val r = Seq(("k", Option(3L), 1L), ("k", Option.empty[Long], 9L)).toDF("k", "rt", "ord")
    val out = AsOfJoin.asOf(l, r, "k", "k", "t", "rt", payload = Seq("ord"))
      .orderBy("id").collect()
    assert(out.toSeq === Seq(Row(1L, 5L, "k", 1L), Row(2L, null, "k", null)))
  }

  test("forward mode: earliest at-or-after right row, inclusive, nulls when none follow") {
    val l = Seq((1L, 5L, "k"), (2L, 10L, "k"), (3L, 11L, "k")).toDF("id", "t", "k")
    val r = Seq(("k", 7L, 70L), ("k", 10L, 100L)).toDF("k", "rt", "ord")
    val out = AsOfJoin.asOf(l, r, "k", "k", "t", "rt",
      payload = Seq("ord"), forward = true).orderBy("id").collect()
    assert(out.toSeq === Seq(
      Row(1L, 5L, "k", 70L),   // next at-or-after 5 is rt=7
      Row(2L, 10L, "k", 100L), // inclusive at equal time
      Row(3L, 11L, "k", null)  // nothing follows
    ))
  }

  test("forward mode: equal-(key,time) right ties resolve to max tiebreak") {
    // two right rows at the exact same (k, rt) ahead of the probe: the
    // operator must pick max(ord), the same total order the oracle's
    // QUALIFY ... ORDER BY ord DESC dedupe imposes before DuckDB's ASOF
    val l = Seq((1L, 5L, "k"), (2L, 10L, "k")).toDF("id", "t", "k")
    val r = Seq(("k", 10L, 300L), ("k", 10L, 400L), ("k", 20L, 500L))
      .toDF("k", "rt", "ord")
    val out = AsOfJoin.asOf(l, r, "k", "k", "t", "rt",
      payload = Seq("ord"), rightTiebreak = Some("ord"), forward = true)
      .orderBy("id").collect()
    assert(out.toSeq === Seq(
      Row(1L, 5L, "k", 400L),  // earliest at-or-after is the rt=10 pair; max ord wins
      Row(2L, 10L, "k", 400L)  // inclusive tie at equal time, same dedup winner
    ))
  }

  test("non-numeric tiebreak columns work (typed null sentinel on the left)") {
    val l = Seq((1L, 10L, "k")).toDF("id", "t", "k")
    val r = Seq(("k", 10L, 1L, "alpha"), ("k", 10L, 2L, "beta"))
      .toDF("k", "rt", "ord", "name")
    // string tiebreak: lexicographic max "beta" wins
    val out = AsOfJoin.asOf(l, r, "k", "k", "t", "rt",
      payload = Seq("ord"), rightTiebreak = Some("name")).collect()
    assert(out.toSeq === Seq(Row(1L, 10L, "k", 2L)))
  }

  test("null keys never match each other (NULL = NULL is no match)") {
    val l = Seq((1L, 5L, Option.empty[String]), (2L, 5L, Option("k")))
      .toDF("id", "t", "k")
    val r = Seq((Option.empty[String], 3L, 9L), (Option("k"), 3L, 1L))
      .toDF("k", "rt", "ord")
    val out = AsOfJoin.asOf(l, r, "k", "k", "t", "rt", payload = Seq("ord"))
      .orderBy("id").collect()
    assert(out.toSeq === Seq(Row(1L, 5L, null, null), Row(2L, 5L, "k", 1L)))
  }

  test("a null payload VALUE does not tear the row back to an older match") {
    // r@10 carries (ord=200, tag=null); the event at t=12 must see that
    // whole row, not ord=200 with tag resurrected from r@5
    val l = Seq((1L, 12L, "k")).toDF("id", "t", "k")
    val r = Seq(("k", 5L, 100L, Option("a")), ("k", 10L, 200L, Option.empty[String]))
      .toDF("k", "rt", "ord", "tag")
    val out = AsOfJoin.asOf(l, r, "k", "k", "t", "rt", payload = Seq("ord", "tag")).collect()
    assert(out.toSeq === Seq(Row(1L, 12L, "k", 200L, null)))
  }

  test("asOfBoth: backward AND forward matches over one spine, tie rules match asOf") {
    val both = AsOfJoin.asOfBoth(left, right, "k", "k", "t", "rt",
      payload = Seq("ord", "tag"), rightTiebreak = Some("ord"))
      .orderBy("id").collect()
    assert(both.toSeq === Seq(
      // t=10: inclusive on BOTH sides (r@10 is at-or-before AND at-or-after)
      Row(1L, 10L, "k1", 200L, "b", 200L, "b"),
      // t=7: before=r@5, after=r@10
      Row(2L, 7L, "k1", 100L, "a", 200L, "b"),
      // t=4: nothing before, r@5 after
      Row(3L, 4L, "k1", null, null, 100L, "a"),
      // no right rows for k2 at all
      Row(4L, 99L, "k2", null, null, null, null),
      // equal-(key,time) right ties: max tiebreak wins in BOTH directions
      Row(5L, 10L, "k3", 400L, "d", 400L, "d")
    ))
    // agreement witness: asOfBoth's two sides equal two separate asOf passes
    val b = AsOfJoin.asOf(left, right, "k", "k", "t", "rt",
      payload = Seq("ord"), rightTiebreak = Some("ord")).orderBy("id")
      .collect().map(_.getAs[Any]("ord")).toSeq
    val f = AsOfJoin.asOf(left, right, "k", "k", "t", "rt",
      payload = Seq("ord"), rightTiebreak = Some("ord"), forward = true).orderBy("id")
      .collect().map(_.getAs[Any]("ord")).toSeq
    assert(both.map(_.getAs[Any]("ord_before")).toSeq === b)
    assert(both.map(_.getAs[Any]("ord_after")).toSeq === f)
    // ONE exchange total: both window passes share the spine's shuffle
    val plan = AsOfJoin.asOfBoth(left, right, "k", "k", "t", "rt",
      payload = Seq("ord"), rightTiebreak = Some("ord"))
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(exchanges <= 1, s"the two directions must share the spine shuffle:\n$plan")
  }

  test("matches a sort-merge left join computed the quadratic way") {
    // independent witness on fixture data: per-event argmax via window
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"))
      .filter(col("event_id") < 500)
    val ord = Tables.load(spark, sf, "orders").filter(col("o_custkey") < 100)
    val fast = AsOfJoin.asOf(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate",
      payload = Seq("o_orderkey"), rightTiebreak = Some("o_orderkey"))
    val naive = ev.join(ord, ev("user_id") === ord("o_custkey") &&
        ev("ts") >= ord("o_orderdate"), "left")
      .groupBy(col("event_id"), col("ts"), col("user_id"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
      .select(col("event_id"), col("ts"), col("user_id"), col("m.o_orderkey").as("o_orderkey"))
    assert(fast.orderBy("event_id").collect().toSeq ===
      naive.orderBy("event_id").collect().toSeq)
  }
}
