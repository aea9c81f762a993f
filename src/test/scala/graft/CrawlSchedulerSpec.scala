package graft

import org.apache.spark.sql.functions._

import graft.operators.CrawlScheduler

/** Rendezvous fetcher assignment + per-domain politeness slotting. */
class CrawlSchedulerSpec extends SparkSpec {

  test("same domain → same fetcher; assignment spreads across the fleet") {
    import spark.implicits._
    val urls = (0 until 400).map(i => (s"d${i % 40}.example.com", s"http://d${i % 40}.example.com/p/$i"))
      .toDF("domain", "url")
    val assigned = CrawlScheduler.assignFetchers(urls, "domain", 8).cache()
    val perDomain = assigned.groupBy("domain")
      .agg(countDistinct(col("fetcher")).as("nf")).collect()
    assert(perDomain.forall(_.getLong(1) == 1L), "a domain must map to exactly one fetcher")
    val used = assigned.select("fetcher").distinct().as[Int].collect().toSet
    assert(used.size >= 5, s"40 domains over 8 fetchers should hit most of the fleet, got $used")
    assert(used.forall(f => f >= 0 && f < 8))
    assigned.unpersist()
  }

  test("rendezvous stability: growing the fleet moves only a minority of domains") {
    import spark.implicits._
    val domains = (0 until 200).map(i => s"host$i.org").toDF("domain")
    val at8 = CrawlScheduler.assignFetchers(domains, "domain", 8)
      .select(col("domain"), col("fetcher").as("f8"))
    val at9 = CrawlScheduler.assignFetchers(domains, "domain", 9)
      .select(col("domain"), col("fetcher").as("f9"))
    val moved = at8.join(at9, "domain").filter(col("f8") =!= col("f9")).count()
    // expected ~200/9 ≈ 22; mod-hashing would move ~178
    assert(moved < 60, s"rendezvous should move ~1/9 of domains, moved $moved")
    // and every moved domain went TO the new fetcher (HRW property)
    val movedWrong = at8.join(at9, "domain")
      .filter(col("f8") =!= col("f9") && col("f9") =!= 8).count()
    assert(movedWrong == 0, "an HRW reassignment can only target the added fetcher")
  }

  test("the HRW fold scores once per DISTINCT domain and joins back; null domains stay null") {
    import spark.implicits._
    val urls = ((0 until 300).map(i => (s"d${i % 10}.com", s"http://d${i % 10}.com/$i")) :+
      ((null: String, "http://orphan/"))).toDF("domain", "url")
    val assigned = CrawlScheduler.assignFetchers(urls, "domain", 6)
    // a null domain has no queue: fetcher must be null, not a phantom id
    val orphan = assigned.filter(col("url") === "http://orphan/").select("fetcher").collect()
    assert(orphan.length == 1 && orphan.head.isNullAt(0))
    // plan shape: the O(nFetchers) scoring fold lives on the DISTINCT
    // side of a join — never re-evaluated per frontier row
    val lp = assigned.queryExecution.optimizedPlan
    val joins = lp.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty, s"expected a distinct-domain join:\n$lp")
    val scored = joins.head.right
    assert(scored.toString.contains("graft_md5_60"),
      s"the fold must sit on the joined (distinct) side:\n$lp")
    assert(scored.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }.isDefined,
      s"the fold's input must be the domain-distinct aggregate:\n$lp")
    assert(!joins.head.left.toString.contains("graft_md5_60"),
      s"no per-row fold on the frontier side:\n$lp")
    // and the values are exactly the per-row formulation's
    val perDomain = assigned.where(col("domain").isNotNull)
      .groupBy("domain").agg(countDistinct(col("fetcher")).as("nf")).collect()
    assert(perDomain.forall(_.getLong(1) == 1L))
  }

  test("capPerDomain: NaN priorities rank FIRST, exactly like the window's DESC ordering") {
    import spark.implicits._
    val rows = Seq(
      ("a.org", "http://a.org/nan1", Some(Double.NaN)),
      ("a.org", "http://a.org/nan2", Some(Double.NaN)),
      ("a.org", "http://a.org/hi", Some(99.0)),
      ("a.org", "http://a.org/lo", Some(1.0)),
      ("a.org", "http://a.org/null", None: Option[Double]))
      .toDF("domain", "url", "priority")
    val capped = CrawlScheduler.capPerDomain(rows, "domain", "url", col("priority"), 3)
      .select("url").as[String].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("domain")).orderBy(col("priority").desc, col("url"))
    val want = rows.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("url").as[String].collect().toSet
    assert(want == Set("http://a.org/nan1", "http://a.org/nan2", "http://a.org/hi"),
      s"window twin drifted: $want") // Spark orders NaN above +Inf
    assert(capped == want, s"cap $capped != window $want")
  }

  test("capPerDomain keeps each domain's top-k by priority, identical to the window formulation") {
    import spark.implicits._
    // 100:1 skew: one mega-domain with 1000 urls, 20 small domains with ~10
    val rows = ((0 until 1000).map(i => ("mega.example.com", f"http://mega.example.com/p/$i%04d", (i % 97).toDouble, s"x$i")) ++
      (0 until 200).map(i => (s"d${i % 20}.org", f"http://d${i % 20}.org/p/$i%04d", (i % 13).toDouble, s"y$i")))
      .toDF("domain", "url", "priority", "extra")
    val capped = CrawlScheduler.capPerDomain(rows, "domain", "url", col("priority"), 25)
    // oracle: the window formulation on the same total order
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("domain")).orderBy(col("priority").desc, col("url"))
    val expected = rows.withColumn("rn", row_number().over(w)).filter(col("rn") <= 25).drop("rn")
    val got = capped.select("domain", "url", "priority", "extra").as[(String, String, Double, String)].collect().toSet
    val want = expected.select("domain", "url", "priority", "extra").as[(String, String, Double, String)].collect().toSet
    assert(got == want)
    assert(capped.filter(col("domain") === "mega.example.com").count() == 25)
    // payload columns ride through untouched
    assert(capped.columns.sorted.toSeq == Seq("domain", "extra", "priority", "url"))
  }

  test("schedule tiebreak column makes duplicate-url slots deterministic") {
    import spark.implicits._
    // same url twice within a domain: without a tiebreaker row_number
    // ties are engine-dependent; with one, slots are pinned
    val urls = Seq(
      ("a.org", "http://a.org/p", 1L), ("a.org", "http://a.org/p", 2L),
      ("a.org", "http://a.org/q", 3L))
      .toDF("domain", "url", "seq")
    val s = CrawlScheduler.schedule(urls, "domain", "url", 4, lit(1000), Seq(col("seq")))
      .select("url", "seq", "slot_ms").as[(String, Long, Long)].collect().toSet
    assert(s == Set(("http://a.org/p", 1L, 0L), ("http://a.org/p", 2L, 1000L),
      ("http://a.org/q", 3L, 2000L)))
  }

  test("slots: fetch k of a domain starts at (k-1)*delay") {
    import spark.implicits._
    val urls = Seq(
      ("a.org", "http://a.org/1"), ("a.org", "http://a.org/2"),
      ("a.org", "http://a.org/3"), ("b.org", "http://b.org/1"))
      .toDF("domain", "url")
    val s = CrawlScheduler.schedule(urls, "domain", "url", 4, lit(1500))
      .select("domain", "url", "slot_ms").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(s == Set(
      ("a.org", "http://a.org/1", 0L), ("a.org", "http://a.org/2", 1500L),
      ("a.org", "http://a.org/3", 3000L), ("b.org", "http://b.org/1", 0L)))
  }
}
