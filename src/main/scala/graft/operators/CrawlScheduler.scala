package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fetch scheduling for a crawl frontier — the step between "which
  * URLs" (pipeline_frontier) and the fetchers: host-level politeness
  * requires ONE queue per registrable domain, so domains must map
  * stably to fetchers and fetches within a domain must be spaced by
  * its crawl delay.
  *
  * Fetcher assignment is rendezvous hashing (highest-random-weight):
  * score(domain, f) = md5-top-60-bits of `domain|f`, fetcher with the
  * max score wins. Unlike `hash(domain) % n`, resizing the fleet from
  * n to n+1 moves only ~1/(n+1) of domains — the property that keeps
  * per-host queues (and their politeness clocks) stable through
  * scale-ups. The O(nFetchers) scoring fold runs once per DISTINCT
  * domain and joins back — domains repeat heavily within a frontier
  * batch (politeness caps rows per domain at k, but k·domains rows
  * still re-derive nothing), so the fold's work drops by the
  * per-domain multiplicity at zero semantic cost.
  *
  * Slotting is one window per domain partition: fetch k of a domain
  * gets start offset (k-1)·delay — the shuffle is keyed on the
  * (bounded-cardinality) domain, never on URLs.
  */
object CrawlScheduler {

  /** Add an integer `fetcher` column (0-based) via rendezvous hashing
    * over `nFetchers` fetchers. Deterministic, cross-engine portable
    * (the md5-prefix chain every sketch here uses). Scored on the
    * distinct-domain side of a join (see class doc); a NULL domain
    * surfaces as a NULL fetcher (the join can't match it), never a
    * phantom queue id.
    */
  def assignFetchers(df: DataFrame, domainCol: String, nFetchers: Int): DataFrame = {
    require(nFetchers > 0, "need at least one fetcher")
    val scored = df.select(col(domainCol)).where(col(domainCol).isNotNull).distinct()
      .withColumn("fetcher", expr(
        s"""aggregate(
           |  transform(sequence(0, ${nFetchers - 1}),
           |    f -> struct(graft_md5_60(concat($domainCol, '|', cast(f as string))) as s,
           |                f as id)),
           |  struct(cast(-1 as bigint) as s, cast(-1 as int) as id),
           |  (acc, x) -> if(x.s > acc.s, x, acc)).id""".stripMargin))
    df.join(scored, Seq(domainCol), "left")
  }

  /** Politeness schedule: assign fetchers, then give fetch k of each
    * domain the start slot (k-1)·delay. The window orders by `urlCol`
    * plus any `tiebreak` columns — pass one whenever URLs can repeat
    * within a domain (a frontier that didn't dedup), or `row_number`
    * ties make relative slots nondeterministic across runs/engines.
    * `delayMsCol` is per-row (usually a per-domain crawl-delay joined
    * from robots.txt; constant via `lit`).
    *
    * Feed this from [[capPerDomain]] at scale: the window partition is
    * then at most k rows per domain, so no mega-domain ever
    * single-task-sorts its whole frontier here.
    */
  def schedule(frontier: DataFrame, domainCol: String, urlCol: String,
      nFetchers: Int, delayMsCol: Column, tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(col(domainCol)).orderBy(col(urlCol) +: tiebreak: _*)
    assignFetchers(frontier, domainCol, nFetchers)
      .withColumn("slot_ms",
        (row_number().over(w) - 1).cast("long") * delayMsCol.cast("long"))
  }

  /** Bound each domain's fetch batch to its `k` highest-priority URLs
    * BEFORE any per-domain window — the guard that keeps one hot
    * domain (a link farm, a mega-wiki) from funnelling millions of
    * frontier rows through a single politeness-window sort task while
    * the rest of the fleet idles.
    *
    * Scale shape: `graft_topk_agg` ([[graft.functions.BoundedTopK]])
    * holds a ≤k bounded heap per domain with map-side partial merge,
    * so the domain-keyed shuffle carries at most k rows per domain per
    * map task and NOTHING is ever fully sorted — update is O(log k)
    * against the heap root. The window formulation (`row_number() <= k`)
    * computes the same rows but sorts every row of the hot domain in
    * one task; this is the bounded-state replacement.
    *
    * Ranking: higher `priorityCol` first (recrawl urgency, link
    * indegree, sitemap `<priority>`…), ties broken by `urlCol`
    * ascending — a total order whenever URLs are unique per domain,
    * which makes the kept set deterministic and oracle-checkable. All
    * other columns of `frontier` ride through unchanged.
    */
  def capPerDomain(frontier: DataFrame, domainCol: String, urlCol: String,
      priorityCol: Column, k: Int): DataFrame = {
    val payload = frontier.columns.filter(_ != domainCol)
    // ordering hits neg_priority first (so higher priority = smaller =
    // kept), then url, then the remaining payload columns (inert once
    // (priority, url) is unique — and they must be orderable types;
    // graft_topk_agg rejects maps at analysis time). A leading null
    // flag makes non-null priorities beat null ones, matching the
    // window formulation's `ORDER BY priority DESC` NULLS LAST —
    // struct ordering alone sorts nulls FIRST and would let unscored
    // rows win the cap. A second flag handles NaN double priorities
    // the same way: the window's DESC ordering places NaN FIRST (both
    // engines order NaN above +Inf), while NaN·−1 = NaN would tie
    // arbitrarily in the heap — the flag pins NaN rows as
    // highest-priority, keeping the window equivalence total (the
    // isnan probe runs on a double CAST, so non-floating priorities
    // are unaffected: their flag is constant). Negation stays in the
    // column's OWN numeric type — a cast to double would silently
    // collapse long priorities beyond 2^53 (epoch-micros recency,
    // indegree counters) and break the documented window equivalence.
    // (Long.MinValue priorities are out of contract: unary negation
    // wraps; scores/counters/timestamps never carry it.)
    val ranked = struct(
      priorityCol.isNull.as("__pnull") +:
        coalesce(!isnan(priorityCol.cast("double")), lit(true)).as("__pnotnan") +:
        (priorityCol * lit(-1)).as("__negp") +:
        col(urlCol).as(urlCol) +:
        payload.filter(_ != urlCol).map(c => col(c).as(c)): _*)
    frontier.groupBy(col(domainCol))
      .agg(graft.functions.BoundedTopK.column(ranked, k).as("__top"))
      .select(col(domainCol), explode(col("__top")).as("__item"))
      .select(col(domainCol) +: payload.map(c => col("__item." + c).as(c)): _*)
  }
}
