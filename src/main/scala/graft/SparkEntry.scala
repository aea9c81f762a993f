package graft

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._
import graft.operators.{AsOfJoin, CdcBatch, Contamination, DebeziumEnvelope, Relational, Sampling, SeqPacking}
import graft.operators.dedup.{Dedup, MinHashDedup, SimHashDedup}
import graft.operators.sim.SimilaritySearch
import graft.operators.text.TextAnalysis
import graft.operators.multimodal.Multimodal
import graft.functions.{GtidSetAgg, TypeConversions, UrlOps, VectorFunctions}
import graft.operators.multimodal.Mp4Codec
import graft.operators.text.HtmlExtract
import graft.sources.{ChunkPlanner, WarcIo}

/** Driver contract — one query per implemented operator from SURVEY.md §2
  * (names prefixed with the inventory id) plus the beyond-parity
  * LLM-pipeline operators (SURVEY.md §8). Each query has a DuckDB oracle
  * in [[SparkEntry.oracleSql]] unless the operator hinges on functions
  * DuckDB lacks (xxhash64-based sketches) — those are covered by
  * ScalaTest oracles instead and run rows-only here.
  *
  * Every query ends in a total-order sort on its output key so the
  * result is deterministic row-for-row against the oracle.
  */
object SparkEntry {

  // 16-point integer sine table shared by the FLAC LPC/stereo queries
  // (their DuckDB oracles carry the same values as a VALUES list)
  private val SineTable16 = Array(0, 383, 707, 924, 1000, 924, 707, 383,
    0, -383, -707, -924, -1000, -924, -707, -383)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** event_type → CDC op mapping used by all change-log queries: the
    * `events` fixture plays the binlog (`error`=delete, `signup`=insert,
    * rest=update).
    */
  private def asChangeLog(events: DataFrame): DataFrame =
    events.withColumn("op",
      when(col("event_type") === "error", "d")
        .when(col("event_type") === "signup", "i")
        .otherwise("u"))

  private val opCaseSql =
    "CASE WHEN event_type = 'error' THEN 'd' WHEN event_type = 'signup' THEN 'i' ELSE 'u' END"

  /** Escape text for embedding as HTML character data. Escape→decode is
    * the identity, which is what lets the crawl-family oracles
    * reconstruct extraction output from the raw text alone.
    */
  private def escHtml(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  /** The crawl-fixture page scaffold shared by `text_html_blocks` and
    * `pipeline_crawl`: title/nav/footer boilerplate around one heading
    * and one paragraph. Emitted block indices are fixed by construction
    * (0 title, 1-2 nav items, 3 heading, 4 paragraph, then footer), so
    * oracles can name them without parsing HTML.
    */
  private def crawlHtml(docId: Column, text: Column, heading: Column): Column =
    concat(
      lit("<html><head><title>Doc "), docId.cast("string"), lit("</title></head><body>"),
      lit("<nav><ul><li><a href=\"/\">Home</a></li><li><a href=\"/about\">About</a></li></ul></nav>"),
      lit("<h1>"), heading, lit("</h1><p>"), escHtml(text),
      lit("</p><footer>(c) graft corpus</footer></body></html>"))

  /** 120-row revisit fixture shared by `crawl_revisits` (archive-scan
    * digests) and `crawl_revisits_cdx` (sidecar digests) — ONE builder
    * so the two queries that share an oracle shape cannot drift;
    * `prefix` keeps their URLs/record-ids distinct on disk.
    */
  private def revisitRows(texts: org.apache.spark.sql.Dataset[(Long, String)],
      prefix: String): DataFrame =
    texts.toDF("id", "text").selectExpr(
      "'response' as rec_type",
      s"concat('http://$prefix.example.com/p/', id) as target_uri",
      "'2026-01-01T00:00:00Z' as warc_date",
      s"concat('<urn:uuid:$prefix-', id, '>') as record_id",
      "'application/http; msgtype=response' as content_type",
      "cast(text as binary) as payload")

  /** 3-crawl × 1000-url capture-history fixture (surt/ts/url formulas
    * shared verbatim with the DuckDB oracle restatements); `digestExpr`
    * picks the change pattern a consumer exercises. One builder for
    * cdx_change_rate / pipeline_recrawl_adaptive / cdx_asof_lookup so
    * the formulas and their oracle twins stay in one place.
    */
  private def captureHistory(s: SparkSession, digestExpr: String): DataFrame =
    s.range(3000).selectExpr(
      "id % 1000 AS base", "CAST(id DIV 1000 AS INT) AS crawl")
      .selectExpr(
        "concat('https://h', base % 20, '.ex.org/p/', base) AS url",
        "concat('2026010', crawl + 1, '000000') AS ts",
        s"$digestExpr AS digest")
      .withColumn("surt", call_function("graft_surt", col("url")))

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. Exercises
    * scan → broadcast join → decimal-exact aggregation.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    li.join(broadcast(o), li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("total_price")
      )
      .orderBy(col("o_orderpriority"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- aggregation / join / window / set-op spine (SURVEY §2.4-2.6:
    // absent in the reference, free in Spark; present here because the
    // engine is a superset and the bench exercises them at scale) -----

    "q1_agg" -> ((s, dir) => {
      // fixtures are single-row-group files (1 scan task); widen before the
      // CPU-heavy decimal agg — no-op when the scan is already parallel
      graft.operators.Partitioning.ensureMinParallelism(t(s, dir, "lineitem"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_base"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(22, 4)))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q2_join_enrich" -> ((s, dir) => {
      val li = graft.operators.Partitioning.ensureMinParallelism(t(s, dir, "lineitem"))
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_mktsegment"), col("n_name"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(22, 4)))
            .cast("double").as("revenue")
        )
        .orderBy(col("c_mktsegment"), col("n_name"))
    }),

    "q7_salted_join" -> ((s, dir) => {
      // skew-proof fact⋈dim: content-salted lineitem against a part
      // dimension replicated per salt — result identical to the plain
      // join, but a hot partkey spreads across 8 tasks
      val li = graft.operators.Partitioning.ensureMinParallelism(
        t(s, dir, "lineitem"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val p = t(s, dir, "part").select(col("p_partkey").as("l_partkey"), col("p_brand"))
      graft.operators.Partitioning.saltedJoin(li, p, "l_partkey", nSalts = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(22, 4)))
            .cast("double").as("revenue"))
        .orderBy(col("p_brand"))
    }),

    "q8_overlap_join" -> ((s, dir) => {
      // interval × interval temporal join: same-user click bursts ×
      // purchase bursts (per calendar day). Both interval sets chunk
      // into hour buckets and equi-join on (bucket, user); a pair
      // survives only in the bucket holding the overlap's left edge —
      // exactly-once with no dedup shuffle, never a nested-loop join
      val ev = t(s, dir, "events").filter(col("ts").isNotNull)
      def bursts(kind: String, pfx: String) =
        ev.filter(col("event_type") === kind)
          .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as(s"${pfx}_day"))
          .agg(unix_millis(min(col("ts"))).as(s"${pfx}_lo"),
            (unix_millis(max(col("ts"))) + 1).as(s"${pfx}_hi"),
            count(lit(1)).as(s"${pfx}_n"))
      graft.operators.RangeLookupJoin.intervalOverlap(
          bursts("click", "c"), bursts("purchase", "p"),
          "c_lo", "c_hi", "p_lo", "p_hi",
          width = 3600000.0, equiKeys = Seq("user_id"))
        .withColumn("overlap_ms",
          least(col("c_hi"), col("p_hi")) - greatest(col("c_lo"), col("p_lo")))
        .select(col("user_id"), col("c_day"), col("p_day"), col("c_lo"), col("c_hi"),
          col("p_lo"), col("p_hi"), col("c_n"), col("p_n"), col("overlap_ms"))
        .orderBy(col("user_id"), col("c_lo"), col("p_lo"))
    }),

    "q13_deciles" -> ((s, dir) => {
      // customer-value deciles WITHIN each nation: NTILE over exact
      // decimal revenue under a (revenue, custkey) total order. The
      // window partitions on the nation key — a global unpartitioned
      // ntile would funnel every customer through ONE task, the
      // single-partition window trap
      import org.apache.spark.sql.expressions.Window
      val rev = t(s, dir, "orders")
        .join(t(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
          col("c_nationkey")), "o_custkey")
        .groupBy(col("c_nationkey"), col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("revenue"))
      rev.withColumn("decile", ntile(10).over(
          Window.partitionBy(col("c_nationkey")).orderBy(col("revenue"), col("o_custkey"))))
        .groupBy(col("c_nationkey"), col("decile"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("revenue")).cast("double").as("total_revenue"),
          min(col("revenue")).cast("double").as("min_revenue"),
          max(col("revenue")).cast("double").as("max_revenue"))
        .orderBy(col("c_nationkey"), col("decile"))
    }),

    "q14_moving_avg" -> ((s, dir) => {
      // 7-day trailing revenue per user via a RANGE frame over epoch
      // days — event-time rolling totals that skip missing days
      // correctly (a ROWS frame would look back 6 ROWS, not 6 days);
      // DECIMAL day sums keep the running totals engine-exact
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "events")
        .filter(col("ts").isNotNull && col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(DecimalType(18, 6))).as("day_rev"))
        .withColumn("epoch_day", datediff(col("day"), lit("1970-01-01").cast("date")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_day"))
        .rangeBetween(-6, Window.currentRow)
      daily
        .withColumn("rev_7d", sum(col("day_rev")).over(w).cast("double"))
        .withColumn("n_days_7d", count(lit(1)).over(w))
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("day_rev").cast("double").as("day_rev"), col("rev_7d"), col("n_days_7d"))
        .orderBy(col("user_id"), col("day"))
    }),

    "q12_gapfill" -> ((s, dir) => {
      // dense daily panel: per-user purchase totals with missing days
      // filled by the last observation — the sparse-log → dense-panel
      // step retention curves and feature backfills need. The calendar
      // is a constant literal exploded per key, never a data-sized join
      val ev = t(s, dir, "events")
        .filter(col("ts").isNotNull && col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
      graft.operators.GapFill.dailyCarryForward(ev, "user_id", "d", "value",
          "2024-01-01", "2024-01-30")
        .orderBy(col("user_id"), col("day"))
    }),

    "pipeline_events" -> ((s, dir) => {
      // the events dashboard in one row: stream totals, session count,
      // funnel conversion depth, and the global volume trend. Each
      // block reduces to a single row BEFORE the joins — the cross
      // joins below multiply 1×1×1×1, the scalar-subquery shape, not a
      // data-sized cartesian
      val ev = t(s, dir, "events").filter(col("ts").isNotNull)
      val totals = ev.agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      val sessions = graft.streaming.WindowedStats
        .sessionCounts(ev, "ts", "user_id", "8 hours")
        .agg(count(lit(1)).as("n_sessions"))
      val e = ev.select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_ms")).as("t_view"))
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts_ms") > col("t_view"))
        .groupBy("user_id").agg(min(col("ts_ms")).as("t_click"))
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts_ms") > col("t_click"))
        .groupBy("user_id").agg(min(col("ts_ms")).as("t_purchase"))
      val funnel = v.agg(count(lit(1)).as("n_viewers")).crossJoin(
        c.agg(count(lit(1)).as("n_clickers"))).crossJoin(
        p.agg(count(lit(1)).as("n_converted")))
      val daily = ev.groupBy(
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("x"))
        .agg(count(lit(1)).as("y"))
      val trend = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(when(col("n") >= 2 && col("n") * col("sxx") =!= col("sx") * col("sx"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") * 1e6)
            .cast("long")).as("trend_micros_per_day"))
      totals.crossJoin(sessions).crossJoin(funnel).crossJoin(trend)
    }),

    "q10_funnel" -> ((s, dir) => {
      // ordered conversion funnel: view -> click -> purchase, each
      // step's first timestamp strictly after the previous step's.
      // Three bounded per-user aggregates chained by broadcast-able
      // joins on the user key — never a per-user sort of raw events
      val ev = t(s, dir, "events").filter(col("ts").isNotNull)
        .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_ms")).as("t_view"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts_ms") > col("t_view"))
        .groupBy("user_id").agg(min(col("ts_ms")).as("t_click_raw"))
      val cv = v.join(c, Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click_raw").as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(cv.filter(col("t_click").isNotNull), "user_id")
        .filter(col("ts_ms") > col("t_click"))
        .groupBy("user_id").agg(min(col("ts_ms")).as("t_purchase_raw"))
      cv.join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase_raw").as("t_purchase"))
        .orderBy(col("user_id"))
    }),

    "q11_cohorts" -> ((s, dir) => {
      // cohort retention: users grouped by first-seen day, distinct
      // active users per (cohort_day, day_offset) — first-seen via one
      // per-user aggregate joined back, then a distinct-count grid
      val ev = t(s, dir, "events").filter(col("ts").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val first = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      ev.join(first, "user_id")
        .select(col("user_id"), col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .filter(col("day_offset") <= 7)
        .groupBy(col("cohort_day").cast("string").as("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    "q9_json_props" -> ((s, dir) => {
      // semi-structured scan: typed extraction from the JSON props
      // column with ONE schema-directed from_json per row inside the
      // scan stage (codegen'd; no regex, no UDF) — only the extracted
      // int ever reaches the aggregate exchange, never the JSON text
      val kSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType)))
      t(s, dir, "events")
        .withColumn("k", from_json(col("props"), kSchema).getField("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count(col("k")).as("n_with_k"),
          sum(col("k")).cast("long").as("sum_k"),
          min(col("k")).cast("long").as("min_k"),
          max(col("k")).cast("long").as("max_k"))
        .orderBy(col("event_type"))
    }),

    "q3_window_topn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("rank"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rank"))
    }),

    "q4_setops" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
      val rows = Seq(
        ("intersect", cn.intersect(sn).count()),
        ("except", cn.except(sn).count()),
        ("union", cn.union(sn).distinct().count())
      )
      import s.implicits._
      rows.toDF("tag", "n").orderBy(col("tag"))
    }),

    "q5_asof_join" -> ((s, dir) => {
      // beyond-parity as-of join: each event picks up the latest order
      // of its user at or before the event time (orders capped to
      // custkey<100 so the no-match left-join path is exercised too).
      // Equal-(key,time) right rows resolve by max o_orderkey — the
      // same total order the oracle's QUALIFY dedupe imposes before
      // DuckDB's native ASOF JOIN
      val ev = t(s, dir, "events").select(col("event_id"), col("ts"), col("user_id"))
      val ord = t(s, dir, "orders").filter(col("o_custkey") < 100)
      AsOfJoin.asOf(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate",
          payload = Seq("o_orderkey", "o_totalprice"),
          rightTiebreak = Some("o_orderkey"))
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"), col("user_id"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("event_id"))
    }),

    "q5b_asof_forward" -> ((s, dir) => {
      // forward as-of: each event's NEXT signup of the same user
      // ("time to next conversion") — same one-shuffle shape, sort
      // direction flipped
      val ev = t(s, dir, "events").select(col("event_id"), col("ts"), col("user_id"))
      val signups = t(s, dir, "events").filter(col("event_type") === "signup")
        .select(col("user_id").as("su"), col("ts").as("sts"),
          col("event_id").as("next_signup_id"))
      AsOfJoin.asOf(ev, signups, "user_id", "su", "ts", "sts",
          payload = Seq("next_signup_id"),
          rightTiebreak = Some("next_signup_id"), forward = true)
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"), col("user_id"),
          col("next_signup_id"))
        .orderBy(col("event_id"))
    }),

    "q6_range_join" -> ((s, dir) => {
      // beyond-parity interval-lookup join: orders priced into
      // quadratically-irregular bands derived from the nation table;
      // the operator chunks intervals into equi-join buckets so the
      // plan never falls back to a nested loop even when the interval
      // side outgrows a broadcast
      val bands = t(s, dir, "nation").select(col("n_name").as("band"),
        (col("n_nationkey") * col("n_nationkey") * 600).cast("double").as("lo"),
        ((col("n_nationkey") + 1) * (col("n_nationkey") + 1) * 600).cast("double").as("hi"))
      val pts = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      graft.operators.RangeLookupJoin.pointInInterval(
          pts, bands, "o_totalprice", "lo", "hi", width = 20000.0)
        .select(col("o_orderkey"), col("o_totalprice"), col("band"))
        .orderBy(col("o_orderkey"))
    }),

    // ----- S: sources / scans -----

    "s3_keyset_chunks" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      ChunkPlanner.chunkedRead(s, li, Seq("l_orderkey", "l_linenumber"), 8)
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "s4_offset_chunks" -> ((s, dir) => {
      // S4 fallback pager as a golden-SQL check (k_sql_builder style):
      // the LIMIT/OFFSET page set for a keyless table is deterministic
      // text, so DuckDB rebuilds it from COUNT(*) and hash-matches
      import s.implicits._
      val total = t(s, dir, "lineitem").count()
      ChunkPlanner.offsetFallbackQueries("lineitem", None, total, 5000L)
        .zipWithIndex.map { case (q, i) => (i.toLong, q) }
        .toDF("chunk_idx", "page_sql")
        .orderBy(col("chunk_idx"))
    }),

    "s2_tx_assembly" -> ((s, dir) => {
      CdcBatch.assembleTx(t(s, dir, "events"), "user_id", "ts", "event_id", 43200000L)
        .select(col("user_id"), col("tx_index"), col("tx_first_seq"), col("tx_last_seq"),
          col("n_events"), unix_millis(col("tx_start")).as("tx_start_ms"),
          unix_millis(col("tx_end")).as("tx_end_ms"))
        .orderBy(col("user_id"), col("tx_index"))
    }),

    // ----- F: filters / projections / mappings -----

    "f1_row_filter" -> ((s, dir) => {
      Relational.whereFilter(t(s, dir, "orders"),
          "o_totalprice > 150000.0 AND upper(o_orderstatus) <> 'P' AND char_length(o_orderpriority) >= 5")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    "f2_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        expr("pow(o_custkey, 2)").as("f_pow"),
        expr("sqrt(o_totalprice)").as("f_sqrt"),
        expr("replace(o_orderpriority, '-', '_')").as("f_replace"),
        expr("upper(o_orderstatus)").as("f_upper"),
        expr("lower(o_orderpriority)").as("f_lower"),
        expr("char_length(o_orderpriority)").as("f_charlen"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("f_unixms")
      ).orderBy(col("o_orderkey"))
    }),

    "f3_route_filter" -> ((s, dir) => {
      val spec = ReplicationSpec(
        doDb = Seq(
          SchemaSpec("", schemaRegex = Some("^src(\\d)$")),
          SchemaSpec("src12")),
        ignoreDb = Seq(IgnoreSpec("src3")))
      t(s, dir, "documents")
        .filter(Relational.routeFilter(spec, col("source"), col("lang")))
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    "f4_op_filter" -> ((s, dir) => {
      Relational.opFilter(asChangeLog(t(s, dir, "events")), Set("d"))
        .select(col("event_id"), col("user_id"), col("op"))
        .orderBy(col("event_id"))
    }),

    "f6_column_map" -> ((s, dir) => {
      Relational.columnMap(t(s, dir, "customer"),
          Seq("c_custkey", "c_name", "c_acctbal"), Seq("id", "name", "balance"))
        .orderBy(col("id"))
    }),

    "f7_rename_regex" -> ((s, dir) => {
      Relational.renameColumns(
          t(s, dir, "documents")
            .select(col("doc_id"), col("source").as("db"), col("lang").as("table")),
          "^src(\\d+)$", "source_$1", "^(.*)$", "t_$1")
        .orderBy(col("doc_id"))
    }),

    "f10_idempotence" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val ledger = ev.filter(col("event_id") % 7 === 0).select(col("event_id"))
      Relational.idempotenceFilter(ev, ledger, "event_id")
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id"))
    }),

    "f8_ddl_rewrite" -> ((s, dir) => {
      // F8 + C10 — DDL classify + identifier rewrite + collation
      // downgrade. Statements synthesized deterministically from nation;
      // skipped kinds (trigger) get no rewrite, like the reference's
      // skip rules (`binlog_reader.go:1228-1265`).
      import graft.ddl.DdlRewriter
      val classifyUdf = udf((sql: String) => DdlRewriter.classify(sql).toString)
      val rewriteUdf = udf((sql: String) =>
        TypeConversions.downgradeCollations(
          DdlRewriter.rewrite(sql, Map("src" -> "dst"), Map.empty)))
      val base = t(s, dir, "nation").select(
        col("n_nationkey"),
        lower(regexp_replace(col("n_name"), "[^A-Za-z]", "_")).as("tname"))
      val stmts = base.select(col("n_nationkey"),
        when(pmod(col("n_nationkey"), lit(5)) === 0,
          concat(lit("CREATE TABLE `src`.`t_"), col("tname"),
            lit("` (id INT PRIMARY KEY, name VARCHAR(20) COLLATE utf8mb4_0900_ai_ci)")))
        .when(pmod(col("n_nationkey"), lit(5)) === 1,
          concat(lit("ALTER TABLE src.t_"), col("tname"), lit(" ADD COLUMN extra INT")))
        .when(pmod(col("n_nationkey"), lit(5)) === 2,
          concat(lit("DROP TABLE `src`.`t_"), col("tname"), lit("`")))
        .when(pmod(col("n_nationkey"), lit(5)) === 3,
          concat(lit("TRUNCATE TABLE src.t_"), col("tname")))
        .otherwise(
          concat(lit("CREATE TRIGGER trg_"), col("tname"), lit(" BEFORE INSERT ON src.t_"),
            col("tname"), lit(" FOR EACH ROW SET @x = 1")))
        .as("stmt"))
      stmts.select(col("n_nationkey"), classifyUdf(col("stmt")).as("kind"),
          when(classifyUdf(col("stmt")) =!= "SkippedStmt", rewriteUdf(col("stmt"))).as("rewritten"))
        .orderBy(col("n_nationkey"))
    }),

    "f9_cycle_filter" -> ((s, dir) => {
      val ev = t(s, dir, "events").withColumn("originServerId",
        concat(lit("server-"), pmod(col("user_id"), lit(3))))
      Relational.cycleFilter(ev, "server-1")
        .select(col("event_id"), col("user_id"), col("originServerId"))
        .orderBy(col("event_id"))
    }),

    // ----- C: type-conversion matrix -----

    "c_type_matrix" -> ((s, dir) => {
      // CPU-bound per-row projection: widen the single-row-group scan so
      // all cores participate (same pattern as q1_agg / text_profile).
      graft.operators.Partitioning.ensureMinParallelism(t(s, dir, "orders")).select(
        col("o_orderkey"),
        TypeConversions.timeToMicros(
          concat(when(pmod(col("o_orderkey"), lit(2)) === 0, "-").otherwise(""),
            date_format(col("o_orderdate"), "HH:mm:ss"),
            lit("."), pmod(col("o_orderkey"), lit(10)))).as("time_us"),
        TypeConversions.datetimeToMillis(col("o_orderdate")).as("dt_millis"),
        TypeConversions.dateToEpochDays(col("o_orderdate")).as("epoch_days"),
        TypeConversions.timestampToIso(col("o_orderdate")).as("iso_ts"),
        TypeConversions.enumLabel(pmod(col("o_orderkey"), lit(3)) + 1, Seq("A", "B", "C")).as("enum_label"),
        TypeConversions.setLabels(pmod(col("o_orderkey"), lit(8)), Seq("r", "w", "x")).as("set_csv"),
        TypeConversions.unsignedWiden(col("o_custkey") - 700, "tinyint").as("u8_widen"),
        TypeConversions.decimalToDebezium(col("o_totalprice"), 12, 2).as("dec_b64"),
        TypeConversions.binaryToBase64(col("o_orderstatus").cast(BinaryType)).as("bin_b64"),
        TypeConversions.bitToDebezium(pmod(col("o_orderkey"), lit(1024)), 16).as("bit_b64")
      ).orderBy(col("o_orderkey"))
    }),

    // ----- A: aggregates -----

    "a1_row_counts" -> ((s, dir) => {
      // A1 — per-table row counts (reference CountTableRows,
      // `extractor.go:859-878`): one count per fixture table.
      Tables.all.map { n =>
        t(s, dir, n).select(lit(n).as("table_name"))
          .groupBy(col("table_name")).agg(count(lit(1)).as("n_rows"))
      }.reduce(_ unionAll _).orderBy(col("table_name"))
    }),

    "a3_lag" -> ((s, dir) => {
      // A3 — replication delay metric (reference TimestampContext,
      // `extractor.go:930-968`): per-key lag vs the stream head; the
      // global max plays "now" so the result is deterministic.
      val ev = t(s, dir, "events")
      val global = ev.agg(max(unix_millis(col("ts"))).as("now_ms"))
      ev.groupBy(col("user_id")).agg(max(unix_millis(col("ts"))).as("last_ms"))
        .crossJoin(broadcast(global))
        .select(col("user_id"), (col("now_ms") - col("last_ms")).as("lag_ms"))
        .orderBy(col("user_id"))
    }),

    "a2_checksum" -> ((s, dir) => {
      CdcBatch.checksum(t(s, dir, "lineitem"), Seq("l_returnflag"), "l_orderkey", "l_linenumber")
        .orderBy(col("l_returnflag"))
    }),

    "a5_gtid_set" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(GtidSetAgg.column(col("event_id")).as("gtid_set"))
        .orderBy(col("user_id"))
    }),

    // ----- K/O: sink & streaming semantics, batch form -----

    "k2_cdc_apply" -> ((s, dir) => {
      CdcBatch.applyChangeLog(asChangeLog(t(s, dir, "events")), "user_id", "event_id", "op")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    "o12_salted_agg" -> ((s, dir) => {
      // skew-safe aggregation through the driver gate: event_type has
      // only a handful of values (each a straggler-sized group at
      // corpus scale); salting splits each into 16 sub-groups and
      // folds the partials — result must equal the plain aggregate
      graft.operators.Partitioning.saltedAggregate(
          t(s, dir, "events").select(col("event_type"), col("value")),
          "event_type", nSalts = 16)(
          g => g.agg(count(lit(1)).as("pn"), max(col("value")).as("pmax")),
          g => g.agg(sum(col("pn")).as("n_events"), max(col("pmax")).as("max_value")))
        .orderBy(col("event_type"))
    }),

    "o1_size_batches" -> ((s, dir) => {
      CdcBatch.sizeBatches(
          t(s, dir, "events").withColumn("n_bytes", length(col("props"))),
          "user_id", "event_id", "n_bytes", 2048L)
        .select(col("event_id"), col("user_id"), col("batch_id"))
        .orderBy(col("event_id"))
    }),

    "o2_merge_inserts" -> ((s, dir) => {
      CdcBatch.mergeConsecutiveInserts(
          asChangeLog(t(s, dir, "events")).withColumn("table_id", pmod(col("user_id"), lit(5))),
          "table_id", "event_id", "op")
        .select(col("table_id"), col("op"), col("first_seq"), col("last_seq"), col("n_rows"))
        .orderBy(col("table_id"), col("first_seq"))
    }),

    "o4_writeset" -> ((s, dir) => {
      CdcBatch.writesetDependencies(t(s, dir, "events"), "user_id", "event_id")
        .select(col("event_id"), col("user_id"), col("last_committed"))
        .orderBy(col("event_id"))
    }),

    "o9_windowed_agg" -> ((s, dir) => {
      // O9 — event-time tumbling window, batch form of the streaming
      // operator (same code path; watermark is a no-op in batch).
      graft.streaming.WindowedStats.windowedCounts(
          t(s, dir, "events").withColumn("v", col("value").cast(DecimalType(18, 4))),
          "ts", "user_id", "v", "1 hour")
        .select(col("user_id"), unix_millis(col("win_start")).as("ws_ms"),
          unix_millis(col("win_end")).as("we_ms"), col("n_events"),
          col("sum_value").cast("double").as("sum_value"))
        .orderBy(col("user_id"), col("ws_ms"))
    }),

    "k8_scd2_history" -> ((s, dir) => {
      // beyond-ref sink shape: the same change log the upsert applier
      // consumes, materialized as SCD2 time-travel history — 'error'
      // events act as deletes, closing their key's open interval
      val ev = t(s, dir, "events")
        .withColumn("op", when(col("event_type") === "error", lit("d")).otherwise(lit("u")))
      CdcBatch.scd2History(ev, "user_id", "event_id", "ts",
          Seq("event_type", "value"), "op")
        .orderBy(col("user_id"), col("version"))
    }),

    "o13_session_windows" -> ((s, dir) => {
      // §2.8 — session windows, batch form of the streaming operator
      // (same code path; watermark no-ops in batch): events of one user
      // within 8h of each other fold into one session. Spark plans
      // session_window as one shuffle on the key + in-partition merge —
      // no self-join, which is what survives a 100 TB event log. The
      // oracle reproduces the merge as gaps-and-islands (break only
      // when the gap EXCEEDS 8h — exactly-at-gap merges — end = last
      // event + gap).
      graft.streaming.WindowedStats.sessionCounts(
          t(s, dir, "events").filter(col("ts").isNotNull), "ts", "user_id", "8 hours")
        .select(col("user_id"), unix_millis(col("win_start")).as("ws_ms"),
          unix_millis(col("win_end")).as("we_ms"), col("n_events"))
        .orderBy(col("user_id"), col("ws_ms"))
    }),

    "o5_mts_schedule" -> ((s, dir) => {
      // O5 — MTS parallel apply, batch form (reference MtsManager
      // `applier_mts.go:30-155`): rows route to a worker by key and
      // commit in seq order within it — the partition-scheduling
      // equivalence the production sink uses (JdbcUpsertSink step 1).
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "events")
        .withColumn("worker", pmod(col("user_id"), lit(4)))
        .withColumn("commit_pos", row_number().over(
          Window.partitionBy(col("worker")).orderBy(col("event_id"))))
        .select(col("event_id"), col("user_id"), col("worker"), col("commit_pos"))
        .orderBy(col("event_id"))
    }),

    "o3_bigtx_split" -> ((s, dir) => {
      CdcBatch.splitBigTx(
          t(s, dir, "events").withColumn("n_bytes", length(col("props"))),
          "user_id", "event_id", "n_bytes", 4096L)
        .select(col("event_id"), col("user_id"), col("part_index"), col("is_final"))
        .orderBy(col("event_id"))
    }),

    "o11_stop_at_gtid" -> ((s, dir) => {
      // O11 — bounded stream: drop events beyond the target GTID set
      // (reference `binlog_reader.go:1824-1846`). The parsed interval
      // set compiles to a codegen'd disjunction of BETWEENs — pushes
      // down to the scan, no UDF.
      val target = graft.functions.IntervalSet.parse("1-4999:6001-7000")
      val keep = target.intervals
        .map { case (lo, hi) => col("event_id").between(lo, hi) }
        .reduce(_ || _)
      t(s, dir, "events").filter(keep)
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id"))
    }),

    "s7_session_plan" -> ((s, dir) => {
      // S7 — the LogMiner poll loop's session plan as golden text
      // (reference log_miner.go:119-136 start, :238-266 contents
      // query, :198-236 schema filter): fixed-size SCN windows over a
      // known range, each with its V$LOGMNR_CONTENTS fetch. events'
      // max id plays the probed end SCN.
      import s.implicits._
      import graft.sources.LogMinerSession
      val endScn = t(s, dir, "events").agg(max(col("event_id"))).head().getLong(0)
      val filter = LogMinerSession.schemaFilter(
        Seq("SHOP" -> Seq("ORDERS", "LINEITEM"), "HR" -> Nil), Seq("TMP" -> Nil))
      LogMinerSession.windowPlan(0L, endScn, 2000L, filter)
        .toDF("window_idx", "start_scn", "end_scn", "mine_sql")
        .orderBy(col("window_idx"))
    }),

    "pipeline_replicate" -> ((s, dir) => {
      // E2E CDC flagship — the full replication spine in ONE plan
      // (reference job lifecycle `driver/mysql/extractor.go:195-333` /
      // `applier.go`): S5 consistent snapshot/stream handoff + S3
      // keyset-chunked full load + F1 row filter (both phases) + F10
      // idempotence over the applied ledger + K2/K4 last-writer-wins
      // upsert + K7/A5 per-key applied-GTID interval ledger. The
      // streaming form of the same composition runs in JobRunnerSpec
      // over the file-backed source; this batch form is the DuckDB-
      // oracled equivalence on the applied-table state.
      val evAll = asChangeLog(t(s, dir, "events"))
      // S5: the handoff point ("snapshot SCN") — one scalar read at job
      // start, exactly the reference's initial binlog-coordinates fetch
      val cutoff = t(s, dir, "events").agg(max(col("event_id"))).head().getLong(0) / 2
      val replayFrom = cutoff - cutoff / 4 // at-least-once restart overlap
      // F1: the table's row filter, applied to BOTH phases like the
      // reference applies the where-clause during full copy AND incr
      val ev = Relational.whereFilter(evAll, "event_type <> 'click'")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("op"))
      Relational.columnMap(
        graft.operators.Replication.replicate(ev, "user_id", "event_id", "op",
          cutoff, replayFrom),
        Seq("user_id", "event_id", "event_type", "value", "applied_set", "n_replayed"),
        Seq("uid", "last_seq", "last_type", "val", "applied_set", "n_replayed"))
        .orderBy(col("uid"))
    }),

    "pipeline_twoway" -> ((s, dir) => {
      // O10 — two-way sync, batch form (streaming form: TwoWaySyncSpec):
      // each key's HOME server is user_id parity; each side's applied
      // set = its local writes ∪ the peer capture stream through the F9
      // cycle filter (which drops the echoes of its own rows the peer
      // re-captured). Both sides must converge to the same live state,
      // with `via` recording local vs replicated arrival — exactly the
      // reference's bidirectional job pair (`applier_incr.go:290-313`).
      val ev = asChangeLog(t(s, dir, "events"))
        .withColumn("origin",
          when(pmod(col("user_id"), lit(2)) === 0, "server-A").otherwise("server-B"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("op"), col("origin"))
      def sideState(side: String) = {
        val self = s"server-$side"
        val local = ev.filter(col("origin") === self)
        // the peer's capture stream carries everything it applied —
        // including echoes of OUR rows; F9 drops those
        val replicated = Relational.cycleFilter(ev, self, "origin")
        CdcBatch.applyChangeLog(local.unionByName(replicated),
            "user_id", "event_id", "op")
          .withColumn("side", lit(side))
          .withColumn("via",
            when(col("origin") === self, "local").otherwise("replicated"))
      }
      sideState("A").unionByName(sideState("B"))
        .select(col("side"), col("user_id").as("uid"), col("event_id").as("last_seq"),
          col("event_type").as("last_type"), col("value").as("val"), col("via"))
        .orderBy(col("side"), col("uid"))
    }),

    "s9_snapshot_chunks" -> ((s, dir) => {
      // S9 — Oracle AS-OF-SCN snapshot chunk planning: the rownum-window
      // JDBC dbtable subqueries, one per partition (golden text
      // parameterized by the live row count).
      import s.implicits._
      import graft.sources.RedoSqlParser
      val total = t(s, dir, "orders").count()
      RedoSqlParser.snapshotChunks("SHOP", "ORDERS", 12345L, total, 5000)
        .zipWithIndex.map { case (sql, i) => (i, sql) }
        .toDF("chunk_idx", "chunk_sql")
        .orderBy(col("chunk_idx"))
    }),

    "s8_redo_parse" -> ((s, dir) => {
      // S8 — Oracle LogMiner redo SQL → rows: redo statements are
      // synthesized from orders (insert/update/delete by key mod 3),
      // then parsed back distributed (one parser call per event, inside
      // the executors — reference parseDMLSQL `log_miner.go:918-1073`).
      import s.implicits._
      import graft.sources.RedoSqlParser
      val o = t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_custkey"),
        col("o_totalprice").cast(DecimalType(12, 2)).cast("string").as("p"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("d"))
      val sqls = o.select(col("o_orderkey"),
        when(pmod(col("o_orderkey"), lit(3)) === 0,
          concat(lit("insert into \"SHOP\".\"ORDERS\"(\"K\",\"C\",\"P\",\"D\") values ("),
            col("o_orderkey"), lit(","), col("o_custkey"), lit(",'"), col("p"),
            lit("',TO_DATE('"), col("d"), lit("','YYYY-MM-DD HH24:MI:SS'))")))
        .when(pmod(col("o_orderkey"), lit(3)) === 1,
          concat(lit("update \"SHOP\".\"ORDERS\" set \"P\" = '"), col("p"),
            lit("' where \"K\" = "), col("o_orderkey"), lit(" and \"C\" = "), col("o_custkey")))
        .otherwise(
          concat(lit("delete from \"SHOP\".\"ORDERS\" where \"K\" = "), col("o_orderkey"),
            lit(" and \"D\" = TO_DATE('"), col("d"), lit("','YYYY-MM-DD HH24:MI:SS')")))
        .as("redo"))
      sqls.select(col("o_orderkey"), col("redo")).as[(Long, String)]
        .map { case (k, sql) =>
          val p = RedoSqlParser.parse(sql).get
          (k, p.schema, p.table, p.op,
            p.after.get("P").orElse(p.before.get("P")).orNull,
            p.after.get("K").orElse(p.before.get("K")).orNull,
            p.after.get("D").orElse(p.before.get("D")).orNull)
        }
        .toDF("o_orderkey", "schema_name", "table_name", "op", "p_val", "k_val", "d_val")
        .orderBy(col("o_orderkey"))
    }),

    "s8_ddl_convert" -> ((s, dir) => {
      // S8 (DDL half) — Oracle DDL → MySQL DDL conversion (reference
      // parseDDLSQL, `log_miner.go:1075-1279`): statements synthesized
      // from part exercise the NUMBER precision tiers, the 30-digit
      // scale cap, CHAR/VARCHAR size thresholds, the fsp≤6 timestamp
      // cap, quoted-identifier case preservation, and all three
      // statement kinds; conversion runs inside the executors (the
      // LogMiner stream shape — one converter call per redo DDL).
      import s.implicits._
      import graft.ddl.OracleDdlConverter
      t(s, dir, "part").select(col("p_partkey").cast("long")).as[Long]
        .map { k =>
          val ddl = (k % 6) match {
            case 0 => s"CREATE TABLE SHOP.T$k(ID NUMBER(${1 + k % 38}), NAME VARCHAR2(${1 + k % 2000}))"
            case 1 => s"CREATE TABLE SHOP.T$k(C NUMBER(38,${1 + k % 35}) NOT NULL, D DATE)"
            case 2 => s"ALTER TABLE SHOP.T$k ADD (C$k TIMESTAMP(${k % 10}))"
            case 3 => s"alter table SHOP.T$k modify ( C$k CHAR ( ${1 + k % 300} ) )"
            case 4 => s"ALTER TABLE SHOP.T$k DROP (C1, C2)"
            case _ => s"""DROP TABLE "shop"."t$k""""
          }
          val c = OracleDdlConverter.convert(ddl, "SEG")
            .fold(e => throw new IllegalArgumentException(e), identity)
          (k, c.kind, c.schema, c.table, c.sql)
        }
        .toDF("p_partkey", "kind", "schema_name", "table_name", "mysql_sql")
        .orderBy(col("p_partkey"))
    }),

    "s7_txcache" -> ((s, dir) => {
      // S7 — LogMiner tx cache: redo records synthesized from events
      // (20-record transactions; every 4th rolls back; position 15 is a
      // partial-rollback record cancelling its row's earlier changes),
      // then reduced to committed records via key-partitioned joins
      // (reference LogMinerTxCache, `log_miner.go:394-500`).
      import graft.sources.LogMinerTxCache
      val txn = expr("event_id div 20")
      val p = pmod(col("event_id"), lit(20))
      val redo = t(s, dir, "events").select(
        col("event_id").as("scn"),
        concat(lit("x"), txn).as("xid"),
        when(p === 19, when(pmod(txn, lit(4)) === 0, "rollback").otherwise("commit"))
          .otherwise(when(pmod(p, lit(3)) === 0, "c")
            .when(pmod(p, lit(3)) === 1, "u").otherwise("d")).as("op"),
        concat(lit("R"), pmod(p, lit(5))).as("row_id"),
        lit("").as("redo_sql"),
        when(p === 15, 1).otherwise(0).as("rollback"))
      LogMinerTxCache.committedRecords(redo)
        .select(col("scn"), col("xid"), col("op"), col("row_id"), col("end_scn"))
        .orderBy(col("scn"))
    }),

    "s7_csf" -> ((s, dir) => {
      // S7 — csf=1 continuation reassembly: >4000-byte redo SQL split
      // across consecutive LogMiner rows (reference GetLogMinerRecord,
      // `log_miner.go:293-320`). Long INSERTs are synthesized from
      // orders, chopped into 4000-char pieces with csf flags, then
      // reassembled per-xid and re-parsed on the executors — round-trip
      // pins both the piece stitching and the parser on >4KB statements.
      import s.implicits._
      import graft.sources.{LogMinerTxCache, RedoSqlParser}
      val full = t(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey").as("k"),
          concat(lit("insert into \"SHOP\".\"BIG\"(\"K\",\"TXT\") values ("),
            col("o_orderkey"), lit(",'"),
            expr("repeat('ab4', int((3000 + o_orderkey % 7 * 1500) / 3))"),
            lit("')")).as("full_sql"))
        .withColumn("n_p", expr("int(ceil(length(full_sql) / 4000.0))"))
      val pieces = full
        .select(col("k"), col("n_p"),
          posexplode(expr(
            "transform(sequence(0, n_p - 1), i -> substring(full_sql, i * 4000 + 1, 4000))"))
            .as(Seq("i", "redo_sql")))
        .select(col("k").as("scn"),
          concat(lit("x"), expr("k div 100")).as("xid"),
          (col("k") * 100 + col("i")).as("seq"),
          when(col("i") === col("n_p") - 1, 0).otherwise(1).as("csf"),
          col("redo_sql"))
      LogMinerTxCache.reassembleCsf(pieces)
        .select(col("scn"), col("xid"), col("redo_sql"), col("n_pieces"))
        .as[(Long, String, String, Int)]
        .map { case (scn, xid, sql, nPieces) =>
          val p = RedoSqlParser.parse(sql).get
          (scn, xid, p.schema, p.table, p.op,
            p.after("K"), p.after("TXT").length, nPieces)
        }
        .toDF("scn", "xid", "schema_name", "table_name", "op",
          "k_val", "txt_len", "n_pieces")
        .orderBy(col("scn"))
    }),

    "k_sql_builder" -> ((s, dir) => {
      // K1-K4/K7 — golden SQL text of the sink statement builder
      // (reference builder_test.go style), parameterized by the actual
      // fixture schema.
      import s.implicits._
      import graft.sinks.SqlBuilder
      val cols = t(s, dir, "customer").schema.fieldNames.toSeq
      val td = SqlBuilder.TableDef("shop", "customer", cols, Seq("c_custkey"))
      val tdNoPk = td.copy(pkColumns = Nil)
      Seq(
        ("delete_nopk", SqlBuilder.delete(tdNoPk)),
        ("delete_pk", SqlBuilder.delete(td)),
        ("ledger_insert", SqlBuilder.ledgerInsert("shop")),
        ("prologue", SqlBuilder.fullLoadPrologue("shop", createSchemaIfNotExists = true).mkString("; ")),
        ("replace_1", SqlBuilder.replaceInto(td, 1)),
        ("replace_4", SqlBuilder.replaceInto(td, 4)),
        // greedy bulk-tier decomposition the sink applies batches with
        ("tier_plan_141", SqlBuilder.tierPlan(141).map { case (t, c) => s"${t}x$c" }.mkString(",")),
        ("tier_plan_300", SqlBuilder.tierPlan(300).map { case (t, c) => s"${t}x$c" }.mkString(",")),
        ("update_pk", SqlBuilder.update(td))
      ).toDF("stmt_kind", "sql").orderBy(col("stmt_kind"))
    }),

    "k7_ledger_compact" -> ((s, dir) => {
      // K7 — ledger compaction fold (reference
      // `applier_gtid_executed.go:248-291`): per-tx ledger rows collapse
      // to one interval-set row per (job, source_uuid). events plays the
      // ledger: gtid = event_id, source uuid derived from user_id.
      val ledger = t(s, dir, "events").select(
        lit("job1").as("job_id"),
        concat(lit("uuid-"), pmod(col("user_id"), lit(5))).as("source_uuid"),
        col("event_id").as("gtid"))
      graft.sinks.LedgerCompactor.compactDf(ledger)
        .orderBy(col("source_uuid"))
    }),

    "o4_writeset_multi" -> ((s, dir) => {
      // full O4: dependency = max predecessor across BOTH key
      // dimensions; FK-parent rows ('error' here) are serial barriers
      CdcBatch.writesetDependenciesMulti(
          t(s, dir, "events")
            .withColumn("k2", pmod(floor(col("value")).cast("long"), lit(7)))
            .withColumn("is_fk_parent", col("event_type") === "error"),
          Seq("user_id", "k2"), "event_id", barrierCol = Some("is_fk_parent"))
        .select(col("event_id"), col("user_id"), col("k2"), col("last_committed"))
        .orderBy(col("event_id"))
    }),

    "k6_debezium" -> ((s, dir) => {
      val cdc = asChangeLog(t(s, dir, "events")).select(
        lit("shop").as("db"),
        lit("events").as("table"),
        col("op"),
        lit(null).cast("struct<event_id:bigint>").as("before"),
        struct(col("event_id"), col("user_id"), col("event_type")).as("after"),
        unix_millis(col("ts")).as("tsMillis"),
        lit("server-1").as("originServerId"),
        col("event_id").as("seq"),
        col("user_id")
      )
      DebeziumEnvelope.encode(cdc, Seq("user_id"), "graft")
        .withColumn("seq", get_json_object(col("value"), "$.source.pos"))
        .orderBy(col("seq").cast("long"))
        .drop("seq")
    }),

    "s6_discovery" -> ((s, dir) => {
      // S6 — full catalog-driven discovery stage (reference inspectTables,
      // `extractor.go:383-565`): documents' (source, lang) pairs play the
      // information_schema catalog; the spec routes + regex-renames with
      // $1 capture groups into the concrete replication plan.
      val catalog = t(s, dir, "documents")
        .select(col("source").as("db"), col("lang").as("table")).distinct()
      val spec = ReplicationSpec(
        doDb = Seq(
          SchemaSpec("", schemaRegex = Some("^src(\\d)$"), renameSchema = Some("shard_$1"),
            tables = Seq(TableSpec("", "^(.*)$", renameTable = Some("t_$1")))),
          SchemaSpec("src12")),
        ignoreDb = Seq(IgnoreSpec("src3")))
      Relational.discoverTables(catalog, spec)
        .orderBy(col("db"), col("table"))
    }),

    "k6_schema_topic" -> ((s, dir) => {
      // K6 — schema-change topic: the non-skipped DDL of f8_ddl_rewrite,
      // published as Debezium schema-change envelopes (reference
      // `kafka3.go:684-865`, envelope `kafka2.go:111-230`).
      import graft.ddl.DdlRewriter
      val classifyUdf = udf((sql: String) => DdlRewriter.classify(sql).toString)
      val rewriteUdf = udf((sql: String) =>
        TypeConversions.downgradeCollations(
          DdlRewriter.rewrite(sql, Map("src" -> "dst"), Map.empty)))
      val base = t(s, dir, "nation").select(
        col("n_nationkey"),
        lower(regexp_replace(col("n_name"), "[^A-Za-z]", "_")).as("tname"))
      val stmts = base.select(col("n_nationkey"),
        when(pmod(col("n_nationkey"), lit(5)) === 0,
          concat(lit("CREATE TABLE `src`.`t_"), col("tname"),
            lit("` (id INT PRIMARY KEY, name VARCHAR(20) COLLATE utf8mb4_0900_ai_ci)")))
        .when(pmod(col("n_nationkey"), lit(5)) === 1,
          concat(lit("ALTER TABLE src.t_"), col("tname"), lit(" ADD COLUMN extra INT")))
        .when(pmod(col("n_nationkey"), lit(5)) === 2,
          concat(lit("DROP TABLE `src`.`t_"), col("tname"), lit("`")))
        .when(pmod(col("n_nationkey"), lit(5)) === 3,
          concat(lit("TRUNCATE TABLE src.t_"), col("tname")))
        .otherwise(
          concat(lit("CREATE TRIGGER trg_"), col("tname"), lit(" BEFORE INSERT ON src.t_"),
            col("tname"), lit(" FOR EACH ROW SET @x = 1")))
        .as("stmt"))
      val ddl = stmts
        .filter(classifyUdf(col("stmt")) =!= "SkippedStmt")
        .select(
          lit("dst").as("db"),
          rewriteUdf(col("stmt")).as("ddl"),
          (col("n_nationkey") * 1000L).as("tsMillis"),
          lit("server-1").as("originServerId"),
          col("n_nationkey").cast("long").as("seq"))
      DebeziumEnvelope.schemaChange(ddl, "graft")
        .withColumn("pos", get_json_object(col("value"), "$.source.pos").cast("long"))
        .orderBy(col("pos"))
        .drop("pos")
    }),

    // ----- beyond-parity: dedup family (SURVEY §8) -----

    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("content_hash"))
    }),

    "dedup_ngram" -> ((s, dir) => {
      // df cap 50: stop-shingles (shared by >50 docs) are dropped before
      // the pair join — without it a low-entropy corpus goes quadratic
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", n = 3,
          threshold = 0.5, maxShingleDf = 50)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_prefix_exact" -> ((s, dir) => {
      // EXACT Jaccard >= 3/5 self-join via prefix filtering: candidates
      // come only from each doc's rarest shingles, yet the oracle
      // brute-forces ALL shared-shingle pairs with NO df cap — the gate
      // proves the prefix filter lost nothing (SSJoin/PPJoin theorem)
      Dedup.prefixJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, tauNum = 3, tauDen = 5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_prefix_incremental" -> ((s, dir) => {
      // continual-ingest exact near-dup: the corpus slice builds the
      // frozen df/prefix/set index once, the batch dedups against it
      // under the index's order — oracle brute-forces the full cross
      // product, so the gate proves the frozen-order filters lossless
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val (dfT, pfx, sets) = Dedup.buildPrefixIndex(corpus, "doc_id", "text",
        n = 3, tauNum = 1, tauDen = 2)
      Dedup.prefixJaccardAgainstIndex(dfT, pfx, sets, batch, "doc_id", "text",
          n = 3, tauNum = 1, tauDen = 2)
        .orderBy(col("batch_id"), col("index_id"))
    }),

    "dedup_clusters" -> ((s, dir) => {
      // transitive dedup clusters over the ngram near-dup pair graph
      // (min-label propagation to fixpoint; oracle = recursive CTE)
      val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5, maxShingleDf = 50)
      Dedup.connectedComponents(pairs)
        .orderBy(col("node"))
    }),

    "dedup_keep_best" -> ((s, dir) => {
      // quality-aware representatives: each near-dup cluster keeps its
      // HIGHEST-token-count member (ties to smallest id) instead of
      // min-id — the RefinedWeb/FineWeb keep-best-of-cluster choice
      import graft.operators.text.TextAnalysis
      val docs = t(s, dir, "documents").filter(col("text").isNotNull)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxShingleDf = 50)
      val comps = Dedup.connectedComponents(pairs)
      Dedup.keepBest(
          docs.select(col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("score")),
          "doc_id", "score", comps)
        .orderBy(col("doc_id"))
    }),

    "sample_kfold" -> ((s, dir) => {
      // leak-free k-fold cross-validation assignment: the fold keys on
      // each doc's exact-dup group REPRESENTATIVE, so verbatim copies
      // always land in the same fold (per-doc hashing would leak a
      // copy into the held-out fold)
      val docs = t(s, dir, "documents").filter(col("text").isNotNull)
      val hashed = docs.select(col("doc_id"),
        md5(Dedup.normText(col("text"))).as("__h"))
      val reps = hashed.groupBy(col("__h")).agg(min(col("doc_id")).as("rep"))
      hashed.join(reps, "__h")
        .select(col("doc_id"), col("rep"),
          pmod(graft.operators.Sampling.hash60(col("rep")), lit(5)).cast("int").as("fold"))
        .orderBy(col("doc_id"))
    }),

    "sample_split_leakfree" -> ((s, dir) => {
      // eval-hygiene split: near-dup clusters assigned atomically so a
      // doc and its edited copy never straddle train/val
      graft.operators.TrainingDataPipeline.leakFreeSplit(
          t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "dedup_minhash" -> ((s, dir) => {
      // portable arithmetic at the full production parameters (k=64,
      // 16 bands): md5 shingle hashes mod 2^31-1 + (2j+1)x+c_j
      // permutations via the imperative MinHashSigAgg, so the ENTIRE
      // pipeline hash-matches the DuckDB oracle (was rows-only while it
      // rode xxhash64). The xxhash64 fast path stays the library API
      // (MinHashDedup.nearDupPairs), accuracy-pinned in MinHashDedupSpec.
      MinHashDedup.portablePairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, k = 64, numBands = 16, threshold = 0.5, maxBucket = 500)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_incremental" -> ((s, dir) => {
      // continual ingest: today's batch (every 5th doc) deduped against
      // the accumulated index (the rest) — exact + near-dup drops
      val docs = t(s, dir, "documents")
      Dedup.incrementalAgainst(
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id", "text", n = 3, threshold = 0.5, maxShingleDf = 1000)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "dedup_incremental_bloom" -> ((s, dir) => {
      // same continual-ingest split as dedup_incremental, exact stage
      // only, through the Bloom pre-filter: the sketch prunes before
      // any shuffle and the md5 verify join keeps the result
      // bit-identical to the plain exact anti-join (= this oracle)
      val docs = t(s, dir, "documents")
      Dedup.incrementalExactBloom(
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id", "text", expectedItems = 100000L)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "dedup_minhash_incremental" -> ((s, dir) => {
      // continual ingest, MinHash scale path: today's batch (doc_id%5
      // != 0) near-dup-checked against the STORED signature index of
      // the accumulated corpus (%5 == 0) — corpus text is never
      // re-shingled. Same split convention as dedup_incremental; the
      // index build + probe are both portable arithmetic, so the whole
      // two-corpus pipeline hash-matches the oracle.
      val docs = t(s, dir, "documents")
      val (idxBands, idxSigs) = MinHashDedup.buildPortableIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text",
        n = 3, k = 16, numBands = 4)
      MinHashDedup.nearDupAgainstIndex(idxBands, idxSigs,
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "doc_id", "text",
          n = 3, k = 16, numBands = 4, threshold = 0.5, maxBucket = 500)
        .orderBy(col("doc_id"), col("dup_of"))
    }),

    "dedup_minhash_md5" -> ((s, dir) => {
      // the portable-arithmetic LSH witness: same construction as
      // dedup_minhash, every hash reproducible in ANSI SQL -> the
      // whole minhash/banding/bucket pipeline gets a DuckDB hash-match
      MinHashDedup.portablePairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, k = 16, numBands = 4, threshold = 0.5, maxBucket = 500)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_simhash_incremental" -> ((s, dir) => {
      // continual ingest, SimHash scale path: batch (doc_id%5 != 0)
      // Hamming-checked against the STORED fingerprint/block index of
      // the accumulated corpus (%5 == 0) — mirror of
      // dedup_minhash_incremental on the other sketch family.
      val docs = t(s, dir, "documents")
      val index = SimHashDedup.buildPortableIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text")
      SimHashDedup.nearDupAgainstIndex(index,
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "doc_id", "text",
          maxDist = 3, maxBucket = 1000)
        .orderBy(col("doc_id"), col("dup_of"))
    }),

    "dedup_simhash" -> ((s, dir) => {
      // the round-5 witness FOLDED INTO the main row: portable 60-bit
      // md5 fingerprints (5 pigeonhole blocks × 12 bits, Hamming ≤ 3) —
      // fingerprints, block keys, and distances all rebuilt and
      // hash-matched by DuckDB. The xxhash64 native-expression path
      // (nearDupPairs) stays the library API, verified vs brute-force
      // Hamming in SimHashDedupSpec.
      SimHashDedup.portablePairs(t(s, dir, "documents"), "doc_id", "text", maxDist = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "emb_cosine_pairs" -> ((s, dir) => {
      SimilaritySearch.bruteForcePairs(t(s, dir, "embeddings"), "vec_id", "embedding", 0.4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_semantic" -> ((s, dir) => {
      // SemDeDup: near-dup cosine pairs within learned-centroid
      // clusters (portable Lloyd, so the whole derivation oracles) —
      // density-adaptive bucketing vs emb_lsh_pairs' random planes
      SimilaritySearch.semanticDedupPairs(t(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.4, nLists = 16, iters = 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_semantic_prune" -> ((s, dir) => {
      // the SemDeDup pruning decision: transitive duplicate groups,
      // keep the farthest-from-centroid member of each
      SimilaritySearch.semanticPrune(t(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.4, nLists = 16, iters = 2)
        .orderBy(col("vec_id"))
    }),

    "emb_lsh_incremental" -> ((s, dir) => {
      // continual ingest for embeddings: new vectors (vec_id%5 != 0)
      // near-dup-checked against the STORED LSH bucket index of the
      // accumulated corpus (%5 == 0) — third sketch family with a
      // persisted-index path (minhash, simhash, embedding-LSH).
      val emb = t(s, dir, "embeddings")
      val (idxBuckets, idxVecs) = SimilaritySearch.buildLshIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) === 0), "vec_id", "embedding",
        dim = 64, nBits = 8, tables = 4)
      SimilaritySearch.lshPairsAgainstIndex(idxBuckets, idxVecs,
          emb.filter(pmod(col("vec_id"), lit(5)) =!= 0), "vec_id", "embedding",
          threshold = 0.4, dim = 64, nBits = 8, tables = 4, maxBucket = 1000)
        .orderBy(col("vec_id"), col("dup_of"))
    }),

    "emb_lsh_pairs" -> ((s, dir) => {
      // LSH-bucketed near-dup embedding pairs — the scale path for
      // emb_cosine_pairs. Portable md5-derived planes make the whole
      // pipeline (buckets, caps, candidates, cosines) hash-match the
      // DuckDB oracle; SimilaritySearchSpec additionally pins
      // precision = 1 vs brute force
      SimilaritySearch.lshPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.4, dim = 64, nBits = 8, tables = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ----- beyond-parity: similarity search -----

    "sim_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "emb_lsh_md5" -> ((s, dir) => {
      // portable hyperplane-LSH witness: md5-derived plane weights are
      // identical doubles on every engine, so buckets, candidates, and
      // cosines all hash-match DuckDB
      SimilaritySearch.portableLshPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.4, dim = 64, nBits = 6, tables = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "sim_topk_quantized" -> ((s, dir) => {
      // exact top-k over the int8-quantized corpus (cosine is scale-
      // invariant: byte vectors searched directly, 4x less index bytes)
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.quantizedTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "sim_lsh_topk" -> ((s, dir) => {
      // ANN path. Recall < 1 by design, but the portable planes +
      // broadcast-query candidate join are fully deterministic, so the
      // approximate result ITSELF hash-matches the DuckDB oracle; recall
      // vs brute force asserted in SimilaritySearchSpec
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.lshTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, dim = 64, nBits = 8, tables = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    "sim_knn_graph" -> ((s, dir) => {
      // mutual k-NN graph over the whole corpus: LSH-bucketed
      // candidates (never all-pairs), per-node exact-cosine top-5,
      // edge kept only when BOTH endpoints keep it — the neighborhood
      // structure graph-based curation (SemDeDup clustering, density
      // pruning) consumes; fully deterministic, so the graph itself
      // hash-matches the oracle
      val emb = t(s, dir, "embeddings")
      // nBits self-scales with the corpus (autoNBits: smallest b in
      // [4,24] with n <= 64*2^b); the oracle replays the same integer
      // search against count(*), so both engines derive the same b at
      // ANY fixture size — including the fuzz corpora
      SimilaritySearch.knnGraph(emb, "vec_id", "embedding", k = 5,
          dim = 64, tables = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "sim_recall_eval" -> ((s, dir) => {
      // ANN quality measurement as a query: recall@5 of the LSH index
      // against brute-force ground truth, per query — the gauge an
      // index-parameter sweep reads; exact integer recall micros
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      SimilaritySearch.recallAtK(
          SimilaritySearch.bruteForceTopK(emb, q, "vec_id", "embedding", 5),
          SimilaritySearch.lshTopK(emb, q, "vec_id", "embedding",
            k = 5, dim = 64, nBits = 8, tables = 4))
        .orderBy(col("query_id"))
    }),

    "sim_ivf_topk" -> ((s, dir) => {
      // IVF cluster-then-probe ANN, production form: 2 Lloyd rounds.
      // Centroid means run in integer micro-units (exact BIGINT sums +
      // one fixed double division chain), so the refinement is
      // deterministic and the WHOLE two-round pipeline hash-matches the
      // DuckDB oracle (was rows-only while means rode double avg());
      // SimilaritySearchSpec additionally pins recall vs brute force
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nLists = 16, nProbe = 4, iters = 2)
        .orderBy(col("query_id"), col("rank"))
    }),

    "sim_ivf_topk_quantized" -> ((s, dir) => {
      // IVF-SQ8 composite: inverted lists + int8 codes (the FAISS
      // IVF+SQ8 memory shape). Portable micro-unit centroids + the
      // ANSI-portable quantizer keep the whole build→probe→re-rank
      // pipeline hash-oracled
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.ivfQuantizedTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nLists = 16, nProbe = 4, iters = 2)
        .orderBy(col("query_id"), col("rank"))
    }),

    "pipeline_rag" -> ((s, dir) => {
      // the retrieval flagship: hybrid RRF recall (BM25 + cosine) →
      // embedding-space MMR de-redundancy → overlapping context
      // windows of the survivors — the full RAG context-assembly path
      // in ONE plan, every stage integer-exact and the composite
      // oracled end to end
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val fused = graft.operators.sim.HybridSearch.hybridTopK(docs, emb, 0L until 3L,
        "doc_id", "text", "vec_id", "embedding", k = 10, pool = 20)
      val sel = graft.operators.sim.Diversify.mmrFromPool(
        fused.select(col("query_id"), col("corpus_id")), emb, "vec_id", "embedding", k = 3)
      val selDocs = docs.join(broadcast(sel.select(col("corpus_id")).distinct()),
          docs("doc_id") === col("corpus_id"))
        .select(docs("doc_id"), docs("text"))
      val chunks = TextAnalysis.chunkWindows(selDocs, "doc_id", "text", width = 10, stride = 5)
      sel.join(chunks, sel("corpus_id") === chunks("doc_id"))
        .select(col("query_id"), col("rank"), col("corpus_id"), col("chunk_idx"),
          col("chunk"), col("n_tokens"))
        .orderBy(col("query_id"), col("rank"), col("chunk_idx"))
    }),

    "sim_hybrid_rrf" -> ((s, dir) => {
      // hybrid retrieval: BM25 over each query doc's own text + exact
      // cosine over its embedding, reciprocal-rank-fused with integer
      // 10^6 div (60+rank) scores — rank-space fusion needs no score
      // calibration and the whole composite hash-oracles. Absent-pool
      // sentinel rank 0 keeps columns non-null BIGINT (no dtype drift)
      graft.operators.sim.HybridSearch.hybridTopK(
          t(s, dir, "documents"), t(s, dir, "embeddings"), 0L until 10L,
          "doc_id", "text", "vec_id", "embedding", k = 10, pool = 20)
        .orderBy(col("query_id"), col("rank"))
    }),

    "text_pmi_collocations" -> ((s, dir) => {
      // PMI collocation mining: the multiword-expression extractor;
      // exact BIGINT ratio, one ln, one rounding — hash-oracled
      TextAnalysis.pmiCollocations(t(s, dir, "documents"), "text", k = 50, minCount = 5)
    }),

    "q15_above_avg" -> ((s, dir) => {
      // scalar-subquery shape: suppliers above the mean supplier
      // revenue — the avg comparison cross-multiplies (rev·n > total)
      // so no division ever rounds; exercises Catalyst's aggregate →
      // broadcast-scalar → filter pipeline
      val li = t(s, dir, "lineitem")
      val rev = li.groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(22, 4))).as("rev"))
      val tot = rev.agg(sum(col("rev")).as("tot"), count(lit(1)).as("cnt"))
      rev.join(broadcast(tot))
        .filter(col("rev") * col("cnt") > col("tot"))
        .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("rev").cast("double").as("revenue"))
        .orderBy(col("s_suppkey"))
    }),

    "q16_attribution" -> ((s, dir) => {
      // last-touch attribution: each purchase credits the user's most
      // recent PRECEDING non-purchase event type ('direct' when none)
      // — one user-partitioned IGNORE-NULLS window, then a tiny rollup
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "events").filter(col("ts").isNotNull)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      e.withColumn("touch",
          last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("direct")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("revenue"))
        .orderBy(col("channel"))
    }),

    "stats_active_users" -> ((s, dir) => {
      // DAU + rolling 7-day distinct actives: rolling distinct is not
      // window-summable, so days join their trailing pair window —
      // pairs x 7 rows, day list broadcast
      graft.operators.TableStats.activeUsers(t(s, dir, "events"), "ts", "user_id")
        .orderBy(col("day"))
    }),

    "layout_compaction_plan" -> ((s, dir) => {
      // order-preserving bin packing of day-files into ~64 KiB
      // compaction jobs: exclusive running sum div target — the
      // manifest-sized maintenance plan behind every streaming ingest
      graft.sinks.CompactionPlanner.planEventCompaction(
          t(s, dir, "events"), "ts", "props", targetBytes = 65536L)
        .orderBy(col("day"))
    }),

    "layout_zorder" -> ((s, dir) => {
      // Morton-curve layout evidence: lineitem bucketed by top z-value
      // bits of (l_orderkey, l_partkey) with per-bucket min/max of
      // BOTH columns — the numbers a scan planner prunes on; spans
      // stay compact in both dimensions where a plain sort leaves the
      // second column full-width (pinned in ZOrderSpec)
      graft.sinks.ZOrderLayout.zorderStats(
          t(s, dir, "lineitem"), "l_orderkey", "l_partkey", bits = 10, bucketBits = 6)
        .orderBy(col("bucket"))
    }),

    "layout_zorder3" -> ((s, dir) => {
      // three-column Morton curve (OPTIMIZE ZORDER BY a,b,c): 10-bit
      // codes interleave to 30 bits, per-bucket spans bound ALL THREE
      // columns — a lexicographic sort bounds only its leading one
      graft.sinks.ZOrderLayout.zorderStats3(
          t(s, dir, "lineitem"), "l_orderkey", "l_partkey", "l_suppkey",
          bits = 10, bucketBits = 6)
        .orderBy(col("bucket"))
    }),

    "layout_zorder_source" -> ((s, dir) => {
      // the corpus-layout cluster: documents z-ordered by (source
      // string, n_chars) rank codes — a scan filtered on EITHER the
      // domain or the length band prunes; string ranks are byte-order
      // on both engines so every code hash-matches
      graft.sinks.ZOrderLayout.zorderStatsRankBy(
          t(s, dir, "documents").filter(col("source").isNotNull && col("n_chars").isNotNull),
          "source", "n_chars", bits = 10, bucketBits = 4)
        .orderBy(col("bucket"))
    }),

    "layout_zorder_rank" -> ((s, dir) => {
      // quantile-rank z-order codes: every bucket holds ≈ equal rows
      // regardless of value distribution — the skew-proof variant
      // (linear codes collapse under an outlier key; ZOrderSpec pins
      // the divergence), all-integer so the layout hash-oracles
      graft.sinks.ZOrderLayout.zorderStatsRank(
          t(s, dir, "lineitem"), "l_orderkey", "l_partkey", bits = 10, bucketBits = 6)
        .orderBy(col("bucket"))
    }),

    "sim_kmeans_clusters" -> ((s, dir) => {
      // corpus domain discovery: exact integer k-means (the coarse
      // train loop at m=1) → per-cluster membership, corpus share,
      // inertia — the mixture-balancer's input statistics; the whole
      // train→assign→aggregate path shares the PQ oracle machinery
      graft.operators.sim.ProductQuantizer.kmeansClusterStats(
          t(s, dir, "embeddings"), "vec_id", "embedding", dim = 64, k = 8, iters = 1)
        .orderBy(col("cluster_id"))
    }),

    "sim_mmr_topk" -> ((s, dir) => {
      // MMR diversification: greedy max(min-dist-to-selected − dist-to-
      // query) over the exact integer-L2 pool — the de-redundancy pass
      // between retrieval and consumption; selection fully unrolled as
      // dataframe stages and integer-exact, so the greedy order oracles
      val emb = t(s, dir, "embeddings")
      graft.operators.sim.Diversify.mmrTopK(emb,
          emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5, pool = 20)
        .orderBy(col("query_id"), col("rank"))
    }),

    "sim_ivf_pq_topk" -> ((s, dir) => {
      // FAISS IVF16,PQ8 (by_residual=false): coarse integer k-means
      // (the PQ train loop with m=1) prunes to 4 probed lists, PQ codes
      // answer via native ADC inside them — both scale levers composed,
      // every distance exact integer, the composite fully oracled
      val emb = t(s, dir, "embeddings")
      graft.operators.sim.ProductQuantizer.ivfPqTopK(emb,
          emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, dim = 64, nLists = 16, nProbe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    "sim_ivfpq_index_probe" -> ((s, dir) => {
      // the deployed ANN shape: the SAME IVF16,PQ8 search but over a
      // PERSISTED index read back from parquet — codes partitioned by
      // list id (the on-disk inverted file), so the probe join prunes
      // to the probed list directories; shares sim_ivf_pq_topk's
      // hash oracle (train→store→load→search must lose nothing)
      val emb = t(s, dir, "embeddings")
      val ix = graft.TempDirs.scratch("graft_ivfpq_ix")
      graft.operators.sim.ProductQuantizer.buildIvfPqIndex(
        emb, "vec_id", "embedding", ix, dim = 64, nLists = 16)
      graft.operators.sim.ProductQuantizer.ivfPqTopKFromIndex(
          s, ix, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, dim = 64, nLists = 16, nProbe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    "sim_pq_topk" -> ((s, dir) => {
      // Product quantization (FAISS PQ8): per-subspace codebooks with
      // integer-micro centroids, so assignment and ADC are EXACT
      // BIGINT arithmetic — the entire train→encode→search pipeline
      // hash-matches the oracle with no float fold anywhere
      val emb = t(s, dir, "embeddings")
      graft.operators.sim.ProductQuantizer.adcTopK(emb,
          emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5, dim = 64)
        .orderBy(col("query_id"), col("rank"))
    }),

    "sim_pq_topk_refined" -> ((s, dir) => {
      // the deployed PQ shape (FAISS IndexRefineFlat): ADC prunes the
      // corpus on 32x-compressed codes, exact integer-L2 re-ranks the
      // top-50 — recall pinned in PqSpec, and the refine stage is
      // integer-exact too, so even this composite is fully oracled
      val emb = t(s, dir, "embeddings")
      graft.operators.sim.ProductQuantizer.adcTopKRefined(emb,
          emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, dim = 64, rerank = 50)
        .orderBy(col("query_id"), col("rank"))
    }),

    "sim_ivf_topk_seed" -> ((s, dir) => {
      // the IVF witness: iters=0 keeps the deterministic seed centroids
      // (the nLists lowest-id vectors), so assignment, probing, and
      // re-rank all reproduce in DuckDB — the full inverted-file search
      // machinery gets a hash oracle, with only the Lloyd refinement
      // excluded (covered by sim_ivf_topk + spec)
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nLists = 16, nProbe = 4, iters = 0)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ----- beyond-parity: text analysis -----

    "text_profile" -> ((s, dir) => {
      // contract: null-text docs are excluded from text-derived outputs
      TextAnalysis.profile(t(s, dir, "documents")
          .filter(col("text").isNotNull), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "sample_quality_prune" -> ((s, dir) => {
      // bottom-half pruning against a PER-SOURCE exact median: the
      // global-threshold filter pattern. One text scan, ONE narrow
      // shuffle (doc_id, source, q_micros — never the text) keyed by
      // source; the median lands via a second window on the SAME
      // exchange (rank + count + pick-at-rank), so no threshold
      // re-join and no second scan of the expensive profile.
      import org.apache.spark.sql.expressions.Window
      val q = graft.operators.Partitioning.ensureMinParallelism(
          t(s, dir, "documents").filter(col("text").isNotNull))
        .select(col("doc_id"), col("source"),
          round(call_function("graft_text_profile", col("text"))
            .getField("quality") * 1000000).cast("long").as("q_micros"))
      val wOrd = Window.partitionBy(col("source")).orderBy(col("q_micros"), col("doc_id"))
      val wAll = Window.partitionBy(col("source"))
      q.withColumn("_rn", row_number().over(wOrd))
        .withColumn("_n", count(lit(1)).over(wAll))
        .withColumn("source_median_micros",
          max(when(col("_rn") === ceil(col("_n") * 0.5), col("q_micros"))).over(wAll))
        .filter(col("q_micros") >= col("source_median_micros"))
        .select(col("doc_id"), col("source"), col("q_micros"),
          col("source_median_micros"))
        .orderBy(col("doc_id"))
    }),

    "sample_dsir" -> ((s, dir) => {
      // DSIR data selection: top-200 docs by target-domain importance
      // (src0 is the target), TakeOrdered on an exact-integer weight
      val docs = t(s, dir, "documents")
      TextAnalysis.dsirWeights(docs, docs.filter(col("source") === "src0"),
          "doc_id", "text")
        .orderBy(col("weight_micros").desc, col("doc_id"))
        .limit(200)
    }),

    "text_classify_nb" -> ((s, dir) => {
      // closed-form NB corpus filter: train on id%5!=0, score held-out
      TextAnalysis.nbClassify(t(s, dir, "documents"), "doc_id", "text", "lang")
        .orderBy(col("doc_id"))
    }),

    "contamination_spans" -> ((s, dir) => {
      // verbatim span leakage: eval (id%10==0) windows vs the distinct
      // train hash set — membership, not multiplicity, so no pair blowup
      val docs = t(s, dir, "documents")
      graft.operators.text.SpanDedup.contaminatedSpans(
          docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(10)) === 0),
          "doc_id", "text", n = 5)
        .orderBy(col("doc_id"), col("span_start"))
    }),

    "text_repetition_gopher" -> ((s, dir) => {
      // top-ngram char coverage (n=2,3,4) + duplicate-line char
      // fraction: the rest of the Gopher repetition battery
      TextAnalysis.gopherRepetition(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "text_quality_gopher" -> ((s, dir) => {
      // Gopher rule gate: native one-pass counts, exact-integer rules
      TextAnalysis.gopherGate(t(s, dir, "documents")
          .filter(col("text").isNotNull), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "text_rolling_hash" -> ((s, dir) => {
      // md5-derived token hashes, exact 64-bit fold → full DuckDB oracle
      // (list_reduce); order-sensitivity asserted in TextAnalysisSpec
      graft.operators.Partitioning.ensureMinParallelism(
          t(s, dir, "documents").filter(col("text").isNotNull))
        .select(col("doc_id"), TextAnalysis.rollingHash(col("text")).as("rhash"))
        .orderBy(col("doc_id"))
    }),

    "text_repetition" -> ((s, dir) => {
      // intra-document repetition signals (Gopher-style gates)
      graft.operators.Partitioning.ensureMinParallelism(
          t(s, dir, "documents").filter(col("text").isNotNull))
        .select(col("doc_id"),
          round(TextAnalysis.duplicateNgramFraction(col("text"), 1), 6).as("dup_word_frac"),
          round(TextAnalysis.duplicateNgramFraction(col("text"), 2), 6).as("dup_bigram_frac"))
        .orderBy(col("doc_id"))
    }),

    "dedup_paragraph" -> ((s, dir) => {
      // sub-document dedup (C4/RefinedWeb boilerplate pass): duplicate
      // 10-word paragraph blocks removed corpus-wide, first occurrence
      // wins; only (id, idx, md5) cross the one shuffle
      Dedup.paragraphDedup(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"), col("para_idx"))
    }),

    "text_chunk" -> ((s, dir) => {
      // overlapping context windows (50 words, stride 40): the step
      // between raw docs and sequence packing; zero shuffles
      TextAnalysis.chunkWindows(t(s, dir, "documents"), "doc_id", "text",
          width = 50, stride = 40)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    "dedup_containment" -> ((s, dir) => {
      // directional containment pairs: the subset/quotation case
      // symmetric Jaccard misses (same candidate machinery + skew caps)
      graft.operators.dedup.Dedup.containmentPairs(
          t(s, dir, "documents"), "doc_id", "text",
          n = 3, threshold = 0.8, maxShingleDf = 50)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "corpus_diff" -> ((s, dir) => {
      // corpus version diff: two snapshots synthesized deterministically
      // from the fixture (oracle reproduces the exact construction) —
      // ids %7 drop out of old, %3 out of new, %5 get edited content
      val docs = t(s, dir, "documents")
      val oldV = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      val newV = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
        .withColumn("text", when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      graft.operators.CorpusDiff.diff(oldV, newV, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "text_dup_spans" -> ((s, dir) => {
      // substring-level exact dedup (Lee et al. 2022 position-window
      // form): merged spans of 10-word windows occurring 2+ times
      // corpus-wide — the boilerplate that straddles paragraph edges
      graft.operators.text.SpanDedup.duplicatedSpans(
          t(s, dir, "documents"), "doc_id", "text", n = 10)
        .orderBy(col("doc_id"), col("span_start"))
    }),

    "text_span_trim" -> ((s, dir) => {
      // the cutting pass over the same spans: every duplicated span
      // removed from the normalized token stream, 1:1 with input docs
      graft.operators.text.SpanDedup.trimSpans(
          t(s, dir, "documents"), "doc_id", "text", n = 10)
        .orderBy(col("doc_id"))
    }),

    "text_tfidf" -> ((s, dir) => {
      // per-doc TF-IDF keywords (top-3, integer-micros scores so the
      // derivation hash-matches; ties total-ordered by term)
      TextAnalysis.tfIdfTopK(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("score_micros").desc, col("term"))
    }),

    "text_lm_score" -> ((s, dir) => {
      // CCNet-style perplexity filter: bigram LM trained on the src0
      // slice, every doc scored by avg negative log-likelihood
      val docs = t(s, dir, "documents")
      TextAnalysis.lmCrossEntropy(docs, docs.filter(col("source") === "src0"),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "tokenizer_bpe_train" -> ((s, dir) => {
      // the full iterative BPE training loop (8 merge rounds), not just
      // the first-round statistic: corpus scanned once into word
      // counts, every round runs on the cached vocabulary, one argmax
      // row reaches the driver per round. Code-point symbols + plain
      // replace keep both engines merging identically
      graft.operators.text.BpeTrainer.train(t(s, dir, "documents"), "text", merges = 8)
        .orderBy(col("step"))
    }),

    "tokenizer_bpe_fast" -> ((s, dir) => {
      // the SCALE path of the same training: vocab collected after the
      // one corpus aggregation, merge loop driver-side with incremental
      // pair counts — O(1) Spark jobs for any merge count (a 32k-merge
      // vocab costs what 8 does, where the distributed loop pays
      // 2 jobs/round). Must produce bit-identical merges: shares
      // tokenizer_bpe_train's hash oracle
      graft.operators.text.BpeTrainer.trainLocal(t(s, dir, "documents"), "text", merges = 8)
        .orderBy(col("step"))
    }),

    "tokenizer_bpe_encode" -> ((s, dir) => {
      // the ENCODE half: train 8 merges (via the O(1)-job trainLocal —
      // bit-equal to the distributed trainer, proven in BpeTrainerSpec
      // and by tokenizer_bpe_fast sharing the train oracle), replay
      // the merge table over docs 0-49 at scan speed
      import s.implicits._
      val docs = t(s, dir, "documents")
      val merges = graft.operators.text.BpeTrainer.trainLocal(docs, "text", merges = 8)
        .orderBy(col("step")).select("lhs", "rhs").as[(String, String)].collect().toSeq
      graft.operators.text.BpeTrainer.encode(
          docs.filter(col("doc_id") < 50), "doc_id", "text", merges)
        .select(col("doc_id"), col("wpos"),
          array_join(col("symbols"), " ").as("sym_text"),
          size(col("symbols")).as("n_symbols"))
        .orderBy(col("doc_id"), col("wpos"))
    }),

    "text_bm25_topk" -> ((s, dir) => {
      // Okapi BM25 lexical retrieval: k1/b as exact rationals reduce
      // the tf weight to one BIGINT ratio, idf rounded once per
      // distinct df — the whole ranking is integer-exact and
      // hash-matches the oracle. Query terms broadcast; the corpus
      // never shuffles for the match.
      import s.implicits._
      val qs = Seq((1L, "spark join table"), (2L, "window agg stream"),
        (3L, "hash merge sort batch"), (4L, "the cat and naïve 😀"))
        .toDF("query_id", "qtext")
      graft.operators.text.Bm25.topK(t(s, dir, "documents"), qs,
          "doc_id", "text", "query_id", "qtext", k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    "text_bm25_prf" -> ((s, dir) => {
      // RM3 pseudo-relevance feedback: top-5 feedback docs nominate
      // their highest tf*idf terms (originals anti-joined away), the
      // expanded term set retrieves the final top-10 — two passes over
      // ONE postings plan, feedback pool broadcast, all-BIGINT weights
      import s.implicits._
      val qs = Seq((1L, "spark join table"), (2L, "window agg stream"),
        (3L, "hash merge sort batch"), (4L, "the cat and naïve 😀"))
        .toDF("query_id", "qtext")
      graft.operators.text.Bm25.prfTopK(t(s, dir, "documents"), qs,
          "doc_id", "text", "query_id", "qtext", k = 10, fb = 5, expand = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    "text_bm25_percolate" -> ((s, dir) => {
      // the percolator: standing queries, incoming docs (ids 100-119
      // play the stream batch), frozen index stats — every (query, doc)
      // match with its score, no top-k; streaming parity in Bm25Spec
      import s.implicits._
      val docs = t(s, dir, "documents")
      val qs = Seq((1L, "spark join table"), (2L, "window agg stream"),
        (3L, "hash merge sort batch"), (4L, "the cat and naïve 😀"))
        .toDF("query_id", "qtext")
      val post = graft.operators.text.Bm25.postings(docs, "doc_id", "text")
      graft.operators.text.Bm25.percolate(
          graft.operators.text.Bm25.termDf(post),
          graft.operators.text.Bm25.corpusStats(docs, "text"),
          qs, "query_id", "qtext",
          docs.filter(col("doc_id").between(100, 119)), "doc_id", "text")
        .orderBy(col("query_id"), col("doc_id"))
    }),

    "text_bm25_index_probe" -> ((s, dir) => {
      // the stored-index path: postings persisted once (sorted by term
      // for row-group skipping), the probe scores straight off the
      // parquet read-back — must reproduce the one-shot plan exactly
      import s.implicits._
      // per-run unique dir (two concurrent fuzz seeds must not clobber
      // each other's index), reaped at JVM exit by TempDirs
      val ix = graft.TempDirs.scratch("graft_bm25_ix")
      graft.operators.text.Bm25.buildIndex(t(s, dir, "documents"), "doc_id", "text", ix)
      val qs = Seq((1L, "spark join table"), (2L, "window agg stream"),
        (3L, "hash merge sort batch"), (4L, "the cat and naïve 😀"))
        .toDF("query_id", "qtext")
      graft.operators.text.Bm25.scoreAgainstIndex(
          s.read.parquet(s"$ix/postings"), s.read.parquet(s"$ix/stats"),
          qs, "query_id", "qtext", k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    "tokenizer_bpe_pairs" -> ((s, dir) => {
      // BPE training's inner loop: weighted adjacent char-pair counts
      // over the vocabulary; the argmax is the next merge
      TextAnalysis.bpePairStats(t(s, dir, "documents"), "text", k = 50)
    }),

    "text_top_ngrams" -> ((s, dir) => {
      // corpus n-gram mining for blocklists/boilerplate: doc frequency
      // of distinct-per-doc 3-grams, top-50 on a total order
      TextAnalysis.topNgrams(t(s, dir, "documents"), "text", n = 3, k = 50)
    }),

    "text_redact" -> ((s, dir) => {
      // deterministic PII synthesized from fixture columns (oracle
      // reproduces the exact input), then URL/email/phone redaction
      val synth = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"),
        concat(substring(col("text"), 1, 40),
          lit(" reach me at user"), col("doc_id"), lit("@example.com or https://site"),
          col("doc_id"), lit(".example/page?q=1 call 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")).as("raw"))
      synth.select(col("doc_id"), TextAnalysis.redactPii(col("raw")).as("redacted"))
        .orderBy(col("doc_id"))
    }),

    "pipeline_ingest" -> ((s, dir) => {
      // the continual-ingest flagship: gate -> dedup vs accumulated
      // index -> deterministic split; counterpart of pipeline_curate
      val docs = t(s, dir, "documents")
      graft.operators.TrainingDataPipeline.ingest(
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "pipeline_refine" -> ((s, dir) => {
      // flagship composition over the r6 text operators, one plan:
      // cut duplicated spans -> gate on surviving token mass -> chunk
      // into overlapping context windows (what actually feeds packing
      // after boilerplate removal). Every stage oracle-expressible.
      val trimmed = graft.operators.text.SpanDedup.trimSpans(
        t(s, dir, "documents"), "doc_id", "text", n = 10)
      val gated = trimmed.filter(
        TextAnalysis.tokenCount(col("text_trimmed")) >= 10)
      TextAnalysis.chunkWindows(gated, "doc_id", "text_trimmed",
          width = 50, stride = 40)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    "pipeline_datacard" -> ((s, dir) => {
      // the artifact handed to the training team: per (split, source)
      // docs / tokens / content groups AFTER the quality funnel, with
      // the split assigned on each doc's exact-dup GROUP representative
      // (copies can never straddle train/val) — gate ∧ perplexity
      // survivors, one doc_id-keyed funnel, one fp-keyed rep join,
      // then a partial-aggregated datacard rollup.
      val docs = t(s, dir, "documents")
      val gate = TextAnalysis.gopherGate(docs, "doc_id", "text")
        .filter(col("r_words") + col("r_mwl") + col("r_sym") + col("r_bullet")
          + col("r_ellipsis") + col("r_alpha") === 6)
        .select(col("doc_id"), col("n_words"))
      val lm = TextAnalysis.lmCrossEntropy(docs,
          docs.filter(col("source") === "src0"), "doc_id", "text")
        .filter(col("avg_nll_micros") < 3550000L)
        .select(col("doc_id"))
      val fp = docs.select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      val rep = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("rep"))
      val surv = docs.select(col("doc_id"), col("source"))
        .join(gate.hint("shuffle_hash"), "doc_id")
        .join(lm.hint("shuffle_hash"), "doc_id")
        .join(fp.hint("shuffle_hash"), "doc_id")
        .join(rep.hint("shuffle_hash"), "fp")
      graft.operators.Sampling.assignSplit(surv, "rep",
          Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_tokens"),
          count_distinct(col("fp")).as("n_groups"))
        .orderBy(col("split"), col("source"))
    }),

    "pipeline_quality" -> ((s, dir) => {
      // flagship composition over the r6 quality operators, one plan:
      // Gopher structural gate (the 6 language-independent rules — the
      // English-stopword rule is dropped exactly as multilingual
      // pipelines drop it) AND bigram-LM perplexity below threshold
      // AND exact-dup first-wins. All three predicates key on doc_id,
      // so the three joins reuse one hash partitioning; every stage is
      // integer-exact and the whole funnel hash-oracles.
      val docs = t(s, dir, "documents")
      val gate = TextAnalysis.gopherGate(docs, "doc_id", "text")
        .filter(col("r_words") + col("r_mwl") + col("r_sym") + col("r_bullet")
          + col("r_ellipsis") + col("r_alpha") === 6)
        .select(col("doc_id"), col("n_words"))
      val lm = TextAnalysis.lmCrossEntropy(docs,
          docs.filter(col("source") === "src0"), "doc_id", "text")
        .filter(col("avg_nll_micros") < 3550000L)
        .select(col("doc_id"), col("avg_nll_micros"))
      val rep = docs
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      docs.select(col("doc_id"), col("source"))
        .join(gate.hint("shuffle_hash"), "doc_id")
        .join(lm.hint("shuffle_hash"), "doc_id")
        .join(rep.hint("shuffle_hash"), "doc_id")
        .orderBy(col("doc_id"))
    }),

    "pipeline_curate" -> ((s, dir) => {
      // flagship composition: profile gate -> exact dedup -> near-dup
      // clustering -> representatives; every stage oracle-expressible
      graft.operators.TrainingDataPipeline.curate(
          t(s, dir, "documents"), "doc_id", "text",
          minQuality = 0.5, jaccardThreshold = 0.5, maxShingleDf = 50)
        .orderBy(col("doc_id"))
    }),

    "pipeline_curate_to" -> ((s, dir) => {
      // the write-through deployment shape: same curation, but the
      // working-set pin survives through the parquet write (one fewer
      // corpus pass) and the returned lineage is the written files —
      // must be row-identical to pipeline_curate (same oracle)
      val out = java.nio.file.Files.createTempDirectory("graft_curate_to_")
        .resolve("corpus").toString
      graft.operators.TrainingDataPipeline.curateTo(
          t(s, dir, "documents"), "doc_id", "text", out,
          minQuality = 0.5, jaccardThreshold = 0.5, maxShingleDf = 50)
        .orderBy(col("doc_id"))
    }),

    "stats_profile" -> ((s, dir) => {
      // column-level profiling in one scan (training-data quality
      // surface): row/null/distinct counts + min/max per column
      graft.operators.TableStats.profile(t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy(col("column_name"))
    }),

    "sql_surface" -> ((s, dir) => {
      // the whole engine from pure SQL: fixture views + graft_* native
      // functions in the registry — no Column API anywhere
      Tables.registerViews(s, dir)
      s.sql(
        """SELECT doc_id,
          |  profile.n_tokens AS n_tokens,
          |  round(profile.quality, 6) AS quality,
          |  profile.lang_pred AS lang_pred,
          |  size(graft_shingles(text, 3)) AS n_shingles
          |FROM (SELECT doc_id, text, graft_text_profile(text) AS profile FROM documents)
          |ORDER BY doc_id""".stripMargin)
    }),

    "corpus_rollup" -> ((s, dir) => {
      // grouping-set reporting (§2.6 surface): per-(source, lang)
      // counts with subtotals and grand total in ONE pass — Spark
      // plans ROLLUP as a single Expand + aggregate, not three scans.
      // Sort order pins NULLS LAST explicitly: Spark's ascending
      // default is nulls-first, DuckDB's is nulls-last, and rollup
      // marker rows are exactly the null-keyed ones
      t(s, dir, "documents")
        .rollup(col("source"), col("lang"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .select(col("source"), col("lang"), col("gid"), col("n_docs"), col("sum_chars"))
        .orderBy(col("gid"), col("source").asc_nulls_last, col("lang").asc_nulls_last)
    }),

    "stats_corr" -> ((s, dir) => {
      // per-source Pearson corr(n_chars, token_count) via EXACT integer
      // moments: decimal sums commute (unlike float partial sums, whose
      // order differs per run/engine — built-in corr() can never hash-
      // oracle), so the one double expression at the end is bit-stable
      val x = col("n_chars").cast(DecimalType(38, 0))
      val y = TextAnalysis.tokenCount(col("text")).cast(DecimalType(38, 0))
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).cast(DecimalType(38, 0)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"))
        .select(col("source"),
          // each variance factor stays exact in Decimal(38,0) (~1e28 at
          // 1e9 docs/source), but their PRODUCT is ~56 digits — Decimal
          // would silently null out (and DuckDB's HUGEINT would throw),
          // so cast per-factor to double and multiply in IEEE space.
          // Nonzero factors are integers >= 1, so the product can't
          // underflow to 0 and the zero test is per-factor exact.
          round(when(
              (col("n") * col("sxx") - col("sx") * col("sx")) === 0 ||
                (col("n") * col("syy") - col("sy") * col("sy")) === 0, lit(null))
            .otherwise(
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                  (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
            6).as("corr_chars_tokens"))
        .orderBy(col("source"))
    }),

    "corpus_pivot" -> ((s, dir) => {
      // wide-format reporting via the relational pivot API: source ×
      // lang doc counts in one conditional-aggregate pass (explicit
      // value list — no extra distinct-scan job, and the output schema
      // is static, which is what a 100 TB run wants anyway)
      t(s, dir, "documents")
        .groupBy(col("source"))
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("source"))
    }),

    "corpus_report" -> ((s, dir) => {
      // per-source corpus health: the monitoring dashboard a curation
      // pipeline watches. The hashed output is integer-only (micro-units):
      // per-doc quality is already quantized to 6 decimals (TextProfile
      // round6), so round(quality*1e6) sits within ~1e-4 of an integer —
      // no rounding boundary any engine version can land on differently,
      // and no DOUBLE or DECIMAL cast survives into the hashed columns.
      // Sums ride in DECIMAL(38,0) so the 2*sum*1e6 intermediate cannot
      // wrap a Long at corpus scale; every numerator is non-negative by
      // construction (quality in [0,1], n_tokens >= 0), so truncating
      // `div` == floor on both engines and half-up = (2s+n) div (2n).
      // Single scan: the profile expression runs inline next to the
      // group key — profile()+self-join would shuffle the corpus twice.
      val p = call_function("graft_text_profile", col("text"))
      graft.operators.Partitioning.ensureMinParallelism(
          t(s, dir, "documents").filter(col("text").isNotNull))
        .select(col("source"), p.getField("n_tokens").as("n_tokens"),
          round(p.getField("quality") * 1000000).cast("long").as("q_micros"),
          p.getField("lang_pred").as("lang_pred"),
          p.getField("fingerprint").as("fingerprint"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("q_micros").cast(DecimalType(38, 0))).as("_sum_q_micros"),
          sum(when(col("lang_pred") === "und", 1L).otherwise(0L)).as("n_und"),
          sum(col("n_tokens").cast(DecimalType(38, 0))).as("_sum_tokens"),
          (count(lit(1)) - count_distinct(col("fingerprint"))).as("n_exact_dups"))
        .select(col("source"), col("n_docs"),
          expr("CAST((2 * _sum_q_micros + n_docs) div (2 * n_docs) AS BIGINT)")
            .as("avg_quality_micros"),
          col("n_und"),
          expr("CAST((2 * _sum_tokens * 1000000 + n_docs) div (2 * n_docs) AS BIGINT)")
            .as("avg_tokens_micros"),
          col("n_exact_dups"))
        .orderBy(col("source"))
    }),

    "stats_histogram" -> ((s, dir) => {
      // token-length distribution: exact fixed-width histogram (the
      // truncation-budget surface), one shuffle on <= nBins+2 keys
      graft.operators.TableStats.histogram(
          t(s, dir, "documents").filter(col("text").isNotNull)
            .select(TextAnalysis.tokenCount(col("text")).as("v")),
          col("v"), 0.0, 100.0, 10)
        .orderBy(col("bin"))
    }),

    "stats_quantiles" -> ((s, dir) => {
      // exact per-source discrete quantiles (rank ceil(p*n), ties by
      // doc_id): the length-budget surface, reproducible bit-for-bit
      // on any engine — no percentile interpolation
      graft.operators.TableStats.groupQuantiles(
          t(s, dir, "documents"), "source", "n_chars", "doc_id",
          Seq(0.25, 0.5, 0.9, 0.99))
        .orderBy(col("source"))
    }),

    // ----- beyond-parity: multimodal plumbing -----

    "mm_features" -> ((s, dir) => {
      // synthetic binary payloads (deterministic); decode is a marked
      // STUB (no codec libs in-container) — plumbing is real. The
      // stub-independent columns (true payload sha256, byte count) are
      // DuckDB-oracled; the stub features stay in MultimodalSpec.
      Multimodal.extractFeatures(Multimodal.synthesize(s, 200), dim = 8)
        .select(col("media_id"), col("kind"), col("n_bytes"), col("sha"))
        .orderBy(col("media_id"))
    }),

    "mm_resize" -> ((s, dir) => {
      // batched resize through the stub codec (truncate-to-w*h):
      // payload bytes deterministic -> DuckDB sha-matches every resized
      // payload, proving the mapPartitions batch plumbing end-to-end
      Multimodal.resizeAll(Multimodal.synthesize(s, 200), 16, 16)
        .toDF()
        .select(col("media_id"), col("kind"), length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("sha"), col("width"), col("height"))
        .orderBy(col("media_id"))
    }),

    "mm_frames" -> ((s, dir) => {
      // video frame sampling: fat binary rows explode to per-frame
      // slices via flatMap (no output row inherits the full payload);
      // the slice bytes are deterministic, so DuckDB rebuilds and
      // sha-matches every frame payload end-to-end
      Multimodal.sampleFrames(Multimodal.synthesize(s, 200), everyMs = 1000L)
        .toDF()
        .select(col("media_id"), col("frame_idx"), col("ts_ms"),
          length(col("payload")).as("n_bytes"), sha2(col("payload"), 256).as("sha"))
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // ----- beyond-parity: training-set assembly -----

    "pack_sequences" -> ((s, dir) => {
      // greedy token-budget packing per shard (source = shard key)
      SeqPacking.pack(t(s, dir, "documents"), "doc_id", "text", "source", 512)
        .toDF().orderBy(col("shard"), col("doc_id"))
    }),

    "pack_stats" -> ((s, dir) => {
      SeqPacking.packStats(
          SeqPacking.pack(t(s, dir, "documents"), "doc_id", "text", "source", 512).toDF(), 512)
        .orderBy(col("shard"), col("window_idx"))
    }),

    "sample_split" -> ((s, dir) => {
      Sampling.assignSplit(t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split")).orderBy(col("doc_id"))
    }),

    "sample_mixture" -> ((s, dir) => {
      Sampling.sampleMixture(t(s, dir, "documents"), "doc_id", "source",
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1))
        .select(col("doc_id"), col("source")).orderBy(col("doc_id"))
    }),

    "sample_temperature" -> ((s, dir) => {
      // α=0.5 temperature flattening with a budget of a quarter of the
      // corpus; integer micro-weight construction → the whole mixture
      // derivation hash-matches the oracle (see temperatureMixture)
      val docs = t(s, dir, "documents")
      val target = docs.count() / 4
      Sampling.temperatureMixture(docs, "doc_id", "source", alpha = 0.5,
          targetRows = target)
        .select(col("doc_id"), col("source")).orderBy(col("doc_id"))
    }),

    "sample_token_budget" -> ((s, dir) => {
      // token-budget mixing (the trainer contract: N tokens per source,
      // not per-doc fractions); deterministic prefix selection, scalable
      // two-tier window — see Sampling.tokenBudgetSample
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      Sampling.tokenBudgetSample(docs, "doc_id", "source", "n_tokens",
          Map("src0" -> 800L, "src1" -> 1200L, "src2" -> 500L, "src3" -> 100000L))
        .orderBy(col("doc_id"))
    }),

    "sample_shuffle" -> ((s, dir) => {
      // the output IS the assertion: rows in deterministic-shuffle order
      Sampling.deterministicShuffle(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")
    }),

    "sample_weighted" -> ((s, dir) => {
      // Efraimidis-Spirakis without replacement: inclusion odds
      // proportional to n_chars, deterministic md5 draws
      Sampling.weightedSample(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", n = 100)
        .orderBy(col("priority"), col("doc_id"))
    }),

    "stats_distinct_kmv" -> ((s, dir) => {
      // per-source content cardinality: KMV sketch estimate vs the
      // exact distinct-hash count it approximates
      graft.operators.TableStats.distinctKmv(t(s, dir, "documents"), "source", "text", k = 16)
        .orderBy(col("source"))
    }),

    "pipeline_multimodal" -> ((s, dir) => {
      // image flagship: REAL byte decode -> BT.601 luminance-grid
      // features -> pairwise cosine, every stage reproduced by the
      // oracle from the pixel formula alone. Since r8 the corpus is
      // HETEROGENEOUS — each image ships in a container chosen by
      // id%3 (PPM/BMP/PNG, all lossless) and extractFeaturesAuto
      // routes per-row by mime — three different real decoders must
      // produce the identical features or the hash breaks
      import s.implicits._
      import graft.operators.multimodal.Multimodal
      import graft.operators.multimodal.Multimodal.{BmpCodec, MediaRow, PngCodec, PpmCodec}
      val imgs = s.range(16).map { i =>
        val w = 8 + (i % 5).toInt; val h = 6 + (i % 3).toInt
        val rgb = Array.tabulate[Byte](w * h * 3) { j =>
          val c = j % 3; val p = j / 3
          ((i * (7 + 4 * c) + p.toLong * (3 + 2 * c)) % 256).toByte
        }
        val (payload, mime) = (i % 3) match {
          case 0 => (PpmCodec.encode(w, h, rgb), "image/x-portable-pixmap")
          case 1 => (BmpCodec.encode(w, h, rgb), "image/bmp")
          case _ => (PngCodec.encode(w, h, rgb), "image/png")
        }
        MediaRow(i, "image", payload, mime, w, h, 0L)
      }
      val feats = Multimodal.extractFeaturesAuto(imgs, dim = 8)
        .select(col("media_id"), col("features"))
      val a = feats.select(col("media_id").as("id_a"), col("features").as("fa"))
      val b = feats.select(col("media_id").as("id_b"), col("features").as("fb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(graft.functions.VectorFunctions.cosineNative(col("fa"), col("fb")), 6)
            .as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "pipeline_monitor" -> ((s, dir) => {
      // the corpus-health dashboard in one plan: per source — snapshot
      // drift (PSI), OOV mass vs the corpus vocab, sketch quantile
      // bounds, and robust outlier counts. Every input frame reduces to
      // a per-source row before the joins, so the joins are trivial
      // regardless of corpus size
      val docs = t(s, dir, "documents")
      val tcExpr = graft.operators.text.TextAnalysis.tokenCount(col("text"))
      val drift = graft.operators.TableStats.psiDrift(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        "source", least(floor(tcExpr / lit(32.0)), lit(15L)).cast("long"))
      val cov = graft.operators.text.TextAnalysis.vocabCoverage(docs, "source", "text", 200)
        .select(col("source"), col("n_tokens"), col("oov_micros"))
      val sk = graft.operators.TableStats.histQuantilesFromSketch(
        graft.operators.TableStats.histQuantileSketch(
          docs.select(col("source"), tcExpr.cast("long").as("tc")), "source", "tc"),
        "source", Seq(0.5, 0.99))
        .select(col("source"), col("p50_hi"), col("p99_hi"))
      val outl = graft.operators.TableStats.madOutliers(
          docs.select(col("doc_id"), col("source"), tcExpr.cast("long").as("tc")),
          "source", "tc", "doc_id", k = 3)
        .groupBy(col("source")).agg(count(lit(1)).as("n_outliers"))
      drift.join(cov, "source").join(sk, "source")
        .join(outl, Seq("source"), "left")
        .select(col("source"), col("n_old"), col("n_new"), col("psi_micros"),
          col("n_tokens"), col("oov_micros"), col("p50_hi"), col("p99_hi"),
          coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
        .orderBy(col("source"))
    }),

    "emb_classify_centroid" -> ((s, dir) => {
      // Rocchio baseline: label centroids from the train slice (the
      // portable integer-micro means), held-out vectors take their
      // max-cosine centroid's label — train AND inference hash-oracled
      val e = t(s, dir, "embeddings")
      graft.operators.sim.SimilaritySearch.centroidClassify(
          e.filter(pmod(col("vec_id"), lit(5)) =!= 0),
          e.filter(pmod(col("vec_id"), lit(5)) === 0),
          "vec_id", "embedding", "label")
        .orderBy(col("vec_id"))
    }),

    "mm_wav_decode" -> ((s, dir) => {
      // REAL audio decode through the multimodal plumbing: 16-bit PCM
      // WAVs synthesized from a sawtooth formula, encoded to actual
      // RIFF bytes, decoded back by WavCodec inside mapPartitions.
      // The oracle re-derives the integer signal stats from the sample
      // formula alone — green means the byte decoder is exact
      import s.implicits._
      val codec = graft.operators.multimodal.Multimodal.WavCodec
      s.range(24).map { i =>
        val n = 400 + (i % 7).toInt * 50
        val samples = Array.tabulate[Short](n) { t =>
          (((i * 31 + t.toLong * 7) % 2001) - 1000).toShort
        }
        (i, codec.encodeWav(8000, 1, samples))
      }.mapPartitions(_.map { case (id, payload) =>
        val (rate, n, sumAbs, maxAbs, crossings) = codec.signalStats(payload)
        (id, rate, n, sumAbs, maxAbs, crossings)
      }).toDF("media_id", "sample_rate", "n_samples", "sum_abs", "max_abs", "n_crossings")
        .select(col("media_id"), col("sample_rate").cast("int").as("sample_rate"),
          col("n_samples").cast("long").as("n_samples"),
          col("sum_abs"), col("max_abs"), col("n_crossings"))
        .orderBy(col("media_id"))
    }),

    "mm_flac_decode" -> ((s, dir) => {
      // REAL lossless-audio round trip: PCM synthesized from a
      // quadratic formula (curvature exercises the order-2/3 fixed
      // predictors), compressed to actual FLAC bytes (multi-frame:
      // blockSize 128 over 400-700 samples, Rice-coded residuals,
      // CRC-8/CRC-16/MD5 all live), decoded back by FlacCodec inside
      // mapPartitions. The oracle re-derives the integer stats from
      // the sample formula alone — green means the whole
      // bitstream (headers, UTF-8 frame numbers, Rice codes,
      // prediction undo, checksums) is exact.
      import s.implicits._
      s.range(24).map { i =>
        val n = 400 + (i % 7).toInt * 50
        val samples = Array.tabulate[Short](n) { t =>
          (((i * 31 + t.toLong * t) % 2801) - 1400).toShort
        }
        (i, graft.operators.multimodal.FlacCodec.encode(8000, 1, samples, blockSize = 128))
      }.mapPartitions(_.map { case (id, payload) =>
        val (rate, ch, dec) = graft.operators.multimodal.FlacCodec.decode(payload)
        var sum = 0L; var sumAbs = 0L; var maxAbs = 0L
        dec.foreach { v =>
          sum += v; sumAbs += math.abs(v.toLong)
          maxAbs = math.max(maxAbs, math.abs(v.toLong))
        }
        (id, rate, ch, dec.length.toLong, sum, sumAbs, maxAbs)
      }).toDF("media_id", "sample_rate", "n_channels", "n_samples",
        "sum_v", "sum_abs", "max_abs")
        .orderBy(col("media_id"))
    }),

    "mm_flac_lpc" -> ((s, dir) => {
      // LPC subframes end to end: integer sine-table signals (two-pole
      // spectra that polynomial FIXED predictors cannot model but
      // order-8 quantized LPC predicts to ~quantization noise) are
      // encoded with the LPC candidate enabled, decoded back, and the
      // oracle re-derives every sample stat from the table formula.
      // lpc_wins pins the cost contest: on tonal audio the LPC stream
      // must come out strictly smaller than the FIXED-only encoding of
      // the same samples — proof the LPC path actually ran, not just
      // that the contest fell back to FIXED.
      import s.implicits._
      val sine16 = SineTable16
      s.range(18).map { i =>
        val n = 600 + (i % 5).toInt * 40
        val freq = 1 + 2 * (i % 3).toInt // odd → the phase walk covers all 16 cells
        val amp = 1 + (i % 4).toInt
        val samples = Array.tabulate[Short](n) { t =>
          (sine16(((t * freq + i) % 16).toInt) * amp).toShort
        }
        (i,
          graft.operators.multimodal.FlacCodec.encode(8000, 1, samples,
            blockSize = 192, lpcOrder = 8),
          graft.operators.multimodal.FlacCodec.encode(8000, 1, samples,
            blockSize = 192).length)
      }.mapPartitions(_.map { case (id, payload, fixedLen) =>
        val (rate, _, dec) = graft.operators.multimodal.FlacCodec.decode(payload)
        var sum = 0L; var sumAbs = 0L; var maxAbs = 0L
        dec.foreach { v =>
          sum += v; sumAbs += math.abs(v.toLong)
          maxAbs = math.max(maxAbs, math.abs(v.toLong))
        }
        (id, rate, dec.length.toLong, sum, sumAbs, maxAbs, payload.length < fixedLen)
      }).toDF("media_id", "sample_rate", "n_samples", "sum_v", "sum_abs",
        "max_abs", "lpc_wins")
        .orderBy(col("media_id"))
    }),

    "mm_flac_stereo" -> ((s, dir) => {
      // stereo decorrelation end to end: R tracks L with a small
      // integer offset, so the per-frame channel-layout contest
      // (independent vs left/side vs right/side vs mid/side, side at
      // 17 bits) must pick a decorrelated layout and the stream must
      // shrink vs independent coding — decorrelation_wins pins that —
      // while decoding back bit-exactly to the L/R formulas the
      // oracle replays.
      import s.implicits._
      val sine16 = SineTable16
      s.range(16).map { i =>
        val n = 500 + (i % 4).toInt * 60
        val amp = 2 + (i % 3).toInt
        val inter = new Array[Short](2 * n)
        var t = 0
        while (t < n) {
          val l = sine16(((t + i) % 16).toInt) * amp
          inter(2 * t) = l.toShort
          inter(2 * t + 1) = (l - ((t % 7) - 3)).toShort
          t += 1
        }
        val dec = graft.operators.multimodal.FlacCodec.encode(8000, 2, inter,
          blockSize = 256, lpcOrder = 4, decorrelate = true)
        val ind = graft.operators.multimodal.FlacCodec.encode(8000, 2, inter,
          blockSize = 256, lpcOrder = 4)
        (i, dec, ind.length)
      }.mapPartitions(_.map { case (id, payload, indLen) =>
        val (rate, ch, out) = graft.operators.multimodal.FlacCodec.decode(payload)
        var sumL = 0L; var sumR = 0L; var maxAbs = 0L
        var j = 0
        while (j < out.length) {
          if (j % 2 == 0) sumL += out(j) else sumR += out(j)
          maxAbs = math.max(maxAbs, math.abs(out(j).toLong))
          j += 1
        }
        (id, rate, ch, (out.length / 2).toLong, sumL, sumR, maxAbs,
          payload.length < indLen)
      }).toDF("media_id", "sample_rate", "n_channels", "n_frames", "sum_l",
        "sum_r", "max_abs", "decorrelation_wins")
        .orderBy(col("media_id"))
    }),

    "mm_dhash_pairs" -> ((s, dir) => {
      // image near-dup dedup on REAL bytes ACROSS CONTAINERS: each id
      // encodes its pixels as PPM, BMP, or PNG by id%3 (the scraped-web
      // reality — the same image circulates re-containered), and dHash
      // is container-agnostic, so ids 8 apart stay planted exact dups
      // (hamming 0) even when their containers differ. The oracle
      // re-derives every bit from the pixel formula without seeing a
      // byte of any container
      import s.implicits._
      import graft.operators.multimodal.Multimodal.{BmpCodec, PngCodec, PpmCodec}
      val hashes = s.range(24).map { i =>
        val b = (i % 8).toInt
        val w = 8 + b % 5; val h = 6 + b % 3
        val rgb = Array.tabulate[Byte](w * h * 3) { j =>
          val c = j % 3; val p = j / 3
          ((b.toLong * (7 + 4 * c) + p.toLong * (3 + 2 * c)) % 256).toByte
        }
        val dh = (i % 3) match {
          case 0 => PpmCodec.dHash(PpmCodec.encode(w, h, rgb))
          case 1 => BmpCodec.dHash(BmpCodec.encode(w, h, rgb))
          case _ => PngCodec.dHash(PngCodec.encode(w, h, rgb))
        }
        (i, dh)
      }.toDF("media_id", "dhash")
      hashes.alias("a").join(hashes.alias("b"),
          col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
          bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("hamming"))
        .filter(col("hamming") <= 10)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "mm_ppm_decode" -> ((s, dir) => {
      // REAL image decode through the multimodal plumbing: P6 PPM
      // images synthesized from an arithmetic pixel formula, encoded to
      // actual header+RGB bytes, decoded back by PpmCodec inside
      // mapPartitions. The oracle recomputes the channel sums straight
      // from the formula without ever seeing a byte — green means the
      // decoder inverts the encoder exactly, not just "plumbing ran"
      import s.implicits._
      val codec = graft.operators.multimodal.Multimodal.PpmCodec
      s.range(24).map { i =>
        val w = 8 + (i % 5).toInt; val h = 6 + (i % 3).toInt
        val rgb = Array.tabulate[Byte](w * h * 3) { j =>
          val c = j % 3; val p = j / 3
          ((i * (7 + 4 * c) + p.toLong * (3 + 2 * c)) % 256).toByte
        }
        (i, codec.encode(w, h, rgb))
      }.mapPartitions(_.map { case (id, payload) =>
        val (w, h, r, g, b) = codec.channelSums(payload)
        (id, w, h, w * h, r, g, b)
      }).toDF("media_id", "width", "height", "n_px", "sum_r", "sum_g", "sum_b")
        .select(col("media_id"), col("width").cast("int").as("width"),
          col("height").cast("int").as("height"), col("n_px").cast("long").as("n_px"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy(col("media_id"))
    }),

    "mm_bmp_decode" -> ((s, dir) => {
      // second REAL image container: 24-bit BMP with the format's
      // actual traps (BGR order, bottom-up rows, 4-byte padding,
      // little-endian headers). The statistic is ROW-WEIGHTED channel
      // sums — plain sums are order-invariant, so a decoder that
      // forgot the bottom-up flip would still pass them; the weight
      // makes vertical orientation part of the oracle contract
      import s.implicits._
      val codec = graft.operators.multimodal.Multimodal.BmpCodec
      s.range(24).map { i =>
        val w = 8 + (i % 5).toInt; val h = 6 + (i % 3).toInt
        val rgb = Array.tabulate[Byte](w * h * 3) { j =>
          val c = j % 3; val p = j / 3
          ((i * (7 + 4 * c) + p.toLong * (3 + 2 * c)) % 256).toByte
        }
        (i, codec.encode(w, h, rgb))
      }.mapPartitions(_.map { case (id, payload) =>
        val (w, h, r, g, b) = codec.weightedChannelSums(payload)
        (id, w, h, w * h, r, g, b)
      }).toDF("media_id", "width", "height", "n_px", "wsum_r", "wsum_g", "wsum_b")
        .select(col("media_id"), col("width").cast("int").as("width"),
          col("height").cast("int").as("height"), col("n_px").cast("long").as("n_px"),
          col("wsum_r"), col("wsum_g"), col("wsum_b"))
        .orderBy(col("media_id"))
    }),

    "mm_png_decode" -> ((s, dir) => {
      // REAL PNG through the JDK's own zlib: chunk framing + CRC32,
      // IDAT inflate, and the five per-row filters — the encoder
      // applies filter y % 5, so None/Sub/Up/Average/Paeth ALL sit on
      // the oracle path; row-weighted sums keep orientation checked.
      // (PNG needs no external codec lib — java.util.zip is the JDK.)
      import s.implicits._
      val codec = graft.operators.multimodal.Multimodal.PngCodec
      s.range(24).map { i =>
        val w = 9 + (i % 4).toInt; val h = 7 + (i % 5).toInt
        val rgb = Array.tabulate[Byte](w * h * 3) { j =>
          val c = j % 3; val p = j / 3
          ((i * (13 + 6 * c) + p.toLong * (5 + 4 * c)) % 256).toByte
        }
        (i, codec.encode(w, h, rgb))
      }.mapPartitions(_.map { case (id, payload) =>
        val (w, h, r, g, b) = codec.weightedChannelSums(payload)
        (id, w, h, w * h, r, g, b)
      }).toDF("media_id", "width", "height", "n_px", "wsum_r", "wsum_g", "wsum_b")
        .select(col("media_id"), col("width").cast("int").as("width"),
          col("height").cast("int").as("height"), col("n_px").cast("long").as("n_px"),
          col("wsum_r"), col("wsum_g"), col("wsum_b"))
        .orderBy(col("media_id"))
    }),

    "mm_gif_decode" -> ((s, dir) => {
      // REAL GIF through from-scratch LZW: variable-width codes,
      // dictionary growth, clear-code resets, 255-byte sub-blocks —
      // the compressed stream must decompress to the exact index
      // array and resolve through the palette, or the weighted sums
      // (and therefore the hash) break. Images are big enough that
      // the code width genuinely grows past 9 bits
      import s.implicits._
      val codec = graft.operators.multimodal.Multimodal.GifCodec
      s.range(12).map { i =>
        val w = 40 + (i % 4).toInt * 5; val h = 30 + (i % 3).toInt * 5
        val palette = Array.tabulate[Byte](768) { j =>
          val c = j % 3; val k = j / 3
          ((k.toLong * (3 + 2 * c) + i + 1) % 256).toByte
        }
        val idx = Array.tabulate[Byte](w * h)(p => ((i * 7 + p.toLong * 13) % 256).toByte)
        (i, codec.encode(w, h, palette, idx))
      }.mapPartitions(_.map { case (id, payload) =>
        val (w, h, r, g, b) = codec.weightedChannelSums(payload)
        (id, w, h, w * h, r, g, b)
      }).toDF("media_id", "width", "height", "n_px", "wsum_r", "wsum_g", "wsum_b")
        .select(col("media_id"), col("width").cast("int").as("width"),
          col("height").cast("int").as("height"), col("n_px").cast("long").as("n_px"),
          col("wsum_r"), col("wsum_g"), col("wsum_b"))
        .orderBy(col("media_id"))
    }),

    "mm_avi_frames" -> ((s, dir) => {
      // REAL video frame sampling: AVI-MJPEG containers built from
      // real JPEG frames, decoded and sampled at a 500 ms cadence —
      // the oracle pins the (frame_idx, ts) arithmetic while the whole
      // RIFF walk + JPEG machinery runs inside the executors (frame
      // BYTES are lossy JPEG and spec-checked, not hash-oracled)
      import s.implicits._
      import graft.operators.multimodal.Multimodal
      import graft.operators.multimodal.Multimodal.{AviMjpegCodec, JpegCodec, MediaRow}
      val vids = s.range(12).map { i =>
        val w = 16; val h = 12
        val fps = 2 + (i % 4).toInt; val nf = 5 + (i % 6).toInt
        val frames = (0 until nf).map(f => JpegCodec.encode(w, h,
          Array.tabulate[Byte](w * h * 3)(j => ((j + f * 17 + i) % 256).toByte)))
        MediaRow(i, "video", AviMjpegCodec.encode(w, h, fps, frames),
          "video/avi", w, h, nf * 1000L / fps)
      }
      Multimodal.sampleFramesMjpeg(vids, everyMs = 500)
        .select(col("media_id"), col("frame_idx"), col("ts_ms"))
        .orderBy(col("media_id"), col("ts_ms"))
    }),

    "mm_mulaw_decode" -> ((s, dir) => {
      // G.711 mu-law (WAV format 7, the telephony capture form): raw
      // law bytes synthesized from a formula, wrapped in a REAL
      // format-7 container, expanded to PCM16 by the decoder; the
      // oracle replays the canonical ulaw2linear bit algebra in SQL.
      // Position-weighted sum keeps sample ORDER part of the contract
      import s.implicits._
      val codec = graft.operators.multimodal.Multimodal.WavCodec
      s.range(24).map { i =>
        val n = 200 + (i * 10).toInt
        val ulaw = Array.tabulate[Byte](n)(p => ((i * 31 + p.toLong * 7) % 256).toByte)
        (i, codec.encodeWavMulaw(8000, 1, ulaw))
      }.mapPartitions(_.map { case (id, payload) =>
        val (rate, ch, samples) = codec.decodeWav(payload)
        var wsum = 0L; var p = 0
        while (p < samples.length) { wsum += (p + 1).toLong * samples(p); p += 1 }
        (id, rate, ch, samples.length.toLong, wsum)
      }).toDF("media_id", "sample_rate", "n_channels", "n_samples", "wsum")
        .select(col("media_id"), col("sample_rate").cast("int").as("sample_rate"),
          col("n_channels").cast("int").as("n_channels"), col("n_samples"), col("wsum"))
        .orderBy(col("media_id"))
    }),

    "corpus_lang_confusion" -> ((s, dir) => {
      // language-ID evaluation: the stopword-profile predictor scored
      // against the table's labeled lang — confusion cells plus
      // per-true-language accuracy in micros (eval tooling for any
      // classifier the gate pipeline swaps in)
      import org.apache.spark.sql.expressions.Window
      val p = graft.operators.text.TextAnalysis.profile(
        t(s, dir, "documents").filter(col("text").isNotNull), "doc_id", "text")
      val withTrue = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"))
        .join(p.select(col("doc_id"), col("lang_pred")), "doc_id")
      withTrue.groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .withColumn("n_true", sum(col("n")).over(Window.partitionBy(col("lang"))))
        .withColumn("cell_micros",
          round(col("n").cast("double") / col("n_true").cast("double") * 1e6).cast("long"))
        .select(col("lang"), col("lang_pred"), col("n"), col("n_true"), col("cell_micros"))
        .orderBy(col("lang"), col("lang_pred"))
    }),

    "stats_trend" -> ((s, dir) => {
      // is this stream growing or shrinking? OLS slope of daily event
      // counts over epoch days, per event type — x and y are BOTH
      // integers here, so every OLS moment is exact and only the final
      // slope division is a float op (micros/day, rounded once)
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "events").filter(col("ts").isNotNull)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("x"))
        .agg(count(lit(1)).as("y"))
      daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .withColumn("trend_micros_per_day",
          when(col("n_days") >= 2 && col("n_days") * col("sxx") =!= col("sx") * col("sx"),
            round((col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double") * 1e6)
              .cast("long")))
        .select(col("event_type"), col("n_days"), col("sy").as("n_events"),
          col("trend_micros_per_day"))
        .orderBy(col("event_type"))
    }),

    "stats_zipf" -> ((s, dir) => {
      // does each source look like language? OLS slope of ln(freq) vs
      // ln(rank) over the top-100 tokens — natural text sits near -1,
      // boilerplate flattens; every moment sum is exact integer micros
      graft.operators.text.TextAnalysis.zipfSlope(
          t(s, dir, "documents"), "source", "text", topK = 100)
        .orderBy(col("source"))
    }),

    "text_pii_inventory" -> ((s, dir) => {
      // compliance report behind the redaction pass: per-source PII
      // occurrence counts, email-inside-URL counted once (as URL) via
      // the same precedence chain text_redact applies
      val synth = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("source"), concat(
          substring(col("text"), 1, 40),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(" reach user@example.com"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(4)) === 0,
            concat(lit(" https://site"), col("doc_id"), lit(".example/p?q=1")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0, lit(" call 555-0134"))
            .otherwise(lit(""))).as("raw"))
      graft.operators.text.TextAnalysis.piiInventory(synth, "source", "raw")
        .orderBy(col("source"))
    }),

    "tokenizer_coverage" -> ((s, dir) => {
      // is a 200-token vocab enough? per-source share of token MASS
      // outside the corpus top-200 — the go/no-go number for vocab,
      // stopword, and embedding-table sizing
      graft.operators.text.TextAnalysis.vocabCoverage(
          t(s, dir, "documents"), "source", "text", vocabSize = 200)
        .orderBy(col("source"))
    }),

    "stats_outliers" -> ((s, dir) => {
      // robust length outliers per source: |tokens - median| > 3 * MAD
      // — median/MAD instead of mean/stddev so the extreme docs being
      // hunted cannot drag the threshold toward themselves
      val docs = t(s, dir, "documents")
      val tc = graft.operators.text.TextAnalysis.tokenCount(col("text")).cast("long")
      graft.operators.TableStats.madOutliers(
          docs.select(col("doc_id"), col("source"), tc.as("n_tokens")),
          "source", "n_tokens", "doc_id", k = 3)
        .orderBy(col("source"), col("doc_id"))
    }),

    "stats_quantiles_sketch" -> ((s, dir) => {
      // mergeable octave-sketch quantiles over per-doc token counts:
      // <= 64 integer bins per source however big the corpus; p50/p90/
      // p99 upper bounds from one bounded aggregate + tiny window
      val docs = t(s, dir, "documents")
      val tc = graft.operators.text.TextAnalysis.tokenCount(col("text")).cast("long")
      val sk = graft.operators.TableStats.histQuantileSketch(
        docs.select(col("source"), tc.as("tc")), "source", "tc")
      graft.operators.TableStats.histQuantilesFromSketch(sk, "source", Seq(0.5, 0.9, 0.99))
        .orderBy(col("source"))
    }),

    "stats_drift" -> ((s, dir) => {
      // PSI distribution drift per source between the even-id and
      // odd-id corpus halves (stand-ins for two snapshot versions),
      // bucketed by token-count (width 32, capped at bin 15); add-one
      // smoothing over observed buckets, every term integer micros
      val docs = t(s, dir, "documents")
      val tc = graft.operators.text.TextAnalysis.tokenCount(col("text"))
      val bucket = least(floor(tc / lit(32.0)), lit(15L)).cast("long")
      graft.operators.TableStats.psiDrift(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0),
          docs.filter(pmod(col("doc_id"), lit(2)) === 1),
          "source", bucket)
        .orderBy(col("source"))
    }),

    "stats_heavy_hitters" -> ((s, dir) => {
      // count-min frequency sketch (4x1024 cells, md5-salted rows):
      // exact top-30 corpus tokens next to their sketch estimates —
      // CM only over-counts, so est_cnt >= exact_cnt cell-for-cell
      graft.operators.TableStats.cmHeavyHitters(t(s, dir, "documents"), "text",
          depth = 4, width = 1024, k = 30)
        .orderBy(col("exact_cnt").desc, col("token"))
    }),

    "link_fuzzy" -> ((s, dir) => {
      // entity resolution within a column: distinct part names blocked
      // by first token, near-name pairs at edit distance <= 3
      graft.operators.FuzzyLink.selfPairs(t(s, dir, "part"), "p_name",
          n => substring_index(n, " ", 1), maxDist = 3)
        .orderBy(col("name_a"), col("name_b"))
    }),

    "link_canonical" -> ((s, dir) => {
      // dirty-feed linkage: odd partkeys carry a one-char typo, every
      // feed value links to its best canonical name within the block
      val part = t(s, dir, "part")
      val dirty = part.filter(col("p_name").isNotNull)
        .select(when(col("p_partkey") % 2 === 1, concat(col("p_name"), lit("x")))
          .otherwise(col("p_name")).as("feed_name"))
      graft.operators.FuzzyLink.linkAgainst(dirty, part, "feed_name", "p_name",
          n => substring_index(n, " ", 1), maxDist = 1)
        .orderBy(col("dirty"), col("canonical"))
    }),

    "contamination" -> ((s, dir) => {
      // eval = every 10th doc, train = the rest; which train docs leak
      // an eval doc's n-grams
      val docs = t(s, dir, "documents")
      Contamination.evalOverlap(
          docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(10)) === 0),
          "doc_id", "text", n = 3, minOverlap = 0.1, maxShingleDf = 1000)
        .orderBy(col("eval_id"), col("train_id"))
    }),

    "contamination_bloom" -> ((s, dir) => {
      // the Bloom-prefiltered scale path: only train shingles that might
      // hit an eval shingle enter the shuffle; result is bit-identical
      // (no false negatives; false positives die in the bucket filter),
      // so it shares contamination's oracle
      val docs = t(s, dir, "documents")
      Contamination.evalOverlapBloom(
          docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(10)) === 0),
          "doc_id", "text", n = 3, minOverlap = 0.1, maxShingleDf = 1000,
          expectedEvalShingles = 100000L)
        .orderBy(col("eval_id"), col("train_id"))
    }),

    // ----- beyond-parity: embedding utilities -----

    "emb_l2norm" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(VectorFunctions.l2Normalize(col("embedding"))).as(Seq("idx", "nv")))
        .select(col("vec_id"), col("idx"), round(col("nv"), 6).as("nval"))
        .orderBy(col("vec_id"), col("idx"))
    }),

    "emb_quantize_trained" -> ((s, dir) => {
      // FAISS-style trained scalar quantizer: per-dim min/max bounds
      // (64 rows, broadcast) then the uniform 0..255 codebook
      val emb = t(s, dir, "embeddings")
      val bounds = SimilaritySearch.dimBounds(emb, "embedding")
      SimilaritySearch.quantizeTrained(emb, "vec_id", "embedding", bounds)
        .orderBy(col("vec_id"), col("idx"))
    }),

    "emb_quantize" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"), VectorFunctions.quantizeInt8(col("embedding")).as("qs"))
        .select(col("vec_id"), col("qs.scale").as("sc"), posexplode(col("qs.q")).as(Seq("idx", "qv")))
        .select(col("vec_id"), round(col("sc"), 6).as("scale"),
          col("idx"), col("qv").cast("int").as("qval"))
        .orderBy(col("vec_id"), col("idx"))
    }),

    // ----- beyond-parity: crawl ingestion (WARC → HTML → URL) -----

    "url_normalize" -> ((s, dir) => {
      // RFC 3986 syntax normalization over 8 URL templates covering the
      // distinct rules (case, default ports, dot-segments, unreserved
      // escape decode, escape-hex uppercasing, tracking-param strip,
      // empty-query drop, fragment drop) plus eTLD+1 over the PSL
      // families (normal, wildcard *.ck, exception !city.kawasaki.jp).
      // The oracle constructs the expected strings from the same
      // integer — green means every normalization rule agrees. Runs as
      // the NATIVE expressions (graft_url_normalize/_host/_domain), so
      // the whole plan is Range → codegen'd Project — no typed
      // mapPartitions boundary (PlanQualitySpec pins this).
      s.range(240).selectExpr("id",
        """CASE CAST(id % 8 AS INT)
          |  WHEN 0 THEN concat('HTTP://WWW.Site', id % 20, '.COM:80/a/./b/../p', id,
          |                     '.html?utm_source=x&id=', id, '#frag')
          |  WHEN 1 THEN concat('https://Host', id, '.example.ORG:443/x//y/%7Euser/?')
          |  WHEN 2 THEN concat('http://sub', id, '.shop.co.uk/%41%2f/p?gclid=zz&a=1&b=2')
          |  WHEN 3 THEN concat('https://u', id, '.github.io:8443/docs/../index.html')
          |  WHEN 4 THEN concat('http://api', id, '.example.com/v1/./res/', id, '?x=%7e&UTM_CAMPAIGN=c')
          |  WHEN 5 THEN concat('HTTPS://CDN', id, '.Example.COM/img/%2f/p', id, '.png')
          |  WHEN 6 THEN concat('http://www', id, '.test.ck/a/b/../c#x')
          |  ELSE concat('http://city.kawasaki.jp/p', id, '/?fbclid=q&q=', id)
          |END AS url""".stripMargin)
        .select(col("id"),
          call_function("graft_url_normalize", col("url")).as("url_norm"),
          call_function("graft_url_host", col("url")).as("host"))
        .withColumn("domain", call_function("graft_url_domain", col("host")))
        .orderBy(col("id"))
    }),

    "url_domain_stats" -> ((s, dir) => {
      // per-eTLD+1 grouping over 10 host templates spanning the PSL rule
      // kinds (incl. hosts that ARE suffixes' children, wildcard .ck,
      // the kawasaki.jp exception, a private-domain 3-label suffix, and
      // IPv4 literals) — the aggregation every per-domain corpus stat
      // stands on
      // fully columnar via the native graft_url_domain expression:
      // Range → Project → one hash agg, all inside codegen
      s.range(400).selectExpr(
        """CASE CAST(id % 10 AS INT)
          |  WHEN 0 THEN concat('a', id, '.example.com')
          |  WHEN 1 THEN concat('b', id, '.site', id % 5, '.co.uk')
          |  WHEN 2 THEN concat('u', id % 9, '.github.io')
          |  WHEN 3 THEN concat('x', id, '.y.z.kawasaki.jp')
          |  WHEN 4 THEN 'city.kawasaki.jp'
          |  WHEN 5 THEN concat('m', id, '.city.kawasaki.jp')
          |  WHEN 6 THEN concat('shop', id % 6, '.example.ck')
          |  WHEN 7 THEN 'www.ck'
          |  WHEN 8 THEN concat('cdn', id % 3, '.s3.amazonaws.com')
          |  ELSE concat('192.168.', id % 4, '.1')
          |END AS host""".stripMargin)
        .select(col("host"), call_function("graft_url_domain", col("host")).as("domain"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n"), countDistinct(col("host")).as("n_hosts"))
        .orderBy(col("domain"))
    }),

    "text_html_blocks" -> ((s, dir) => {
      // REAL HTML extraction over the documents fixture: each doc's text
      // is escaped into the crawl scaffold (title/nav/footer boilerplate,
      // formula heading, the text as <p>). The oracle reconstructs the
      // kept blocks from the raw text alone — escape→decode is the
      // identity and block indices are fixed by the scaffold — so green
      // means tokenizer, entity decoder, whitespace normalizer,
      // code-point counter, and boilerplate classifier agree cross-engine
      val docs = t(s, dir, "documents").where(col("text").isNotNull)
        .select(col("doc_id"),
          crawlHtml(col("doc_id"), col("text"),
            concat(lit("Document "), col("doc_id").cast("string"),
              lit(" primary heading content"))).as("html"))
      HtmlExtract.contentBlocksDf(docs, "doc_id", "html")
        .orderBy(col("doc_id"), col("block_ix"))
    }),

    "text_html_links" -> ((s, dir) => {
      // linksDf over formula HTML: three anchors per doc covering the
      // quote styles (double, single, bare), entity-decoded hrefs, and
      // absolute-URL normalization of the extracted links
      import s.implicits._
      val docs = s.range(120).mapPartitions(_.map { iL =>
        val i = iL.toLong
        val html = s"<p>Intro $i</p><ul>" +
          s"""<li><a href="HTTP://Tracker.COM:80/t?utm_source=a&amp;k=$i">track $i</a></li>""" +
          s"<li><a href='/rel/$i'>relative link</a></li>" +
          s"<li><a href=https://u${i % 7}.github.io/page>GH Page $i</a></li></ul>"
        (i, html)
      }).toDF("doc_id", "html")
      HtmlExtract.linksDf(docs, "doc_id", "html")
        // absolute links normalize in the codegen'd native expression;
        // relative hrefs pass through (frontier resolution happens
        // upstream) — a columnar when/otherwise, so the plan stays in
        // whole-stage codegen instead of dropping to typed mapPartitions
        .withColumn("href_norm",
          when(lower(col("href")).startsWith("http://") ||
            lower(col("href")).startsWith("https://"),
            call_function("graft_url_normalize", col("href")))
            .otherwise(col("href")))
        .select(col("doc_id"), col("link_ix"), col("href_norm"), col("anchor"))
        .orderBy(col("doc_id"), col("link_ix"))
    }),

    "pipeline_crawl" -> ((s, dir) => {
      // FLAGSHIP crawl path: documents → HTML pages → HTTP responses →
      // .warc.gz archives ON DISK (one gz member per record, one file
      // per task) → readWarc (binaryFiles + one-record-at-a-time
      // iterator) → parseHttpResponse → HtmlExtract.content →
      // per-domain dedup stats. The oracle never sees a WARC byte: it
      // reconstructs the expected extraction from raw text + the uri
      // formula, so green proves the container/HTTP/HTML/URL chain is
      // byte-exact cross-engine. Scale shape: file-granular archive
      // parallelism, per-row parse/extract, one hash-agg shuffle on
      // the (low-cardinality) domain key.
      import s.implicits._
      val docs = t(s, dir, "documents").where(col("text").isNotNull)
        .select(col("doc_id"),
          crawlHtml(col("doc_id"), col("text"),
            lit("Shared section heading for crawl docs")).as("html"))
      val warcDir = TempDirs.scratch("crawl_warc_")
      val records = docs.repartition(s.sparkContext.defaultParallelism).as[(Long, String)]
        .mapPartitions(_.map { case (id, html) =>
          val tld = (id % 4) match {
            case 0 => "com"; case 1 => "co.uk"; case 2 => "github.io"; case _ => "org"
          }
          val uri = s"http://w${id % 41}.site${id % 13}.$tld/p/$id"
          val payload = WarcIo.buildHttpResponse(200, "OK",
            Seq("Content-Type" -> "text/html; charset=utf-8"),
            html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ("response", uri, "2026-01-01T00:00:00Z", WarcIo.recordIdFor("crawl:" + id),
            "application/http; msgtype=response", payload)
        }).toDF("rec_type", "target_uri", "warc_date", "record_id",
          "content_type", "payload")
      WarcIo.writeWarc(records, warcDir)
      WarcIo.readWarc(s, warcDir + "/*.warc.gz")
        .where(col("rec_type") === "response")
        .select(col("target_uri"), col("payload"))
        .as[(String, Array[Byte])]
        .mapPartitions(_.map { case (uri, payload) =>
          val http = WarcIo.parseHttpResponse(payload)
          val html = WarcIo.decodeBody(http) // charset-aware (header/meta/UTF-8)
          val etext = HtmlExtract.content(html, 25, 0.33).map(_.text).mkString("\n")
          (UrlOps.registrableDomain(UrlOps.parse(uri).host), etext)
        }).toDF("domain", "etext")
        // dedup on the 16-byte digest, not the text: the distinct
        // shuffle moves fixed-width keys however large the pages are
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_pages"),
          countDistinct(md5(col("etext").cast("binary"))).as("n_unique"),
          sum(length(col("etext")).cast("long")).as("total_chars"))
        .orderBy(col("domain"))
    }),

    "crawl_schedule" -> ((s, dir) => {
      // fetch scheduling: rendezvous (HRW) fetcher assignment on the
      // portable md5-60 chain + per-domain politeness slots. The
      // oracle rebuilds the same scores with arg_max and the same
      // window — fetcher choice AND slot arithmetic both hash-gated
      import s.implicits._
      val frontier = s.range(300).mapPartitions(_.map { iL =>
        val i = iL.toLong
        val d = i % 20
        (s"site$d.example.com", s"http://site$d.example.com/p/$i", 500L + d * 100L)
      }).toDF("domain", "url", "delay_ms")
      graft.operators.CrawlScheduler.schedule(frontier, "domain", "url", 4, col("delay_ms"))
        .select(col("url"), col("domain"), col("fetcher"), col("slot_ms"))
        .orderBy(col("url"))
    }),

    "text_html_extract_eval" -> ((s, dir) => {
      // extraction-quality eval harness (the sim_recall_eval pattern
      // applied to the HTML extractor): pages with PLANTED ground
      // truth per arm — clean content, too-short content, link-drowned
      // content, long boilerplate in a footer — and precision/recall
      // measured by really running content() and set-comparing against
      // the plant. The oracle states each arm's designed outcome, so
      // ANY drift in boilerplate classification (footer kept → fp>0),
      // the length gate, or the density gate flips a counter
      import s.implicits._
      s.range(200).mapPartitions(_.map { iL =>
        val i = iL.toLong
        val arm = (i % 4).toInt
        val h1 = s"Heading content block for document number $i"
        val pLong = s"A long planted paragraph of genuine body content $i with plenty of words"
        val pShort = s"Tiny note $i"
        val pLinky = s"related links and further reading material for document $i"
        val bFooter = s"Copyright legal boilerplate notice $i with long enough text to pass length"
        val (bodyHtml, truth) = arm match {
          case 0 => (s"<p>$pLong</p>", Set(h1, pLong))
          case 1 => (s"<p>$pShort</p>", Set(h1, pShort))
          case 2 => (s"<p><a href='/l'>$pLinky</a> x</p>", Set(h1, s"$pLinky x"))
          case _ => (s"<p>$pLong</p><footer>$bFooter</footer>", Set(h1, pLong))
        }
        val html = s"<html><head><title>Doc $i</title></head><body>" +
          s"<nav><a href='/'>Home</a></nav><h1>$h1</h1>$bodyHtml</body></html>"
        val extracted = HtmlExtract.content(html, 25, 0.33).map(_.text).toSet
        (arm, (extracted & truth).size, (truth -- extracted).size,
          (extracted -- truth).size)
      }).toDF("arm", "tp", "fn", "fp")
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tp")).as("tp"),
          sum(col("fn")).as("fn"), sum(col("fp")).as("fp"))
        .select(col("arm"), col("n_docs"), col("tp"), col("fn"), col("fp"),
          expr("CAST(tp * 1000000 DIV (tp + fp) AS BIGINT)").as("precision_micros"),
          expr("CAST(tp * 1000000 DIV (tp + fn) AS BIGINT)").as("recall_micros"))
        .orderBy(col("arm"))
    }),

    "text_html_charset" -> ((s, dir) => {
      // charset-correct body decode — the silent-mojibake trap: pages
      // are built as REAL ISO-8859-1 / windows-1252 / UTF-8 bytes and
      // decoded back via the header-charset → meta-prescan → UTF-8
      // chain; arm 4 additionally frames the body with RFC 9112
      // chunked transfer-encoding, chunk boundaries landing INSIDE
      // multi-byte sequences (dechunk must reassemble bytes before
      // decoding). The oracle states the original text, so green means
      // no arm mis-decoded a single code point
      import s.implicits._
      s.range(120).mapPartitions(_.map { iL =>
        val i = iL.toLong
        val text = (i % 6) match {
          case 0 => s"Café onza £$i - déjà vu résumé naïveté ordinal nº$i"
          case 1 => s"Señor ñandú $i piñata jalapeño año"
          case 2 => s"UTF-8 snowman ☃ and emoji 😀 doc $i"
          case 3 => s"Windows euro €$i quote ’curly’ dash–$i"
          case 4 => s"Chunked emoji 🚀🚀 payload $i across splits"
          case _ => s"Gzip body naïve café $i decompressed in flight"
        }
        val meta = if (i % 6 == 1) "<meta charset=\"iso-8859-1\">" else ""
        val html = s"<html><head>$meta<title>t</title></head><body><p>$text</p></body></html>"
        val payload = (i % 6) match {
          case 5 =>
            // Content-Encoding: gzip — decodeBody must decompress
            // before any charset work
            WarcIo.buildHttpResponse(200, "OK",
              Seq("Content-Type" -> "text/html; charset=utf-8",
                "Content-Encoding" -> "gzip"),
              WarcIo.gzipMember(html.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          case 4 =>
            // hand-framed chunked response; split points ignore char
            // boundaries on purpose
            val body = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val cut1 = body.length / 3
            val cut2 = 2 * body.length / 3
            val bos = new java.io.ByteArrayOutputStream()
            bos.write(("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
              "Transfer-Encoding: chunked\r\n\r\n").getBytes("US-ASCII"))
            Seq((0, cut1), (cut1, cut2), (cut2, body.length)).foreach { case (a, b) =>
              bos.write(Integer.toHexString(b - a).getBytes("US-ASCII"))
              bos.write('\r'); bos.write('\n')
              bos.write(body, a, b - a)
              bos.write('\r'); bos.write('\n')
            }
            bos.write("0\r\n\r\n".getBytes("US-ASCII"))
            bos.toByteArray
          case m =>
            val (ct, cs) = m match {
              case 0 => ("text/html; charset=ISO-8859-1", "ISO-8859-1")
              case 1 => ("text/html", "ISO-8859-1") // no header → meta prescan
              case 2 => ("text/html", "UTF-8")      // no declaration → default
              case _ => ("text/html; charset=windows-1252", "windows-1252")
            }
            WarcIo.buildHttpResponse(200, "OK", Seq("Content-Type" -> ct),
              html.getBytes(java.nio.charset.Charset.forName(cs)))
        }
        val decoded = WarcIo.decodeBody(WarcIo.parseHttpResponse(payload))
        val block = HtmlExtract.content(decoded, 10, 0.5).map(_.text).mkString("\n")
        (i, block, block.codePointCount(0, block.length))
      }).toDF("id", "text", "n_chars")
        .orderBy(col("id"))
    }),

    "url_idn_normalize" -> ((s, dir) => {
      // internationalized hostnames fold to one ASCII key: unicode
      // labels → xn-- punycode (RFC 3492, JDK-cross-verified in
      // PunycodeSpec), already-encoded and ASCII hosts pass through —
      // so `münchen.de` and `xn--mnchen-3ya.de` dedup together. The
      // oracle pins the expected encodings per arm
      import s.implicits._
      s.range(150).mapPartitions(_.map { iL =>
        val i = iL.toLong
        val url = (i % 5) match {
          case 0 => s"http://BÜCHER.example/p$i"
          case 1 => s"https://MÜNCHEN.de/s/$i?utm_source=x&id=$i"
          case 2 => s"http://日本語.jp/x$i"
          case 3 => s"http://plain$i.example.com/y"
          case _ => s"http://xn--mnchen-3ya.de/z$i"
        }
        val norm = UrlOps.normalize(url)
        (i, norm, UrlOps.parse(norm).host)
      }).toDF("id", "url_norm", "host")
        .orderBy(col("id"))
    }),

    "text_html_meta" -> ((s, dir) => {
      // head-section metadata through the real tokenizer: lang claim,
      // title block, meta description (entity-decoded), OpenGraph
      // property, and the rel=canonical link NORMALIZED — the
      // site-published dedup key. Every field is formula-derivable
      import s.implicits._
      s.range(100).mapPartitions(_.map { iL =>
        val i = iL.toLong
        val lang = Seq("en", "de", "fr", "zh")((i % 4).toInt)
        val html =
          s"""<html lang="$lang"><head><title>Page $i</title>
             |<meta name="description" content="Summary $i &amp; more">
             |<meta property="og:site_name" content="Site${i % 6}">
             |<link rel="canonical" href="HTTP://WWW.Ex${i % 6}.COM:80/page/${i % 20}?utm_source=z&amp;v=${i % 10}">
             |</head><body><p>body</p></body></html>""".stripMargin
        val hs = HtmlExtract.headSignals(html) // ONE tokenizer pass
        val meta = hs.meta.toMap
        (i, hs.lang, hs.title,
          meta.getOrElse("description", ""),
          meta.getOrElse("og:site_name", ""),
          if (hs.canonical.isEmpty) "" else UrlOps.normalize(hs.canonical))
      }).toDF("id", "lang", "title", "description", "site", "canon_norm")
        .orderBy(col("id"))
    }),

    "url_sitemap_parse" -> ((s, dir) => {
      // sitemap-protocol parsing through real XML bytes: formula
      // urlsets (loc with &amp; references, lastmod, one-decimal
      // priority) and sitemapindex pointers; the oracle reconstructs
      // every decoded field from the formulas. -1 is the
      // priority-absent sentinel (nullable ints hash as float64)
      import s.implicits._
      s.range(60).mapPartitions(_.flatMap { iL =>
        val i = iL.toLong
        val h = i % 5
        val xml =
          if (i % 4 == 3)
            "<sitemapindex>" + (0 until 2).map(j =>
              s"<sitemap><loc>https://ex$h.org/sm/$i/$j.xml.gz</loc>" +
                "<lastmod>2026-03-01</lastmod></sitemap>").mkString + "</sitemapindex>"
          else {
            val nu = (3 + i % 3).toInt
            "<?xml version=\"1.0\"?>" +
              "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
              (0 until nu).map(j =>
                s"<url><loc>https://ex$h.org/p/$i/$j?a=1&amp;b=$j</loc>" +
                  s"<lastmod>2026-0${1 + j % 9}-01</lastmod>" +
                  s"<priority>0.$j</priority></url>").mkString + "</urlset>"
          }
        val sm = graft.sources.SitemapXml.parse(xml)
        sm.entries.zipWithIndex.map { case (e, ix) =>
          (i, sm.kind, ix, e.loc, e.lastmod, e.priorityTenths.getOrElse(-1))
        }
      }).toDF("sm_id", "kind", "url_ix", "loc", "lastmod", "pri_tenths")
        .orderBy(col("sm_id"), col("url_ix"))
    }),

    "url_psl_full" -> ((s, dir) => {
      // eTLD+1 under the FULL embedded public_suffix_list.dat (~10k
      // rules, also battery-verified in UrlOpsSpec): 14 arms over real
      // registry rules the in-source snapshot lacks — ccTLD second
      // levels, a US K12 three-label chain, PRIVATE-section hosting
      // domains — plus the *.ck wildcard and !city exception families.
      // Every arm's registrable domain is fixed by the published list,
      // so the oracle states it directly; the computation runs in the
      // native graft_url_domain expression.
      import s.implicits._
      val sfx = Vector("com.sg", "co.th", "com.tr", "com.ua", "org.nz", "com.ar",
        "co.il", "com.my", "com.eg", "k12.ak.us", "fly.dev", "myshopify.com")
      s.range(280).map { i =>
        val m = (i % 14).toInt
        val host = m match {
          case 12 => s"a$i.b$i.test.ck"
          case 13 => s"x$i.city.kawasaki.jp"
          case k => s"w$i.site$i.${sfx(k)}"
        }
        (i.toLong, host)
      }.toDF("id", "host")
        .withColumn("domain", call_function("graft_url_domain", col("host")))
        .orderBy(col("id"))
    }),

    "pipeline_frontier" -> ((s, dir) => {
      // FLAGSHIP frontier maintenance — the other half of the crawl
      // loop (pipeline_crawl consumes archives; this produces the next
      // fetch batch): raw outlinks → RFC 3986 normalization (which
      // COLLAPSES tracking-param/case/port variants: 250 shop links →
      // 50 canonical URLs) → RFC 9309 robots gate (kills the .pdf arm)
      // → exact URL dedup → anti-join against the already-crawled set
      // → per-eTLD+1 batch counts. Scale shape: per-row string work,
      // one distinct on short URL strings, one broadcast anti-join,
      // one low-cardinality domain agg.
      import s.implicits._
      val policy = "User-agent: *\nDisallow: /*.pdf$\n"
      val frontier = s.range(250).mapPartitions { it =>
        val robots = graft.functions.RobotsTxt.parse(policy)
        it.flatMap { iL =>
          val i = iL.toLong
          Seq(
            s"HTTP://WWW.Shop${i % 10}.COM:80/item/${i % 50}/?utm_source=$i",
            s"https://files.example.com/private/doc$i.pdf",
            s"https://u${i % 7}.github.io/posts/p$i"
          ).flatMap { href =>
            val norm = UrlOps.normalize(href)
            val u = UrlOps.parse(norm)
            val pathQ = u.path + (if (u.query.nonEmpty) "?" + u.query else "")
            if (graft.functions.RobotsTxt.isAllowed(robots, "graftbot", pathQ))
              Some((norm, UrlOps.registrableDomain(u.host)))
            else None
          }
        }
      }.toDF("url_norm", "domain")
      val seen = s.range(20).map(k => s"http://www.shop${k % 10}.com/item/$k/")
        .toDF("url_norm")
      frontier.dropDuplicates("url_norm")
        .join(broadcast(seen), Seq("url_norm"), "left_anti")
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_urls"))
        .orderBy(col("domain"))
    }),

    "pipeline_frontier_incremental" -> ((s, dir) => {
      // the PERSISTED frontier seen-set (CrawlFrontier): index built
      // once from the crawl history, then two discovery batches probed
      // against it — PER-SHARD Bloom sketches joined after shard
      // assignment (no driver merge, no plan literal) + pruned-shard
      // md5 verify, never a broadcast of the crawled set — with batch
      // 1's accepted URLs appended before batch 2 probes. Bit-identical to the plain
      // exact anti-joins the oracle states (Bloom has no false
      // negatives; the verify join is 128-bit-exact), which is the
      // whole point: the scale path changes the plan, not the answer.
      import s.implicits._
      def hist(i: Long) = s"http://h${i % 13}.example.com/p/$i"
      val history = s.range(400).map(i => hist(i)).toDF("url")
      val b1 = s.range(300).map(i =>
        if (i % 3 == 0) hist(i) else s"http://n${i % 9}.org/q/$i").toDF("url")
      val b2 = s.range(300).map { i =>
        (i % 4) match {
          case 0 => hist(i)
          case 1 => s"http://n${i % 9}.org/q/$i"
          case 2 => s"http://fresh${i % 6}.net/z/$i"
          case _ => s"http://h${i % 13}.example.com/p/${i + 1000}"
        }
      }.toDF("url")
      val idxDir = TempDirs.scratch("frontier_inc_")
      graft.operators.CrawlFrontier.buildIndex(history.withColumn("day", lit(100L)),
        "url", col("day"), idxDir, nShards = 16, expectedItems = 10000L)
      // materialize batch 1's accepted set BEFORE appending it — the
      // accepted frame must not lazily re-probe an index that now
      // contains itself (production lands the batch durably anyway)
      val acc1Dir = TempDirs.scratch("frontier_acc1_") + "/acc1"
      graft.operators.CrawlFrontier.probeNew(s, idxDir, b1, "url")
        .write.parquet(acc1Dir)
      val acc1 = s.read.parquet(acc1Dir)
      graft.operators.CrawlFrontier.appendBatch(acc1, "url", lit(200L), idxDir)
      val acc2 = graft.operators.CrawlFrontier.probeNew(s, idxDir, b2, "url")
      acc1.withColumn("batch", lit(1)).unionByName(acc2.withColumn("batch", lit(2)))
        .select(col("batch"), col("url"))
        .orderBy(col("batch"), col("url"))
    }),

    "frontier_recrawl" -> ((s, dir) => {
      // recrawl-age selection against the same persisted index:
      // sitemap <lastmod> signals join the SEEN side (pruned-shard
      // probe) and a URL is due only when it was crawled AND changed
      // after its stored last_crawl — the refresh feed that
      // complements pipeline_frontier_incremental's discovery feed
      import s.implicits._
      val history = s.range(200)
        .map(i => (s"http://r${i % 7}.com/p/$i", 100L + i % 10)).toDF("url", "day")
      val idxDir = TempDirs.scratch("frontier_rc_")
      graft.operators.CrawlFrontier.buildIndex(history, "url", col("day"), idxDir,
        nShards = 8, expectedItems = 10000L)
      val updates = s.range(200).map { i =>
        val delta = (i % 3) match { case 0 => 4L; case 1 => 0L; case _ => -2L }
        (s"http://r${i % 7}.com/p/$i", 100L + i % 10 + delta)
      }.toDF("url", "lastmod")
        .unionByName(s.range(50).map(i => (s"http://nv$i.com/", 999L)).toDF("url", "lastmod"))
      graft.operators.CrawlFrontier.recrawlDue(s, idxDir, updates, "url", col("lastmod"))
        .orderBy(col("url"))
    }),

    "crawl_schedule_capped" -> ((s, dir) => {
      // crawl_schedule's scale twin under a planted 100:1 domain skew:
      // a 600-url mega-domain is first CAPPED to its top-20 by
      // priority via the bounded-heap aggregate (graft_topk_agg — ≤k
      // state per domain, map-side merge, no per-domain sort), and
      // only the capped batch enters the politeness window — so the
      // window partition is ≤20 rows even for the mega-domain. The
      // oracle reproduces the cap with the equivalent (but
      // single-task-sorting) window formulation.
      import s.implicits._
      val frontier = s.range(1000).map { i =>
        val domain = if (i < 600) "mega.com" else s"d${i % 25}.org"
        (domain, f"http://$domain/p/$i%04d", ((i * 7) % 101).toDouble)
      }.toDF("domain", "url", "priority")
      val capped = graft.operators.CrawlScheduler.capPerDomain(
        frontier, "domain", "url", col("priority"), 20)
      graft.operators.CrawlScheduler.schedule(capped, "domain", "url", 4, lit(1000L))
        .select(col("url"), col("domain"), col("fetcher"), col("slot_ms"))
        .orderBy(col("url"))
    }),

    "crawl_pagerank" -> ((s, dir) => {
      // link-graph centrality, the frontier's priority signal:
      // integer-micro-unit PageRank (LinkGraph.pageRank — truncating
      // integer arithmetic precisely SO a distributed float-sum order
      // can never flip ranks and the oracle can replay it exactly)
      // over a formula host graph plus a dangling sink, three
      // iterations unrolled in the oracle
      import s.implicits._
      val edges = s.range(200).map(i => (s"h${i % 20}", s"h${(i * 7 + 3) % 20}"))
        .toDF("src", "dst")
        .unionByName(Seq(("h3", "sink.example.org")).toDF("src", "dst"))
      graft.operators.LinkGraph.pageRank(edges, "src", "dst", iterations = 3)
        .withColumnRenamed("node", "host")
        .orderBy(col("host"))
    }),

    "pipeline_wet" -> ((s, dir) => {
      // WARC in, WET out — the standard crawl-text interchange as a
      // first-class pipeline: documents → HTML → HTTP → .warc.gz on
      // disk → readWarc → charset-aware decode → main-content extract
      // → toWet conversion records (WARC-Refers-To riding the extra
      // header map through writeWarc) → a REAL WET archive on disk →
      // read back. The oracle rebuilds every conversion record's text
      // from the raw documents alone via the escape→decode identity,
      // so green proves the whole two-container round trip is
      // byte-exact.
      import s.implicits._
      val docs = t(s, dir, "documents").where(col("text").isNotNull)
        .select(col("doc_id"),
          crawlHtml(col("doc_id"), col("text"),
            lit("WET extraction heading for conversion records")).as("html"))
      val warcDir = TempDirs.scratch("wet_src_")
      val records = docs.repartition(s.sparkContext.defaultParallelism).as[(Long, String)]
        .mapPartitions(_.map { case (id, html) =>
          val uri = s"http://w${id % 23}.example.org/d/$id"
          val payload = WarcIo.buildHttpResponse(200, "OK",
            Seq("Content-Type" -> "text/html; charset=utf-8"),
            html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ("response", uri, "2026-01-01T00:00:00Z", WarcIo.recordIdFor("wetsrc:" + id),
            "application/http; msgtype=response", payload)
        }).toDF("rec_type", "target_uri", "warc_date", "record_id",
          "content_type", "payload")
      WarcIo.writeWarc(records, warcDir)
      val wetDir = TempDirs.scratch("wet_out_")
      val wetRecords = WarcIo.readWarc(s, warcDir + "/*.warc.gz")
        .where(col("rec_type") === "response")
        .select(col("target_uri"), col("warc_date"), col("record_id"), col("payload"))
        .as[(String, String, String, Array[Byte])]
        .mapPartitions(_.map { case (uri, date, rid, payload) =>
          val http = WarcIo.parseHttpResponse(payload)
          val html = WarcIo.decodeBody(http)
          val text = HtmlExtract.content(html, 25, 0.33).map(_.text).mkString("\n")
          val wet = WarcIo.toWet(
            WarcIo.WarcRecord("response", uri, date, rid, "", Map.empty,
              Array.emptyByteArray), text)
          (wet.recordType, wet.targetUri, wet.date, wet.recordId,
            wet.contentType, wet.payload, wet.extra)
        }).toDF("rec_type", "target_uri", "warc_date", "record_id",
          "content_type", "payload", "extra")
      WarcIo.writeWarc(wetRecords, wetDir)
      WarcIo.readWarc(s, wetDir + "/*.warc.gz")
        .select(
          substring_index(col("target_uri"), "/", -1).cast("long").as("doc_id"),
          col("rec_type"), col("content_type"),
          length(decode(col("payload"), "UTF-8")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "pipeline_crawl_bootstrap" -> ((s, dir) => {
      // the crawl-discovery BOOTSTRAP loop, composed end to end:
      // robots.txt per domain → its `Sitemap:` directives (the field
      // RobotsTxt collects globally) → sitemap XML fetched-by-formula
      // and parsed (SitemapXml) → the entries split against the
      // PERSISTED frontier: never-crawled locs ride the NEW feed
      // (probeNew) while already-crawled locs whose <lastmod> beats
      // the stored crawl clock ride the REFRESH feed (recrawlDue) —
      // union, cap per domain by staleness, politeness-schedule. The
      // oracle replays sitemap membership, the seen-set as IN/NOT IN,
      // the due condition, the window cap, and the HRW chain.
      import s.implicits._
      val sitemapUrls = s.range(8).flatMap { k =>
        val robots = "User-agent: *\nDisallow: /private/\n" +
          s"Sitemap: https://bs$k.org/sitemap.xml\n" +
          (if (k % 2 == 0) s"Sitemap: https://bs$k.org/sitemap2.xml\n" else "")
        graft.functions.RobotsTxt.parse(robots).sitemaps.map(u => (k, u))
      }.toDF("k", "sitemap_url")
      val entries = sitemapUrls.as[(Long, String)].flatMap { case (k, u) =>
        val second = u.endsWith("sitemap2.xml")
        val n = if (second) 5 else 10
        val xml = "<?xml version=\"1.0\"?>" +
          "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
          (0 until n).map { j =>
            val dd = if (j % 2 == 0) 15 else 5
            val path = if (second) s"/q/$j" else s"/p/$j"
            f"<url><loc>https://bs$k.org$path</loc><lastmod>2026-01-$dd%02d</lastmod></url>"
          }.mkString + "</urlset>"
        graft.sources.SitemapXml.parse(xml).entries.map(e => (k, e.loc, e.lastmod))
      }.toDF("k", "url", "lastmod")
        .withColumn("signal", lit(100L) + substring(col("lastmod"), 9, 2).cast("long"))
      val history = s.range(8).flatMap(k =>
        (0 until 6).map(j => (s"https://bs$k.org/p/$j", 110L))).toDF("url", "day")
      val idxDir = TempDirs.scratch("crawl_boot_idx_")
      graft.operators.CrawlFrontier.buildIndex(history, "url", col("day"), idxDir,
        nShards = 8, expectedItems = 10000L)
      val newFeed = graft.operators.CrawlFrontier
        .probeNew(s, idxDir, entries, "url")
        .select(col("url"), col("signal").as("priority"))
      val dueFeed = graft.operators.CrawlFrontier
        .recrawlDue(s, idxDir, entries, "url", col("signal"))
        .select(col("url"), col("signal").as("priority"))
      val feed = newFeed.unionByName(dueFeed)
        .withColumn("domain",
          call_function("graft_url_domain", call_function("graft_url_host", col("url"))))
      val capped = graft.operators.CrawlScheduler.capPerDomain(
        feed, "domain", "url", col("priority"), 6)
      graft.operators.CrawlScheduler.schedule(capped, "domain", "url", 4, lit(1000L))
        .select(col("url"), col("domain"), col("priority"), col("fetcher"), col("slot_ms"))
        .orderBy(col("url"))
    }),

    "pipeline_wat" -> ((s, dir) => {
      // the THIRD crawl container: WARC in, WAT out. Captured pages
      // round-trip to real .warc.gz, each response distills to a
      // deterministic JSON metadata envelope (WarcIo.toWat — status,
      // header list, entity length, title, outlinks) written to a real
      // WAT archive and read back; the fields are then extracted with
      // SPARK'S OWN JSON parser (get_json_object — an independent
      // implementation validating the envelope is real JSON), and the
      // oracle reconstructs every value from the raw documents via the
      // escape→byte-length identities. Green proves container → HTTP →
      // HTML-signals → JSON serialization are all byte-exact.
      import s.implicits._
      val docs = t(s, dir, "documents").where(col("text").isNotNull)
        .select(col("doc_id"),
          crawlHtml(col("doc_id"), col("text"),
            lit("WAT extraction heading")).as("html"))
      val warcDir = TempDirs.scratch("wat_src_")
      val records = docs.repartition(s.sparkContext.defaultParallelism).as[(Long, String)]
        .mapPartitions(_.map { case (id, html) =>
          val uri = s"http://wat${id % 19}.example.org/d/$id"
          val payload = WarcIo.buildHttpResponse(200, "OK",
            Seq("Content-Type" -> "text/html; charset=utf-8"),
            html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ("response", uri, "2026-01-01T00:00:00Z", WarcIo.recordIdFor("watsrc:" + id),
            "application/http; msgtype=response", payload)
        }).toDF("rec_type", "target_uri", "warc_date", "record_id",
          "content_type", "payload")
      WarcIo.writeWarc(records, warcDir)
      val watDir = TempDirs.scratch("wat_out_")
      val watRecords = WarcIo.readWarc(s, warcDir + "/*.warc.gz")
        .where(col("rec_type") === "response")
        .select(col("target_uri"), col("warc_date"), col("record_id"), col("payload"))
        .as[(String, String, String, Array[Byte])]
        .mapPartitions(_.map { case (uri, date, rid, payload) =>
          val http = WarcIo.parseHttpResponse(payload)
          val html = WarcIo.decodeBody(http)
          val wat = WarcIo.toWat(
            WarcIo.WarcRecord("response", uri, date, rid, "", Map.empty, payload),
            http, HtmlExtract.title(html), HtmlExtract.links(html).map(_._1))
          (wat.recordType, wat.targetUri, wat.date, wat.recordId,
            wat.contentType, wat.payload, wat.extra)
        }).toDF("rec_type", "target_uri", "warc_date", "record_id",
          "content_type", "payload", "extra")
      WarcIo.writeWarc(watRecords, watDir)
      val base = "$.Envelope['Payload-Metadata']['HTTP-Response-Metadata']"
      WarcIo.readWarc(s, watDir + "/*.warc.gz")
        .select(
          substring_index(col("target_uri"), "/", -1).cast("long").as("doc_id"),
          col("rec_type"), col("content_type"),
          decode(col("payload"), "UTF-8").as("j"))
        .select(col("doc_id"), col("rec_type"), col("content_type"),
          get_json_object(col("j"), s"$base['HTML-Metadata'].Title").as("title"),
          get_json_object(col("j"), s"$base['Response-Message'].Status")
            .cast("int").as("status"),
          get_json_object(col("j"), s"$base['Entity-Length']")
            .cast("long").as("entity_length"),
          json_array_length(
            get_json_object(col("j"), s"$base['HTML-Metadata'].Links")).as("n_links"),
          get_json_object(col("j"), s"$base['HTML-Metadata'].Links[0].url").as("link0"),
          get_json_object(col("j"), s"$base['HTML-Metadata'].Links[1].url").as("link1"),
          get_json_object(col("j"),
            "$.Envelope['WARC-Header-Metadata']['WARC-Type']").as("src_type"))
        .orderBy(col("doc_id"))
    }),

    "cdx_surt" -> ((s, dir) => {
      // SURT key battery — the sort/lookup key of web-archive CDX
      // indexes, one template per canonicalization rule: host-label
      // reversal, www/wwwN strip (and the ≥2-labels-remain guard:
      // www.ck keeps www), IPv4 literals unreversed, default-port drop
      // vs non-default keep, dot-segment + unreserved-escape + tracking
      // normalization feeding the key, params folded-then-sorted,
      // whole-key case fold, trailing-dot strip, fragment drop, empty
      // path → /, userinfo drop, raw-space percent-encode. The oracle
      // constructs the expected key per template, so green means every
      // rule agrees cross-engine.
      s.range(240).selectExpr("id",
        """CASE CAST(id % 10 AS INT)
          |  WHEN 0 THEN concat('HTTP://WWW.Example', id % 9, '.COM:80/A/./B/../Page', id,
          |                     '.HTML?utm_source=x&b=2&a=1#f')
          |  WHEN 1 THEN concat('https://www2.blog', id, '.example.org/')
          |  WHEN 2 THEN concat('http://192.168.', id % 4, '.1:8080/x')
          |  WHEN 3 THEN concat('https://Sub', id, '.Shop.co.uk/Items//List/?z=9&y=%41')
          |  WHEN 4 THEN concat('http://www.ck/p', id)
          |  WHEN 5 THEN concat('https://example', id, '.com./d')
          |  WHEN 6 THEN concat('http://host', id, '.example.com:8443/p?q=', id)
          |  WHEN 7 THEN concat('https://a', id, '.io#sec')
          |  WHEN 8 THEN concat('http://u', id, ':pw@Auth.example.com/s')
          |  ELSE concat('https://sp', id, '.org/my doc?B=1&a=', id)
          |END AS url""".stripMargin)
        .select(col("id"), call_function("graft_surt", col("url")).as("surt"))
        .orderBy(col("id"))
    }),

    "pipeline_cdx" -> ((s, dir) => {
      // the FOURTH crawl container: WARC in, CDX out. Captured pages
      // round-trip to real .warc.gz with the CDXJ sidecar committed
      // alongside (writeWarcWithCdx), the sidecar parses back through
      // readCdxj (Spark's own from_json — an independent parser
      // validating the lines are real CDXJ), and the oracle
      // reconstructs key, timestamp, mime and status per doc from the
      // raw documents alone. The ranged-read pointer fields exist on
      // every row (has_pointer) but their VALUES are compression
      // output — CdxSpec proves them by seeking: offset/length frame
      // exactly one gunzip-able record.
      import s.implicits._
      val docs = t(s, dir, "documents").where(col("text").isNotNull)
        .select(col("doc_id"),
          crawlHtml(col("doc_id"), col("text"), lit("CDX indexing heading")).as("html"))
      val warcDir = TempDirs.scratch("cdx_src_")
      val records = docs.repartition(s.sparkContext.defaultParallelism).as[(Long, String)]
        .mapPartitions(_.map { case (id, html) =>
          val uri = s"http://c${id % 13}.example.org/d/$id"
          val payload = WarcIo.buildHttpResponse(200, "OK",
            Seq("Content-Type" -> "text/html; charset=utf-8"),
            html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ("response", uri, "2026-01-01T00:00:00Z", WarcIo.recordIdFor("cdxsrc:" + id),
            "application/http; msgtype=response", payload)
        }).toDF("rec_type", "target_uri", "warc_date", "record_id",
          "content_type", "payload")
      WarcIo.writeWarcWithCdx(records, warcDir)
      WarcIo.readCdxj(s, warcDir + "/part-*.cdx.gz")
        .select(
          substring_index(col("url"), "/", -1).cast("long").as("doc_id"),
          col("surt"), col("ts"), col("mime"), col("status"),
          (col("offset") >= 0 && col("length") > 0 &&
            col("filename").endsWith(".warc.gz")).as("has_pointer"))
        .orderBy(col("doc_id"))
    }),

    "cdx_lookup" -> ((s, dir) => {
      // the master-index lookup loop over the INCREMENTALLY-MAINTAINED
      // master: the 4000-capture corpus arrives as three crawls —
      // initMaster + two appendCrawl generations, each sorted alone
      // (O(new), never re-sorting history) — and lookupPrefix resolves
      // the manifest, consults every generation's cluster rows in one
      // scan, and reads only the intersecting shard files across all
      // three un-compacted generations (CdxSpec pins the pruning; at
      // archive scale this is the difference between a ranged read
      // and a 100 TB scan). Every field is formula-constructed, so the
      // oracle replays the whole build→append→prune→filter loop.
      val cdx = s.range(4000).selectExpr(
        "concat('https://h', id % 40, '.site', id % 7, '.org/p/', id) AS url",
        "lpad(CAST(id % 97 AS STRING), 14, '0') AS ts",
        "concat('d', id) AS digest", "id AS offset", "100 + id % 9 AS length",
        "'text/html' AS mime", "CAST(200 AS INT) AS status",
        "concat('f', id % 16, '.warc.gz') AS filename")
        .withColumn("surt", call_function("graft_surt", col("url")))
        .select("surt", "ts", "url", "mime", "status", "digest",
          "length", "offset", "filename")
      val idxDir = TempDirs.scratch("cdx_tbl_")
      graft.sources.CdxIndex.initMaster(cdx.filter(col("offset") < 1500), idxDir, nShards = 12)
      graft.sources.CdxIndex.appendCrawl(
        cdx.filter(col("offset") >= 1500 && col("offset") < 3000), idxDir, nShards = 12)
      graft.sources.CdxIndex.appendCrawl(
        cdx.filter(col("offset") >= 3000), idxDir, nShards = 12)
      graft.sources.CdxIndex.lookupPrefix(s, idxDir, "org,site3,h17)")
        .select(col("surt"), col("ts"), col("url"), col("offset"), col("length"))
        .orderBy(col("surt"))
    }),

    "cdx_compact_lookup" -> ((s, dir) => {
      // the OTHER half of the LSM lifecycle: the same three-crawl
      // master as cdx_lookup, then the periodic leveled compaction
      // folds the generations back to one and vacuum reclaims the
      // unreferenced ones (keeping the previous manifest's for pinned
      // readers) — and the lookup answer is bit-identical to the
      // un-compacted master's. Green proves compaction moves bytes,
      // never answers.
      val cdx = s.range(4000).selectExpr(
        "concat('https://h', id % 40, '.site', id % 7, '.org/p/', id) AS url",
        "lpad(CAST(id % 97 AS STRING), 14, '0') AS ts",
        "concat('d', id) AS digest", "id AS offset", "100 + id % 9 AS length",
        "'text/html' AS mime", "CAST(200 AS INT) AS status",
        "concat('f', id % 16, '.warc.gz') AS filename")
        .withColumn("surt", call_function("graft_surt", col("url")))
        .select("surt", "ts", "url", "mime", "status", "digest",
          "length", "offset", "filename")
      val idxDir = TempDirs.scratch("cdx_cmp_")
      graft.sources.CdxIndex.initMaster(cdx.filter(col("offset") < 1500), idxDir, nShards = 12)
      graft.sources.CdxIndex.appendCrawl(
        cdx.filter(col("offset") >= 1500 && col("offset") < 3000), idxDir, nShards = 12)
      graft.sources.CdxIndex.appendCrawl(
        cdx.filter(col("offset") >= 3000), idxDir, nShards = 12)
      graft.sources.CdxIndex.compact(s, idxDir, nShards = 12)
      graft.sources.CdxIndex.vacuum(s, idxDir)
      graft.sources.CdxIndex.lookupPrefix(s, idxDir, "org,site3,h17)")
        .select(col("surt"), col("ts"), col("url"), col("offset"), col("length"))
        .orderBy(col("surt"))
    }),

    "cdx_batch_lookup" -> ((s, dir) => {
      // the "re-process THESE urls" shape: a request SET (every 9th
      // page, plus the 11 ids in 4000..4099 the archive never
      // captured) resolves
      // against the 3-generation LSM master in one pruned pass — the
      // tiny cluster broadcasts onto the keys to pick shard files, the
      // scan semi-joins the keys exactly (misses match nothing,
      // duplicates do not duplicate). The oracle replays the
      // intersection from the construction formulas.
      val cdx = s.range(4000).selectExpr(
        "concat('https://h', id % 40, '.site', id % 7, '.org/p/', id) AS url",
        "lpad(CAST(id % 97 AS STRING), 14, '0') AS ts",
        "concat('d', id) AS digest", "id AS offset", "100 + id % 9 AS length",
        "'text/html' AS mime", "CAST(200 AS INT) AS status",
        "concat('f', id % 16, '.warc.gz') AS filename")
        .withColumn("surt", call_function("graft_surt", col("url")))
      val idxDir = TempDirs.scratch("cdx_batch_")
      graft.sources.CdxIndex.initMaster(cdx.filter(col("offset") < 1500), idxDir, nShards = 12)
      graft.sources.CdxIndex.appendCrawl(
        cdx.filter(col("offset") >= 1500 && col("offset") < 3000), idxDir, nShards = 12)
      graft.sources.CdxIndex.appendCrawl(
        cdx.filter(col("offset") >= 3000), idxDir, nShards = 12)
      val wanted = s.range(4100).filter(col("id") % 9 === 0).selectExpr(
        "concat('https://h', id % 40, '.site', id % 7, '.org/p/', id) AS url")
        .withColumn("surt", call_function("graft_surt", col("url")))
        .select("surt")
      graft.sources.CdxIndex.lookupBatch(s, idxDir, wanted)
        .select(col("surt"), col("ts"), col("url"), col("offset"))
        .orderBy(col("surt"))
    }),

    "cdx_digest_lookup" -> ((s, dir) => {
      // the digest-keyed REVERSE index: identical content planted
      // across 8 hosts each (digest = d(id % 500), so every digest has
      // captures on different hosts/pages) → buildDigestIndex
      // (range-partitioned and cluster-pruned by digest) →
      // lookupDigest reconstructs ONE content's full capture set with
      // a pruned ranged scan — provenance / storage-dedup accounting /
      // takedown sweeps without touching the rest of the index. The
      // oracle replays the capture set from the planting formula.
      val cdx = s.range(4000).selectExpr(
        "concat('https://h', id % 40, '.site', id % 7, '.org/p/', id) AS url",
        "lpad(CAST(id % 97 AS STRING), 14, '0') AS ts",
        "concat('d', id % 500) AS digest", "id AS offset", "100 + id % 9 AS length",
        "'text/html' AS mime", "CAST(200 AS INT) AS status",
        "concat('f', id % 16, '.warc.gz') AS filename")
        .withColumn("surt", call_function("graft_surt", col("url")))
      val idxDir = TempDirs.scratch("cdx_dig_")
      graft.sources.CdxIndex.buildDigestIndex(cdx, idxDir, nShards = 12)
      graft.sources.CdxIndex.lookupDigest(s, idxDir, "d137")
        .select(col("digest"), col("surt"), col("ts"), col("url"), col("offset"))
        .orderBy(col("surt"), col("ts"))
    }),

    "pipeline_crawl_stream_index" -> ((s, dir) => {
      // the STREAMING maintenance loop's exactly-once surface,
      // replayed deterministically: the 4000-capture corpus arrives as
      // three epochs appended to BOTH living masters (primary and
      // digest reverse) via appendEpoch — epoch 1 is delivered TWICE
      // (the foreachBatch crash-replay shape; the manifest-tag ledger
      // makes the second delivery a no-op) — then the SIZE-TIERED
      // compaction folds the two smallest generations while the base
      // stays untouched. A double-counted epoch, a lost append, or a
      // tier fold that dropped rows would change the answer and
      // hash-mismatch. Output: a host lookup against the primary
      // master UNION one content's capture set from the digest master.
      val cdx = s.range(4000).selectExpr(
        "concat('https://h', id % 40, '.site', id % 7, '.org/p/', id) AS url",
        "lpad(CAST(id % 97 AS STRING), 14, '0') AS ts",
        "concat('d', id % 500) AS digest", "id AS offset", "100 + id % 9 AS length",
        "'text/html' AS mime", "CAST(200 AS INT) AS status",
        "concat('f', id % 16, '.warc.gz') AS filename")
        .withColumn("surt", call_function("graft_surt", col("url")))
      val pDir = TempDirs.scratch("cdx_stream_p_")
      val dDir = TempDirs.scratch("cdx_stream_d_")
      def epoch(lo: Long, hi: Long) =
        cdx.filter(col("offset") >= lo && col("offset") < hi)
      Seq((0L, 1500L, "epoch-0"), (1500L, 3000L, "epoch-1"),
          (1500L, 3000L, "epoch-1"), // the crash-replayed delivery: must no-op
          (3000L, 4000L, "epoch-2")).foreach { case (lo, hi, tag) =>
        graft.sources.CdxIndex.appendEpoch(epoch(lo, hi), pDir, nShards = 12, tag)
        graft.sources.CdxIndex.appendEpoch(epoch(lo, hi), dDir, nShards = 12, tag,
          graft.sources.CdxIndex.DigestKey)
      }
      graft.sources.CdxIndex.compact(s, pDir, nShards = 12, maxGens = 2)
      graft.sources.CdxIndex.compact(s, dDir, nShards = 12, maxGens = 2)
      graft.sources.CdxIndex.lookupPrefix(s, pDir, "org,site3,h17)")
        .select(lit("host").as("kind"), col("surt"), col("ts"), col("url"), col("offset"))
        .unionByName(
          graft.sources.CdxIndex.lookupDigest(s, dDir, "d137")
            .select(lit("digest").as("kind"), col("surt"), col("ts"),
              col("url"), col("offset")))
        .orderBy(col("kind"), col("surt"), col("ts"))
    }),

    "cdx_digest_batch" -> ((s, dir) => {
      // the BATCH takedown/provenance sweep: a request SET of content
      // hashes (every 37th planted digest, including never-captured
      // ones ≥ d500, each requested TWICE) resolves against a
      // 2-generation digest master in one pruned pass — the cluster
      // broadcasts onto the keys, the scan semi-joins them exactly
      // (misses match nothing, duplicates do not duplicate). The
      // oracle replays the intersection from the planting formulas.
      val cdx = s.range(4000).selectExpr(
        "concat('https://h', id % 40, '.site', id % 7, '.org/p/', id) AS url",
        "lpad(CAST(id % 97 AS STRING), 14, '0') AS ts",
        "concat('d', id % 500) AS digest", "id AS offset", "100 + id % 9 AS length",
        "'text/html' AS mime", "CAST(200 AS INT) AS status",
        "concat('f', id % 16, '.warc.gz') AS filename")
        .withColumn("surt", call_function("graft_surt", col("url")))
      val dDir = TempDirs.scratch("cdx_digb_")
      graft.sources.CdxIndex.appendEpoch(cdx.filter(col("offset") < 2000),
        dDir, nShards = 12, "epoch-0", graft.sources.CdxIndex.DigestKey)
      graft.sources.CdxIndex.appendEpoch(cdx.filter(col("offset") >= 2000),
        dDir, nShards = 12, "epoch-1", graft.sources.CdxIndex.DigestKey)
      val wanted = s.range(1200).filter(expr("(id % 600) % 37 = 0"))
        .selectExpr("concat('d', id % 600) AS digest")
      graft.sources.CdxIndex.lookupDigestBatch(s, dDir, wanted)
        .select(col("digest"), col("surt"), col("ts"), col("url"), col("offset"))
        .orderBy(col("digest"), col("surt"))
    }),

    "cdx_nearest_lookup" -> ((s, dir) => {
      // memento-style TimeGate resolution: 1000 urls captured in three
      // crawls (Jan 1/2/3); requests probe BEFORE every capture
      // (forward match), nearer-backward, the exact midpoint (tie →
      // the EARLIER capture), and a nearer-forward instant — two as-of
      // passes (backward + forward, each the single-shuffle spine
      // join) and a row-level epoch-seconds pick. The oracle replays
      // each arm's expected capture from the planting formulas.
      val caps = s.range(3000).selectExpr(
        "id % 1000 AS base", "CAST(id DIV 1000 AS INT) AS crawl")
        .selectExpr(
          "concat('https://h', base % 20, '.ex.org/p/', base) AS url",
          "concat('2026010', crawl + 1, '000000') AS ts",
          "concat('f', crawl, '.warc.gz') AS filename",
          "base AS offset", "CAST(100 AS BIGINT) AS length")
        .withColumn("surt", call_function("graft_surt", col("url")))
      val reqs = s.range(1000).selectExpr(
        "id AS base",
        """CASE CAST(id % 4 AS INT)
          |  WHEN 0 THEN '20251230000000'
          |  WHEN 1 THEN '20260101060000'
          |  WHEN 2 THEN '20260101120000'
          |  ELSE '20260102200000' END AS want_ts""".stripMargin)
        .selectExpr(
          "graft_surt(concat('https://h', base % 20, '.ex.org/p/', base)) AS surt",
          "want_ts")
      graft.sources.CdxIndex.resolveNearest(reqs, caps)
        .select(col("surt"), col("want_ts"), col("ts"), col("filename"), col("offset"))
        .orderBy(col("surt"))
    }),

    "cdx_nearest_at" -> ((s, dir) => {
      // the ENGINE-COMPOSED TimeGate: the same memento arms as
      // cdx_nearest_lookup, but resolved against a STORED
      // three-generation master via resolveNearestAt — the request
      // surts prune the scan to their shard files (the lookupBatch
      // discipline: nothing request-sized on the driver, the spine
      // carries only requested keys' captures) and the per-file ts
      // windows skip the crawl-3 generation in wave 1 (its window
      // sits past the request span), re-admitting it in the
      // δ-feedback pass because the 20:00 arm's achieved distance
      // still reaches it. A wrong admission decision, a lost wave, or
      // a pruning miss changes the answer and hash-mismatches. Oracle
      // = the cdx_nearest_lookup arms replayed from the formulas.
      val caps = s.range(3000).selectExpr(
        "id % 1000 AS base", "CAST(id DIV 1000 AS INT) AS crawl")
        .selectExpr(
          "concat('https://h', base % 20, '.ex.org/p/', base) AS url",
          "concat('2026010', crawl + 1, '000000') AS ts",
          "concat('f', crawl, '.warc.gz') AS filename",
          "base AS offset", "CAST(100 AS BIGINT) AS length",
          "crawl")
        .withColumn("surt", call_function("graft_surt", col("url")))
      val mDir = TempDirs.scratch("cdx_near_at_")
      (0 to 2).foreach { c =>
        graft.sources.CdxIndex.appendEpoch(
          caps.filter(col("crawl") === c).drop("crawl"), mDir, nShards = 8, s"crawl-$c")
      }
      val reqs = s.range(1000).selectExpr(
        "id AS base",
        """CASE CAST(id % 4 AS INT)
          |  WHEN 0 THEN '20251230000000'
          |  WHEN 1 THEN '20260101060000'
          |  WHEN 2 THEN '20260101120000'
          |  ELSE '20260102200000' END AS want_ts""".stripMargin)
        .selectExpr(
          "graft_surt(concat('https://h', base % 20, '.ex.org/p/', base)) AS surt",
          "want_ts")
      graft.sources.CdxIndex.resolveNearestAt(s, mDir, reqs)
        .select(col("surt"), col("want_ts"), col("ts"), col("filename"), col("offset"))
        .orderBy(col("surt"))
    }),

    "cdx_timemap" -> ((s, dir) => {
      // RFC 7089 TimeMap — ONE URI's full capture timeline, paged: 40
      // urls × 10 captures each (5 distinct instants visited TWICE, so
      // duplicate-instant ordering must fall back to the (filename,
      // offset) tiebreak deterministically) land as two appendEpoch
      // generations; timeMap prunes to the one url's shard files and
      // pages the timeline at 3 captures per page. The oracle replays
      // the ordering, seq and page arithmetic from the formulas.
      val cdx = s.range(400).selectExpr(
        "concat('https://h', id % 40, '.ex.org/p/', id % 40) AS url",
        "concat('202601', lpad(CAST(1 + (id DIV 40) % 5 AS STRING), 2, '0'), '000000') AS ts",
        "concat('d', id % 5) AS digest", "id AS offset",
        "CAST(100 + id % 9 AS BIGINT) AS length",
        "'text/html' AS mime", "CAST(200 AS INT) AS status",
        "concat('f', id % 3, '.warc.gz') AS filename")
        .withColumn("surt", call_function("graft_surt", col("url")))
      val mDir = TempDirs.scratch("cdx_tmap_")
      graft.sources.CdxIndex.appendEpoch(
        cdx.filter(col("offset") < 200), mDir, nShards = 6, "epoch-0")
      graft.sources.CdxIndex.appendEpoch(
        cdx.filter(col("offset") >= 200), mDir, nShards = 6, "epoch-1")
      graft.sources.CdxIndex.timeMap(s, mDir, "https://h7.ex.org/p/7", pageSize = 3)
        .orderBy(col("seq"))
    }),

    "cdx_epoch_metrics" -> ((s, dir) => {
      // the archival loop's telemetry: three epochs (20/30/40 pages)
      // flow through the SELF-MAINTAINING sink — epoch 1 delivered
      // TWICE (the crash-replay shape: the tag ledger no-ops it and
      // the metrics table must gain NO row) — and the per-epoch
      // metrics rows record rows appended and the generation counts
      // around the size-tiered fold (epoch 2 pushes the master past
      // maxGens = 2, folding the two smallest generations). The
      // oracle states the expected ledger outright; a double-counted
      // replay, a missed fold, or a miscounted append changes it.
      import s.implicits._
      val root = TempDirs.scratch("cdx_met_root_")
      val mDir = TempDirs.scratch("cdx_met_idx_")
      val sink = WarcIo.archiveEpochSink(root, mDir, nShards = 4,
        maxGens = Some(2), tagHorizon = Some(8))
      def records(e: Int, n: Int): DataFrame = s.range(n).as[Long]
        .mapPartitions(_.map { id =>
          val payload = WarcIo.buildHttpResponse(200, "OK",
            Seq("Content-Type" -> "text/html; charset=utf-8"),
            s"<html>metrics $e/$id</html>"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ("response", s"http://m$e.example.org/p/$id", "2026-01-01T00:00:00Z",
            WarcIo.recordIdFor(s"met:$e:$id"),
            "application/http; msgtype=response", payload)
        }).toDF("rec_type", "target_uri", "warc_date", "record_id",
          "content_type", "payload")
      sink(records(0, 20), 0L)
      sink(records(1, 30), 1L)
      sink(records(1, 30), 1L) // crash-replayed delivery: must add NO row
      sink(records(2, 40), 2L)
      graft.sources.CdxIndex.epochMetrics(s, mDir)
        .select(col("epoch"), col("rows"), col("gens_before"), col("gens_after"),
          col("gens_folded"))
        .orderBy(col("epoch"))
    }),

    "cdx_lookup_timebound" -> ((s, dir) => {
      // the era-bound listing: three year-apart crawls land as three
      // generations, and "this host's 2027 captures" must come back
      // from the 2027 generation alone — the per-file ts windows in
      // the cluster rows prune the other eras' files before any scan
      // (CdxSpec pins the file-level skip; here the ANSWER is oracled:
      // exactly the middle crawl's captures of the probed host, with
      // partial-prefix bounds the way wayback CDX queries spell them).
      val caps = s.range(3000).selectExpr(
        "id % 1000 AS base", "CAST(id DIV 1000 AS INT) AS crawl")
        .selectExpr(
          "concat('https://h', base % 20, '.ex.org/p/', base) AS url",
          "concat('202', 6 + crawl, '0101000000') AS ts",
          "concat('f', crawl, '.warc.gz') AS filename",
          "base AS offset", "CAST(100 AS BIGINT) AS length",
          "crawl")
        .withColumn("surt", call_function("graft_surt", col("url")))
      val mDir = TempDirs.scratch("cdx_tb_")
      (0 to 2).foreach { c =>
        graft.sources.CdxIndex.appendEpoch(
          caps.filter(col("crawl") === c).drop("crawl"), mDir, nShards = 8, s"era-$c")
      }
      graft.sources.CdxIndex.lookupPrefixBetween(s, mDir, "org,ex,h7)", "2027", "2028")
        .select(col("surt"), col("ts"), col("url"), col("filename"), col("offset"))
        .orderBy(col("surt"))
    }),

    "cdx_domain_timebound" -> ((s, dir) => {
      // the era-bound DOMAIN sweep: same three-crawl master as
      // cdx_lookup_timebound, probed by registrable domain — all 20
      // hosts' 2027 captures, through the domain's three key ranges
      // and the ts window in one cluster pass
      val caps = s.range(3000).selectExpr(
        "id % 1000 AS base", "CAST(id DIV 1000 AS INT) AS crawl")
        .selectExpr(
          "concat('https://h', base % 20, '.ex.org/p/', base) AS url",
          "concat('202', 6 + crawl, '0101000000') AS ts",
          "concat('f', crawl, '.warc.gz') AS filename",
          "base AS offset", "CAST(100 AS BIGINT) AS length",
          "crawl")
        .withColumn("surt", call_function("graft_surt", col("url")))
      val mDir = TempDirs.scratch("cdx_dtb_")
      (0 to 2).foreach { c =>
        graft.sources.CdxIndex.appendEpoch(
          caps.filter(col("crawl") === c).drop("crawl"), mDir, nShards = 8, s"era-$c")
      }
      graft.sources.CdxIndex.lookupDomainBetween(s, mDir, "org,ex", "2027", "2028")
        .select(col("surt"), col("ts"), col("url"), col("offset"))
        .orderBy(col("surt"))
    }),

    "cdx_collapse" -> ((s, dir) => {
      // CDX-server collapse=timestamp:6 thinning: 100 URLs × 6
      // captures (2 per month over 3 months) stored as a master;
      // "one capture per URL per month" must keep exactly the first
      // of each month pair — and a digest collapse over the same rows
      // must keep the version CHANGES (adjacency, not distinct).
      val caps = s.range(600).selectExpr(
        "id % 100 AS base", "CAST(id DIV 100 AS INT) AS c")
        .selectExpr(
          "concat('https://h', base % 5, '.ex.org/p/', base) AS url",
          "concat('2026', lpad(CAST(1 + c DIV 2 AS STRING), 2, '0'), " +
            "lpad(CAST(1 + c AS STRING), 2, '0'), '000000') AS ts",
          "concat('f', c, '.warc.gz') AS filename", "base AS offset",
          "CAST(100 AS BIGINT) AS length",
          "concat('d', base, '_', c DIV 3) AS digest")
        .withColumn("surt", call_function("graft_surt", col("url")))
      val mDir = TempDirs.scratch("cdx_col_")
      graft.sources.CdxIndex.appendEpoch(caps, mDir, nShards = 8, "one")
      val host = graft.sources.CdxIndex.lookupPrefix(s, mDir, "org,ex,h3)")
      graft.sources.CdxIndex.collapseCaptures(host, "ts", 6)
        .select(col("surt"), col("ts"), col("digest"))
        .unionByName(
          graft.sources.CdxIndex.collapseCaptures(host, "digest", 99)
            .select(col("surt"), col("ts"),
              concat(lit("chg:"), col("digest")).as("digest")))
        .orderBy(col("surt"), col("ts"), col("digest"))
    }),

    "cdx_latest" -> ((s, dir) => {
      // wayback's limit=-1 banner: latest capture per URL across TWO
      // generations — every key re-captured in gen 2, so the winner
      // set is exactly the second crawl's rows (one hash agg, max_by
      // over the pointer axis; no window, no unreduced shuffle).
      val caps = s.range(400).selectExpr(
        "id % 200 AS base", "CAST(id DIV 200 AS INT) AS crawl")
        .selectExpr(
          "concat('https://h', base % 10, '.ex.org/p/', base) AS url",
          "concat('202', 6 + crawl, '01', lpad(CAST(1 + base % 28 AS STRING), 2, '0'), '000000') AS ts",
          "concat('f', crawl, '.warc.gz') AS filename",
          "base AS offset", "CAST(100 AS BIGINT) AS length",
          "concat('d', base, '_', crawl) AS digest", "crawl")
        .withColumn("surt", call_function("graft_surt", col("url")))
      val mDir = TempDirs.scratch("cdx_lat_")
      (0 to 1).foreach { c =>
        graft.sources.CdxIndex.appendEpoch(
          caps.filter(col("crawl") === c).drop("crawl"), mDir, nShards = 8, s"g-$c")
      }
      graft.sources.CdxIndex.lookupLatest(s, mDir, "org,ex,h7)")
        .select(col("surt"), col("ts"), col("url"), col("digest"), col("offset"))
        .orderBy(col("surt"))
    }),

    "cdx_resume_page" -> ((s, dir) => {
      // CDX-server pagination: one host's 15-capture listing walked in
      // FOUR resume-key pages of 4 against the 2-generation master —
      // each page is a range-pruned scan + TakeOrdered cut, the next
      // page addressed by the previous page's last (surt, ts,
      // filename, offset) — then reassembled with page indexes. A
      // capture skipped or repeated at any page boundary changes the
      // rows and hash-mismatches. The oracle replays the row_number /
      // page arithmetic from the planting formulas.
      val cdx = s.range(4000).selectExpr(
        "concat('https://h', id % 40, '.site', id % 7, '.org/p/', id) AS url",
        "lpad(CAST(id % 97 AS STRING), 14, '0') AS ts",
        "concat('d', id) AS digest", "id AS offset", "100 + id % 9 AS length",
        "'text/html' AS mime", "CAST(200 AS INT) AS status",
        "concat('f', id % 16, '.warc.gz') AS filename")
        .withColumn("surt", call_function("graft_surt", col("url")))
      val mDir = TempDirs.scratch("cdx_page_")
      graft.sources.CdxIndex.appendEpoch(
        cdx.filter(col("offset") < 2000), mDir, nShards = 8, "epoch-0")
      graft.sources.CdxIndex.appendEpoch(
        cdx.filter(col("offset") >= 2000), mDir, nShards = 8, "epoch-1")
      val prefix = "org,site3,h17)"
      var resume: Option[(String, String, String, Long)] = None
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
      (0 until 4).foreach { p =>
        val rows = graft.sources.CdxIndex
          .lookupPrefixPage(s, mDir, prefix, limit = 4, resumeAfter = resume)
          .collect()
        rows.foreach(r => buf += ((p, r.getAs[String]("surt"), r.getAs[String]("ts"),
          r.getAs[String]("url"), r.getAs[Long]("offset"))))
        rows.lastOption.foreach(r => resume = Some((r.getAs[String]("surt"),
          r.getAs[String]("ts"), r.getAs[String]("filename"), r.getAs[Long]("offset"))))
      }
      import s.implicits._
      buf.toSeq.toDF("page", "surt", "ts", "url", "offset")
        .orderBy(col("page"), col("surt"), col("ts"), col("offset"))
    }),

    "cdx_columnar" -> ((s, dir) => {
      // the cc-index-table shape: CDX rows widened to typed URL columns
      // (host, eTLD+1 via the PSL, TLD, path) and aggregated per
      // registrable domain — "all captures of domain X" as a parquet
      // predicate scan instead of SURT string games. Same formula
      // corpus as cdx_lookup, so the oracle replays the host/domain
      // derivation and the rollup.
      val cdx = s.range(4000).selectExpr(
        "concat('https://h', id % 40, '.site', id % 7, '.org/p/', id) AS url",
        "lpad(CAST(id % 97 AS STRING), 14, '0') AS ts",
        "concat('d', id) AS digest", "id AS offset", "100 + id % 9 AS length",
        "'text/html' AS mime", "CAST(200 AS INT) AS status",
        "concat('f', id % 16, '.warc.gz') AS filename")
        .withColumn("surt", call_function("graft_surt", col("url")))
      graft.sources.CdxIndex.toColumnar(cdx)
        .groupBy(col("url_host_tld"), col("url_host_registered_domain"))
        .agg(count(lit(1)).as("n_captures"),
          countDistinct(col("url_host_name")).as("n_hosts"),
          min(col("url_surtkey")).as("first_key"),
          sum(col("warc_record_length")).as("total_bytes"))
        .orderBy(col("url_host_registered_domain"))
    }),

    "cdx_change_rate" -> ((s, dir) => {
      // cross-crawl change statistics — the adaptive-revisit signal:
      // 1000 urls captured in THREE crawls; a quarter change content
      // every crawl (rate 1.0), a quarter change once (0.5), the rest
      // never (0.0). ONE hash agg over (surt), distinct digests
      // counted map-side — no window, no collect; the oracle replays
      // capture counts, version counts, fetch-time spans and the rate
      // from the same formulas.
      val cdx = captureHistory(s,
        """CASE
          |  WHEN base % 4 = 0 THEN concat('d', base, '-', crawl)
          |  WHEN base % 4 = 1 THEN concat('d', base, '-',
          |    CASE WHEN crawl = 2 THEN 1 ELSE 0 END)
          |  ELSE concat('d', base) END""".stripMargin)
      graft.sources.CdxIndex.changeStats(cdx)
        .select(col("surt"), col("n_captures"), col("n_versions"),
          col("first_ts"), col("last_ts"), col("change_rate"))
        .orderBy(col("surt"))
    }),

    "cdx_merge_stats" -> ((s, dir) => {
      // the cross-crawl lifecycle composed over the LSM master: crawl 0
      // founds the master (initMaster), crawls 1 and 2 land as their
      // own generations (appendCrawl — each pass sorts only ITS crawl,
      // never re-sorting history), and changeStats runs over the
      // merge-on-read view of all three generations. Green proves
      // init → append → append → merge-on-read → aggregate preserves
      // every row bit-exactly across an incrementally-maintained
      // master.
      val master = TempDirs.scratch("cdx_master_")
      (0 until 3).foreach { crawl =>
        val cdx = s.range(1000).selectExpr("id AS base")
          .selectExpr(
            "concat('https://h', base % 20, '.ex.org/p/', base) AS url",
            s"'2026010${crawl + 1}000000' AS ts",
            s"""CASE
               |  WHEN base % 4 = 0 THEN concat('d', base, '-', $crawl)
               |  WHEN base % 4 = 1 THEN concat('d', base, '-',
               |    ${if (crawl == 2) 1 else 0})
               |  ELSE concat('d', base) END AS digest""".stripMargin)
          .withColumn("surt", call_function("graft_surt", col("url")))
          .selectExpr("surt", "ts", "url", "'text/html' AS mime",
            "CAST(200 AS INT) AS status", "digest",
            "CAST(100 AS BIGINT) AS length", "CAST(0 AS BIGINT) AS offset",
            "'f.warc.gz' AS filename")
        if (crawl == 0) graft.sources.CdxIndex.initMaster(cdx, master, nShards = 4)
        else graft.sources.CdxIndex.appendCrawl(cdx, master, nShards = 4)
      }
      graft.sources.CdxIndex.changeStats(graft.sources.CdxIndex.readMaster(s, master))
        .filter(col("n_versions") > 1)
        .select(col("surt"), col("n_captures"), col("n_versions"), col("change_rate"))
        .orderBy(col("surt"))
    }),

    "pipeline_cdx_fetch" -> ((s, dir) => {
      // the index's PAYOFF, composed end to end: archive + CDX sidecar
      // on disk → master index (range-partitioned, cluster-pruned) →
      // lookupPrefix of ONE host → fetchByCdx reads exactly those
      // records by positioned (offset, length) reads — never scanning
      // the archive — and the fetched HTTP entities replay from the
      // raw documents via the escape→byte-length identity. Green
      // proves pointer integrity through the full loop: write → index
      // → prune → seek → gunzip → parse.
      import s.implicits._
      val docs = t(s, dir, "documents").where(col("text").isNotNull)
        .select(col("doc_id"),
          crawlHtml(col("doc_id"), col("text"), lit("CDX fetch heading")).as("html"))
      val warcDir = TempDirs.scratch("cdxf_src_")
      val records = docs.repartition(s.sparkContext.defaultParallelism).as[(Long, String)]
        .mapPartitions(_.map { case (id, html) =>
          val uri = s"http://c${id % 13}.example.org/d/$id"
          val payload = WarcIo.buildHttpResponse(200, "OK",
            Seq("Content-Type" -> "text/html; charset=utf-8"),
            html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ("response", uri, "2026-01-01T00:00:00Z", WarcIo.recordIdFor("cdxfsrc:" + id),
            "application/http; msgtype=response", payload)
        }).toDF("rec_type", "target_uri", "warc_date", "record_id",
          "content_type", "payload")
      WarcIo.writeWarcWithCdx(records, warcDir)
      val idxDir = TempDirs.scratch("cdxf_idx_")
      graft.sources.CdxIndex.buildTable(
        WarcIo.readCdxj(s, warcDir + "/part-*.cdx.gz"), idxDir, nShards = 8)
      val hit = graft.sources.CdxIndex.lookupPrefix(s, idxDir, "org,example,c5)")
      WarcIo.fetchByCdx(hit, warcDir)
        .select(col("target_uri"), col("payload"))
        .as[(String, Array[Byte])]
        .mapPartitions(_.map { case (uri, payload) =>
          val http = WarcIo.parseHttpResponse(payload)
          (uri.substring(uri.lastIndexOf('/') + 1).toLong, http.status,
            http.body.length.toLong)
        }).toDF("doc_id", "status", "entity_length")
        .orderBy(col("doc_id"))
    }),

    "pipeline_archive_compact" -> ((s, dir) => {
      // the small-file maintenance loop AS ONE MAINTAINED FLOW: the
      // master index exists BEFORE the compaction (initMaster from the
      // first commit's sidecars), the 16 tiny parts compact into ~2 by
      // BYTE-concatenating gzip members (no re-encoding) with the
      // sidecar offsets shifted arithmetically, and refreshFromArchive
      // republishes the master from the REWRITTEN sidecars in the same
      // pass — closing the pointer-invalidation window by construction.
      // One host's entities then fetch by the refreshed pointers.
      // Green proves the compaction moved bytes and the refresh
      // repointed the master without touching a single record: the
      // fetched entities replay from the raw documents via the
      // escape→byte-length identity.
      import s.implicits._
      val docs = t(s, dir, "documents").where(col("text").isNotNull)
        .select(col("doc_id"),
          crawlHtml(col("doc_id"), col("text"), lit("Compacted archive")).as("html"))
      val warcDir = TempDirs.scratch("cmp_src_")
      val records = docs.repartition(16).as[(Long, String)]
        .mapPartitions(_.map { case (id, html) =>
          val uri = s"http://c${id % 13}.example.org/d/$id"
          val payload = WarcIo.buildHttpResponse(200, "OK",
            Seq("Content-Type" -> "text/html; charset=utf-8"),
            html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ("response", uri, "2026-01-01T00:00:00Z", WarcIo.recordIdFor("cmpsrc:" + id),
            "application/http; msgtype=response", payload)
        }).toDF("rec_type", "target_uri", "warc_date", "record_id",
          "content_type", "payload")
      WarcIo.writeWarcWithCdx(records, warcDir)
      val idxDir = TempDirs.scratch("cmp_idx_")
      graft.sources.CdxIndex.initMaster(
        WarcIo.readCdxjCommitted(s, warcDir), idxDir, nShards = 8)
      val total = WarcIo.committedFiles(s, warcDir, ".warc.gz")
        .map(p => new java.io.File(new java.net.URI(p)).length).sum
      WarcIo.compactArchives(s, warcDir, targetBytes = total / 2 + 1)
      graft.sources.CdxIndex.refreshFromArchive(s, warcDir, idxDir, nShards = 8)
      val hit = graft.sources.CdxIndex.lookupPrefix(s, idxDir, "org,example,c5)")
      WarcIo.fetchByCdx(hit, warcDir)
        .select(col("target_uri"), col("payload"))
        .as[(String, Array[Byte])]
        .mapPartitions(_.map { case (uri, payload) =>
          val http = WarcIo.parseHttpResponse(payload)
          (uri.substring(uri.lastIndexOf('/') + 1).toLong, http.status,
            http.body.length.toLong)
        }).toDF("doc_id", "status", "entity_length")
        .orderBy(col("doc_id"))
    }),

    "pipeline_wayback" -> ((s, dir) => {
      // wayback replay END TO END: two crawls commit with CDX sidecars
      // (crawl 2 marked against crawl 1's digests, so unchanged pages
      // land as payload-free revisits); (url, instant) requests
      // as-of-resolve to the day-2 captures; replay() fetches them by
      // pointer and follows each revisit's identical-payload-digest
      // indirection back to the crawl-1 ORIGINAL's bytes with a second
      // ranged read. The oracle replays record types, the replay flag,
      // and the exact entity byte length per doc (revisits must serve
      // the V1 body; changed pages the LONGER V2 body) from the raw
      // documents alone — a replay that served the revisit's empty
      // payload, or the wrong version's bytes, hash-mismatches.
      import s.implicits._
      val docs = t(s, dir, "documents").where(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val root = TempDirs.scratch("wayback_")
      def records(html: DataFrame, date: String, idp: String): DataFrame =
        html.repartition(s.sparkContext.defaultParallelism).as[(Long, String)].mapPartitions(_.map { case (id, h) =>
          val uri = s"http://c${id % 13}.example.org/d/$id"
          val payload = WarcIo.buildHttpResponse(200, "OK",
            Seq("Content-Type" -> "text/html; charset=utf-8"),
            h.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ("response", uri, date, WarcIo.recordIdFor(idp + id),
            "application/http; msgtype=response", payload)
        }).toDF("rec_type", "target_uri", "warc_date", "record_id",
          "content_type", "payload")
      val v1 = docs.select(col("doc_id"),
        crawlHtml(col("doc_id"), col("text"), lit("Wayback v1")).as("html"))
      WarcIo.writeWarcWithCdx(records(v1, "2026-01-01T00:00:00Z", "wb1:"),
        root + "/crawl1", "crawl1/")
      val v2 = docs.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          crawlHtml(col("doc_id"), col("text"), lit("Wayback v1")))
          .otherwise(crawlHtml(col("doc_id"), col("text"), lit("Wayback v2 changed")))
          .as("html"))
      val prior = WarcIo.readCdxj(s, root + "/crawl1/part-*.cdx.gz")
        .select(col("digest")).distinct()
      WarcIo.writeWarcWithCdx(
        WarcIo.markRevisits(records(v2, "2026-01-02T00:00:00Z", "wb2:"), prior),
        root + "/crawl2", "crawl2/")
      val index = WarcIo.readCdxj(s, root + "/crawl*/part-*.cdx.gz")
      val wants = docs.select(
        call_function("graft_surt",
          concat(lit("http://c"), pmod(col("doc_id"), lit(13)).cast("string"),
            lit(".example.org/d/"), col("doc_id").cast("string"))).as("surt"),
        lit("20260102120000").as("want_ts"))
      val rIdx = index.select(col("surt").as("rsurt"), col("ts"),
        col("filename"), col("offset"), col("length"))
      val resolved = AsOfJoin.asOf(wants, rIdx, "surt", "rsurt", "want_ts", "ts",
        payload = Seq("filename", "offset", "length"))
      WarcIo.replay(resolved.select("filename", "offset", "length"), index, root)
        .select(col("target_uri"), col("rec_type"), col("replayed"), col("payload"))
        .as[(String, String, Boolean, Array[Byte])]
        .mapPartitions(_.map { case (uri, rt, rp, payload) =>
          val http = WarcIo.parseHttpResponse(payload)
          (uri.substring(uri.lastIndexOf('/') + 1).toLong, rt, rp, http.body.length.toLong)
        }).toDF("doc_id", "rec_type", "replayed", "entity_length")
        .orderBy(col("doc_id"))
    }),

    "pipeline_wayback_redirects" -> ((s, dir) => {
      // wayback replay ACROSS 3xx chains: each doc's terminal page is
      // captured once; a quarter of requests enter at a single 301
      // (RELATIVE Location — resolution against the capture url is
      // under test), a quarter at a 2-hop chain (absolute then
      // relative), a quarter at a planted 2-cycle, the rest directly.
      // replayRedirects builds the archive's redirect graph from the
      // index's 3xx captures alone, resolves every edge with one as-of
      // join at the source capture's instant, pointer-doubles to
      // terminals, and serves the terminal page's bytes; cycles come
      // back resolved=false with the last-reached redirect's bytes
      // (all redirect bodies are the 5-byte 'moved', so the cycle arm
      // is deterministic). The oracle replays the resolved flag, the
      // hop count and the exact served byte length per doc.
      import s.implicits._
      val docs = t(s, dir, "documents").where(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val root = TempDirs.scratch("wayredir_")
      val recs = docs.select(col("doc_id"),
          crawlHtml(col("doc_id"), col("text"), lit("Redirect target")).as("html"))
        .repartition(s.sparkContext.defaultParallelism).as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, html) =>
          val host = s"http://c${id % 13}.example.org"
          def resp(path: String, payload: Array[Byte], tag: String) =
            ("response", s"$host$path", "2026-01-01T00:00:00Z",
              WarcIo.recordIdFor(tag + id), "application/http; msgtype=response",
              payload)
          val page = WarcIo.buildHttpResponse(200, "OK",
            Seq("Content-Type" -> "text/html; charset=utf-8"),
            html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          def redir(path: String, loc: String, tag: String) =
            resp(path, WarcIo.buildHttpResponse(301, "Moved Permanently",
              Seq("Content-Type" -> "text/html", "Location" -> loc),
              "moved".getBytes(java.nio.charset.StandardCharsets.UTF_8)), tag)
          val extra = (id % 4) match {
            case 1 => Seq(redir(s"/r1/$id", s"/d/$id", "wr1:"))
            case 2 => Seq(redir(s"/r2/$id", s"$host/r1b/$id", "wr2:"),
              redir(s"/r1b/$id", s"/d/$id", "wr2b:"))
            case 3 => Seq(redir(s"/c/$id", s"/c2/$id", "wc1:"),
              redir(s"/c2/$id", s"/c/$id", "wc2:"))
            case _ => Seq.empty
          }
          (resp(s"/d/$id", page, "wrt:") +: extra).iterator
        }).toDF("rec_type", "target_uri", "warc_date", "record_id",
          "content_type", "payload")
      WarcIo.writeWarcWithCdx(recs, root)
      val index = WarcIo.readCdxjCommitted(s, root)
      val entry = docs.select(col("doc_id"),
        call_function("graft_surt", concat(lit("http://c"),
          pmod(col("doc_id"), lit(13)).cast("string"), lit(".example.org/"),
          when(pmod(col("doc_id"), lit(4)) === 1, lit("r1"))
            .when(pmod(col("doc_id"), lit(4)) === 2, lit("r2"))
            .when(pmod(col("doc_id"), lit(4)) === 3, lit("c"))
            .otherwise(lit("d")),
          lit("/"), col("doc_id").cast("string"))).as("surt"))
      val requests = entry
        .join(index.select(col("surt"), col("filename"), col("offset"))
          .hint("shuffle_hash"), Seq("surt"))
      WarcIo.replayRedirects(requests.select(col("filename"), col("offset")), index, root)
        .join(requests.select(col("doc_id"), col("filename").as("src_filename"),
          col("offset").as("src_offset")).hint("shuffle_hash"),
          Seq("src_filename", "src_offset"))
        .select(col("doc_id"), col("resolved"),
          when(col("resolved"), col("hops")).otherwise(lit(-1L)).as("hops"),
          col("payload"))
        .as[(Long, Boolean, Long, Array[Byte])]
        .mapPartitions(_.map { case (id, res, hops, payload) =>
          (id, res, hops, WarcIo.parseHttpResponse(payload).body.length.toLong)
        }).toDF("doc_id", "resolved", "hops", "entity_length")
        .orderBy(col("doc_id"))
    }),

    "crawl_schedule_robots" -> ((s, dir) => {
      // the robots → scheduler delay loop: each domain's REAL
      // robots.txt text (Crawl-delay present for 2/3 of domains,
      // absent → 1s default for the rest) is parsed by RobotsTxt and
      // its delay drives the politeness slots — so green proves the
      // Crawl-delay extraction AND the slot arithmetic agree
      // cross-engine
      import s.implicits._
      val delays = s.range(12).map { k =>
        val policy =
          if (k % 3 == 0) "User-agent: *\nDisallow: /private/\n"
          else s"User-agent: *\nCrawl-delay: ${1 + k % 5}\nDisallow: /private/\n"
        val robots = graft.functions.RobotsTxt.parse(policy)
        val delayMs = graft.functions.RobotsTxt.groupFor(robots, "graftbot")
          .flatMap(_.crawlDelay).map(d => (d * 1000).toLong).getOrElse(1000L)
        (s"cd$k.org", delayMs)
      }.toDF("domain", "delay_ms")
      val frontier = s.range(240).map { i =>
        val k = i % 12
        (s"cd$k.org", f"http://cd$k.org/p/${i / 12}%03d")
      }.toDF("domain", "url")
      graft.operators.CrawlScheduler.schedule(
        frontier.join(broadcast(delays), Seq("domain")),
        "domain", "url", 4, col("delay_ms"))
        .select(col("url"), col("domain"), col("delay_ms"), col("fetcher"), col("slot_ms"))
        .orderBy(col("url"))
    }),

    "pipeline_crawl_loop" -> ((s, dir) => {
      // FLAGSHIP: one full turn of the production crawl loop, every
      // r13 piece composed — dirty outlinks normalize
      // (graft_url_normalize collapses case/port/utm variants), 3xx
      // fetches collapse to canonical finals (resolveRedirects,
      // pointer doubling), the PERSISTED seen-set drops re-discoveries
      // (CrawlFrontier index: Bloom prefilter + pruned-shard verify,
      // = exact anti-join), hot domains cap at top-10 by priority
      // (bounded-heap graft_topk_agg), and the politeness scheduler
      // assigns rendezvous fetchers + slots. The oracle rebuilds the
      // whole turn from formulas: normalization and redirect targets
      // by construction, the seen-set as a plain NOT IN, the cap as
      // the window formulation, fetchers via the md5 arg_max chain.
      import s.implicits._
      val history = s.range(200).map(i => (s"http://d${i % 8}.shop.com/p/$i", 100L))
        .toDF("url", "day")
      val idxDir = TempDirs.scratch("crawl_loop_idx_")
      graft.operators.CrawlFrontier.buildIndex(history, "url", col("day"), idxDir,
        nShards = 8, expectedItems = 10000L)
      // discovered outlinks, three arms: dirty dup of history (or just
      // past it), a redirect entry point, and a clean new URL
      val discovered = s.range(240).map { i =>
        (i, (i % 3).toInt, (i % 3) match {
          case 0 => s"HTTP://D${i % 8}.SHOP.COM:80/p/$i?utm_source=z"
          case 1 => s"http://r${i % 5}.news.org/old/$i"
          case _ => s"http://u${i % 7}.github.io/post/$i"
        })
      }.toDF("i", "arm", "raw")
        .withColumn("url", call_function("graft_url_normalize", col("raw")))
      // the fetch table for the redirect arm: old → (dirty) Location,
      // new → terminal
      val fetches = s.range(240).filter(_ % 3 == 1).flatMap { i =>
        Seq(
          (s"http://r${i % 5}.news.org/old/$i",
            Some(s"HTTP://R${i % 5}.NEWS.ORG:80/new/$i#frag")),
          (s"http://r${i % 5}.news.org/new/$i", None: Option[String]))
      }.toDF("url", "location_raw")
        .withColumn("location", call_function("graft_url_normalize", col("location_raw")))
        .drop("location_raw")
      val resolved = graft.operators.CrawlFrontier
        .resolveRedirects(fetches, "url", "location", maxHops = 8)
        .select(col("url"), col("final_url"))
      val finals = discovered.filter(col("arm") =!= 1).select(col("url"))
        .unionByName(discovered.filter(col("arm") === 1)
          .join(resolved, Seq("url"))
          .select(col("final_url").as("url")))
      val batch = graft.operators.CrawlFrontier.probeNew(s, idxDir, finals, "url")
        .withColumn("host", call_function("graft_url_host", col("url")))
        .withColumn("domain", call_function("graft_url_domain", col("host")))
        .withColumn("priority",
          regexp_extract(col("url"), "([0-9]+)$", 1).cast("double"))
        .select(col("domain"), col("url"), col("priority"))
      val capped = graft.operators.CrawlScheduler.capPerDomain(
        batch, "domain", "url", col("priority"), 10)
      graft.operators.CrawlScheduler.schedule(capped, "domain", "url", 4, lit(500L))
        .select(col("url"), col("domain"), col("fetcher"), col("slot_ms"))
        .orderBy(col("url"))
    }),

    "pipeline_crawl_loop_ranked" -> ((s, dir) => {
      // the crawl loop with a REAL priority signal: pipeline_crawl_loop
      // ranks by a regexp-extracted digit; here the frontier priority
      // is integer PageRank over the hosts' own link graph
      // (LinkGraph.pageRank, 3 iterations) joined onto the probe
      // output — so the per-domain cap keeps the most-linked hosts'
      // URLs, the production composition. The oracle replays the
      // unrolled integer iterations AND the cap/schedule over the
      // ranked priorities.
      import s.implicits._
      def hostOf(j: Column): Column =
        when(j < 8, concat(lit("d"), j, lit(".shop.com")))
          .when(j < 13, concat(lit("r"), j - 8, lit(".news.org")))
          .otherwise(concat(lit("u"), j - 13, lit(".github.io")))
      // quadratic-mixed link graph over the loop's 20 hosts: varied
      // in-degrees → varied ranks (a permutation graph would rank
      // every host identically and the cap would decay to url order)
      val edges = s.range(200).select(
        hostOf(pmod(col("id"), lit(20L))).as("src"),
        hostOf(pmod(col("id") * col("id") + col("id") * 3L + 7L, lit(20L))).as("dst"))
      val ranks = graft.operators.LinkGraph.pageRank(edges, "src", "dst", iterations = 3)
        .withColumnRenamed("node", "host")
      val history = s.range(200).map(i => (s"http://d${i % 8}.shop.com/p/$i", 100L))
        .toDF("url", "day")
      val idxDir = TempDirs.scratch("crawl_loop_rk_")
      graft.operators.CrawlFrontier.buildIndex(history, "url", col("day"), idxDir,
        nShards = 8, expectedItems = 10000L)
      val discovered = s.range(240).map { i =>
        (i % 3) match {
          case 0 => s"http://d${i % 8}.shop.com/p/$i"
          case 1 => s"http://r${i % 5}.news.org/new/$i"
          case _ => s"http://u${i % 7}.github.io/post/$i"
        }
      }.toDF("url")
        // twelve URLs on hosts the link graph has NEVER seen — a real
        // discovery batch always carries brand-new hosts, and they must
        // enter the loop at default priority, not silently vanish
        .unionByName(s.range(240, 252)
          .map(i => s"http://x${i % 3}.fresh.net/post/$i").toDF("url"))
      val batch = graft.operators.CrawlFrontier.probeNew(s, idxDir, discovered, "url")
        .withColumn("host", call_function("graft_url_host", col("url")))
        .withColumn("domain", call_function("graft_url_domain", col("host")))
        // LEFT join + default 0: an unlinked new host has no rank row;
        // an inner join here would drop it from the crawl entirely
        .join(ranks, Seq("host"), "left")
        .withColumn("rank_micros", coalesce(col("rank_micros"), lit(0L)))
        .select(col("domain"), col("url"), col("rank_micros"))
      val capped = graft.operators.CrawlScheduler.capPerDomain(
        batch, "domain", "url", col("rank_micros"), 10)
      graft.operators.CrawlScheduler.schedule(capped, "domain", "url", 4, lit(500L),
        tiebreak = Nil)
        .select(col("url"), col("domain"), col("rank_micros"), col("fetcher"), col("slot_ms"))
        .orderBy(col("url"))
    }),

    "frontier_redirects" -> ((s, dir) => {
      // 3xx Location chains collapsed to their canonical terminal URL
      // (CrawlFrontier.resolveRedirects — pointer doubling,
      // ⌈log₂(maxHops+1)⌉ self-joins): four arms per template — a
      // 3-hop chain whose
      // middle Location is RAW (scheme/host case, default port,
      // utm params) and must normalize before resolution, a plain
      // terminal, a single redirect, and a 2-cycle that must come back
      // resolved=false. Expected finals/hops are fixed per arm.
      import s.implicits._
      val fetches = s.range(120).flatMap { i =>
        val d = s"s${i % 10}.com"
        (i % 4) match {
          case 0 => Seq(
            (s"http://$d/start/$i", Some(s"HTTP://${d.toUpperCase}:80/mid/$i?utm_source=x")),
            (s"http://$d/mid/$i", Some(s"http://$d/final/$i")),
            (s"http://$d/final/$i", None))
          case 1 => Seq((s"http://$d/solo/$i", None))
          case 2 => Seq(
            (s"http://$d/one/$i", Some(s"http://$d/fin/$i")),
            (s"http://$d/fin/$i", None))
          case _ => Seq(
            (s"http://$d/loopa/$i", Some(s"http://$d/loopb/$i")),
            (s"http://$d/loopb/$i", Some(s"http://$d/loopa/$i")))
        }
      }.toDF("url", "location_raw")
        // raw Location values canonicalize in the native expression
        // BEFORE chain resolution — otherwise the dirty mid-hop never
        // matches its fetched row
        .withColumn("location", call_function("graft_url_normalize", col("location_raw")))
        .drop("location_raw")
      graft.operators.CrawlFrontier.resolveRedirects(fetches, "url", "location", maxHops = 16)
        .orderBy(col("url"))
    }),

    "crawl_revisits" -> ((s, dir) => {
      // the re-crawl storage dedup loop END TO END: yesterday's crawl
      // written to real .warc.gz archives → digest set via readWarc +
      // graft_warc_digest → today's fetches marked (unchanged payload
      // ⇒ payload-free revisit record keyed on WARC-Payload-Digest) →
      // today's archive written and read back. The oracle reconstructs
      // record types and byte counts from the text formulas alone, so
      // green proves digesting, marking, and the revisit container
      // round-trip are all byte-exact.
      import s.implicits._
      val yesterday = revisitRows(s.range(120).map(i => (i, s"doc $i body v1")), "rv")
      val yDir = TempDirs.scratch("revisit_y_")
      WarcIo.writeWarc(yesterday, yDir)
      val prior = WarcIo.payloadDigests(WarcIo.readWarc(s, yDir + "/*.warc.gz"))
      val today = revisitRows(s.range(120).map(i =>
        (i, if (i % 3 == 0) s"doc $i body v1" else s"doc $i body v2")), "rv")
      val tDir = TempDirs.scratch("revisit_t_")
      WarcIo.writeWarc(WarcIo.markRevisits(today, prior), tDir)
      WarcIo.readWarc(s, tDir + "/*.warc.gz")
        .select(
          substring_index(col("target_uri"), "/", -1).cast("long").as("id"),
          col("rec_type"),
          col("content_length").as("n_bytes"),
          col("payload_digest").isNotNull.as("digested"))
        .orderBy(col("id"))
    }),

    "cdx_asof_lookup" -> ((s, dir) => {
      // wayback-style time travel, batch form: 1000 requested (url,
      // as-of instant) pairs each resolve to the LATEST capture at or
      // before that instant — which is exactly the engine's as-of
      // join, run against index rows (ts14 strings compare
      // lexicographically = chronologically, so no cast crosses the
      // join). Day-4 requests fall back to the last crawl; day-1
      // requests must not see later captures. The oracle replays the
      // least(want_day, 3) resolution and the digest of the resolved
      // crawl.
      val cdx = captureHistory(s, "concat('d', base, '-', crawl)")
        .withColumnRenamed("surt", "rsurt")
        .select("rsurt", "ts", "digest")
      val wants = s.range(1000).selectExpr(
        "concat('https://h', id % 20, '.ex.org/p/', id) AS url",
        "concat('2026010', 1 + id % 4, '120000') AS want_ts")
        .withColumn("surt", call_function("graft_surt", col("url")))
        .select("surt", "want_ts")
      AsOfJoin.asOf(wants, cdx, "surt", "rsurt", "want_ts", "ts",
          payload = Seq("ts", "digest"))
        .select(col("surt"), col("want_ts"), col("ts").as("capture_ts"), col("digest"))
        .orderBy(col("surt"), col("want_ts"))
    }),

    "cdx_classic_ingest" -> ((s, dir) => {
      // legacy interchange: 300 classic 11-field CDX lines (the
      // wayback `CDX N b a m s k r M S V g` layout, `-` for absent
      // fields, bare-Base32 digests) written as real text files, read
      // back through readCdxClassic into the CDXJ schema. The oracle
      // reconstructs every projected field from the same formulas —
      // green proves field order, null mapping, digest prefixing and
      // the numeric casts agree cross-engine.
      val outDir = TempDirs.scratch("cdx_classic_q_")
      s.range(300).selectExpr(
        """concat('org,cl', id % 9, ')/p/', id, ' ',
          |  '202601', lpad(CAST(1 + id % 28 AS STRING), 2, '0'), '000000 ',
          |  'http://cl', id % 9, '.org/p/', id, ' ',
          |  CASE WHEN id % 5 = 0 THEN '-' ELSE 'text/html' END, ' ',
          |  CASE WHEN id % 5 = 0 THEN '-' ELSE '200' END, ' ',
          |  CASE WHEN id % 7 = 0 THEN '-' ELSE concat('DIGEST', id) END,
          |  ' - - ', 400 + id % 13, ' ', id * 512, ' f', id % 4, '.warc.gz')
          |AS value""".stripMargin)
        .coalesce(1).write.mode("overwrite").text(outDir)
      WarcIo.readCdxClassic(s, outDir + "/part-*")
        .select(col("surt"), col("ts"), col("url"), col("mime"), col("status"),
          col("digest"), col("length"), col("offset"), col("filename"))
        .orderBy(col("surt"))
    }),

    "crawl_revisits_cdx" -> ((s, dir) => {
      // revisit marking fed by the INDEX instead of an archive scan:
      // yesterday's crawl commits WITH its CDX sidecar, and today's
      // dedup reads the prior digest set from the sidecar rows — a
      // tiny column scan — never touching yesterday's archive bytes
      // (cdxjLine computes the same body-only/whole-block digest
      // spelling payloadDigests does, so the two sources are
      // interchangeable; this query shares crawl_revisits' oracle
      // SHAPE with the digest set swapped to the index).
      import s.implicits._
      val yesterday = revisitRows(s.range(120).map(i => (i, s"doc $i body v1")), "rvc")
      val yDir = TempDirs.scratch("revisitc_y_")
      WarcIo.writeWarcWithCdx(yesterday, yDir)
      val prior = WarcIo.readCdxj(s, yDir + "/part-*.cdx.gz")
        .select(col("digest")).distinct()
      val today = revisitRows(s.range(120).map(i =>
        (i, if (i % 3 == 0) s"doc $i body v1" else s"doc $i body v2")), "rvc")
      val tDir = TempDirs.scratch("revisitc_t_")
      WarcIo.writeWarc(WarcIo.markRevisits(today, prior), tDir)
      WarcIo.readWarc(s, tDir + "/*.warc.gz")
        .select(
          substring_index(col("target_uri"), "/", -1).cast("long").as("id"),
          col("rec_type"),
          col("content_length").as("n_bytes"),
          col("payload_digest").isNotNull.as("digested"))
        .orderBy(col("id"))
    }),

    "pipeline_recrawl_adaptive" -> ((s, dir) => {
      // the adaptive-revisit policy CLOSED INTO the scheduler: three
      // crawls of capture history → changeStats → priority =
      // staleness × change-weight (pages observed to change re-crawl
      // sooner; never-changed pages fall behind) → bounded per-host
      // cap. The oracle replays the version counts, the integer
      // priority formula, and the cap's window twin — green proves
      // the change signal actually drives what gets fetched next.
      // change class varies WITHIN each host (j = base DIV 20):
      // every-crawl drift, changed-once, stable — so the cap's
      // keep/drop decisions are visibly change-driven per host
      val cdx = captureHistory(s,
        """CASE
          |  WHEN (base DIV 20) % 4 = 0 THEN concat('d', base, '-', crawl)
          |  WHEN (base DIV 20) % 4 = 1 THEN concat('d', base, '-',
          |    CASE WHEN crawl = 2 THEN 1 ELSE 0 END)
          |  ELSE concat('d', base) END""".stripMargin)
      val feed = graft.sources.CdxIndex.changeStats(cdx)
        .withColumn("rhost", substring_index(col("surt"), ")", 1))
        .withColumn("staleness",
          lit(10L) - substring(col("last_ts"), 7, 2).cast("long"))
        .withColumn("priority",
          (col("staleness") *
            (lit(1L) + round(col("change_rate") * 100).cast("long"))).cast("double"))
      graft.operators.CrawlScheduler.capPerDomain(
          feed.select(col("rhost"), col("surt"), col("priority")),
          "rhost", "surt", col("priority"), 30)
        .select(col("rhost"), col("surt"), col("priority"))
        .orderBy(col("rhost"), col("surt"))
    }),

    "url_robots_filter" -> ((s, dir) => {
      // RFC 9309 politeness gate over a formula frontier: 8 path
      // shapes × 2 crawler tokens against one policy exercising group
      // selection (named vs *), longest-match precedence, `*`
      // wildcards, and `$` anchors; the expected decision per arm is
      // fixed by construction, so the oracle states it directly
      import s.implicits._
      val policy = Seq(
        "User-agent: graftbot",
        "Disallow: /private/",
        "Allow: /private/pub/",
        "Disallow: /*.pdf$",
        "Disallow: /tmp*",
        "Allow: /tmp/keep$",
        "",
        "User-agent: *",
        "Disallow: /secret/").mkString("\n")
      s.range(200).mapPartitions { it =>
        val robots = graft.functions.RobotsTxt.parse(policy) // once per task
        it.flatMap { iL =>
          val i = iL.toLong
          val path = (i % 8) match {
            case 0 => s"/public/page$i.html"
            case 1 => s"/private/doc$i.html"
            case 2 => s"/private/pub/x$i"
            case 3 => s"/docs/file$i.pdf"
            case 4 => s"/docs/file$i.pdfx"
            case 5 => s"/tmp/cache$i"
            case 6 => "/tmp/keep"
            case _ => s"/secret/x$i"
          }
          Seq("graftbot", "otherbot").map(a =>
            (i, a, path, graft.functions.RobotsTxt.isAllowed(robots, a, path)))
        }
      }.toDF("id", "agent", "path", "allowed")
        .orderBy(col("id"), col("agent"))
    }),

    "mm_mp4_info" -> ((s, dir) => {
      // REAL ISO-BMFF container round-trip through the multimodal
      // plumbing: two tracks per file (vide with multi-run stts + stss
      // subset, soun with constant deltas and no stss), encoded to
      // actual boxes and parsed back; every output column is integer
      // arithmetic the oracle recomputes from the track formulas alone
      import s.implicits._
      s.range(12).mapPartitions(_.flatMap { iL =>
        val i = iL.toInt
        val vTs = 600 + (i % 5) * 200
        val nV = 4 + i % 4
        val vDeltas = (0 until nV).map(j => 40 + (i * 3 + j * 7) % 60)
        val vSizes = (0 until nV).map(j => 3 + (i + j) % 5)
        val nA = 3 + i % 3
        val tracks = Seq(
          Mp4Codec.TrackSpec(1, "vide", "avc1", vTs, vDeltas,
            vSizes.map(sz => Array.fill[Byte](sz)(i.toByte)), 1 to nV by 3),
          Mp4Codec.TrackSpec(2, "soun", "mp4a", 8000, Seq.fill(nA)(640),
            (0 until nA).map(j => Array.fill[Byte](10 + j)((i + 1).toByte))))
        val info = Mp4Codec.parse(Mp4Codec.encode(tracks))
        info.tracks.map(tr => (i, tr.trackId, tr.handler, tr.codec, tr.timescale,
          tr.durationMs, tr.sampleCount, tr.syncSamples.length,
          tr.sampleSizes.sum, tr.sampleTsMs.last, info.durationMs))
      }).toDF("media_id", "track_id", "handler", "codec", "timescale",
        "track_dur_ms", "n_samples", "n_sync", "total_bytes", "last_ts_ms",
        "movie_dur_ms")
        .orderBy(col("media_id"), col("track_id"))
    })
  )

  /** Shared by `text_bm25_topk` and `text_bm25_index_probe` (the stored
    * index must reproduce the one-shot ranking exactly). Mirrors
    * [[graft.operators.text.Bm25]]: idf rounded once per distinct df,
    * tf weight as one BIGINT ratio, per-term contribution quantized
    * half-up — `//` here is Spark's `div` on all-positive operands.
    */
  private val bm25OraclePrefix: String =
    """WITH q(query_id, qtext) AS (VALUES (1, 'spark join table'),
      |    (2, 'window agg stream'), (3, 'hash merge sort batch'),
      |    (4, 'the cat and naïve 😀')),
      |tok AS (SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS toks
      |  FROM documents WHERE text IS NOT NULL),
      |post AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM
      |    (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM tok)
      |  GROUP BY doc_id, dl, term),
      |pd AS (SELECT doc_id, dl, term, tf, COUNT(*) OVER (PARTITION BY term) AS df FROM post),
      |st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len(toks)) AS BIGINT) AS t_tot FROM tok),
      |qt AS (SELECT DISTINCT query_id,
      |    unnest(string_split(lower(trim(regexp_replace(qtext, '[\s\x0b]+', ' ', 'g'))), ' ')) AS term
      |  FROM q),
      |sc AS (SELECT qt.query_id, p.doc_id,
      |    CAST(round(ln((st.n_docs - p.df + 0.5) / (p.df + 0.5) + 1) * 1000000) AS BIGINT) AS idf,
      |    st.t_tot * (10 * p.tf + 3) + 9 * p.dl * st.n_docs AS den,
      |    p.tf FROM pd p JOIN qt USING (term) CROSS JOIN st),
      |ct AS (SELECT query_id, doc_id,
      |    (idf * ((44 * tf * st.t_tot * 1000000 + den) // (2 * den)) + 500000) // 1000000 AS contrib
      |  FROM sc CROSS JOIN st),
      |g AS (SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT) AS score_micros,
      |    CAST(COUNT(*) AS BIGINT) AS n_terms_hit
      |  FROM ct GROUP BY query_id, doc_id)
      |""".stripMargin

  private val bm25OracleFinal: String =
    """SELECT CAST(query_id AS BIGINT) AS query_id, CAST(row_number() OVER w AS INT) AS rank,
      |  doc_id, score_micros, n_terms_hit
      |FROM %s
      |WINDOW w AS (PARTITION BY query_id ORDER BY score_micros DESC, doc_id ASC)
      |QUALIFY row_number() OVER w <= 10
      |ORDER BY query_id, rank""".stripMargin

  private val bm25OracleSql: String = bm25OraclePrefix + bm25OracleFinal.format("g")

  /** The RM3 replay: feedback top-5 from `g`, expansion terms by
    * summed tf·idf over feedback docs (original terms excluded via
    * NOT EXISTS — the Spark side's broadcast anti-join), then the
    * whole BM25 chain again over the expanded term set.
    */
  private val bm25PrfOracleSql: String = bm25OraclePrefix +
    """, fb AS (SELECT query_id, doc_id FROM g
      |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score_micros DESC, doc_id ASC) <= 5),
      |ex AS (SELECT f.query_id, p.term,
      |    SUM(p.tf * CAST(round(ln((st.n_docs - p.df + 0.5) / (p.df + 0.5) + 1) * 1000000) AS BIGINT)) AS w
      |  FROM fb f JOIN pd p ON p.doc_id = f.doc_id CROSS JOIN st
      |  WHERE NOT EXISTS (SELECT 1 FROM qt WHERE qt.query_id = f.query_id AND qt.term = p.term)
      |  GROUP BY f.query_id, p.term),
      |et AS (SELECT query_id, term FROM ex
      |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY w DESC, term ASC) <= 3),
      |qt2 AS (SELECT query_id, term FROM qt UNION ALL SELECT query_id, term FROM et),
      |sc2 AS (SELECT qt2.query_id, p.doc_id,
      |    CAST(round(ln((st.n_docs - p.df + 0.5) / (p.df + 0.5) + 1) * 1000000) AS BIGINT) AS idf,
      |    st.t_tot * (10 * p.tf + 3) + 9 * p.dl * st.n_docs AS den,
      |    p.tf FROM pd p JOIN qt2 ON p.term = qt2.term CROSS JOIN st),
      |ct2 AS (SELECT query_id, doc_id,
      |    (idf * ((44 * tf * st.t_tot * 1000000 + den) // (2 * den)) + 500000) // 1000000 AS contrib
      |  FROM sc2 CROSS JOIN st),
      |g2 AS (SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT) AS score_micros,
      |    CAST(COUNT(*) AS BIGINT) AS n_terms_hit
      |  FROM ct2 GROUP BY query_id, doc_id)
      |""".stripMargin + bm25OracleFinal.format("g2")

  /** PQ train/encode replay shared by `sim_pq_topk` and
    * `sim_pq_topk_refined`: micro-quantized sub-vectors, seed codebook
    * from the 16 lowest ids, one integer-Lloyd round (means rounded to
    * micros via floor(Σ/n + 0.5)), final codes, then ADC distances —
    * every distance a pure-BIGINT Σ(a−b)², so no float parity is
    * involved at any step.
    */
  /** One PQ train/encode chain as tagged CTEs ({tag}sub … {tag}codes):
    * micro sub-vectors, seed codebook from the `ks` lowest ids, one
    * integer-Lloyd round (means rounded to micros via floor(Σ/n+0.5)),
    * final codes — every distance a HUGEINT Σ(a−b)². Generated so the
    * same proven chain serves plain PQ (m=8) and the IVF-PQ coarse
    * level (m=1, sd=dim).
    */
  private def pqTrainCtes(tag: String, m: Int, sd: Int, ks: Int): String =
    s"""${tag}sub AS (SELECT vec_id, s.s AS sub, mv[s.s*$sd+1 : s.s*$sd+$sd] AS sv
       |  FROM e, (SELECT unnest(generate_series(0, ${m - 1})) AS s) s),
       |${tag}seed AS (SELECT sub, CAST(row_number() OVER (PARTITION BY sub ORDER BY vec_id) AS INT) - 1 AS cid,
       |    sv AS cw
       |  FROM ${tag}sub QUALIFY row_number() OVER (PARTITION BY sub ORDER BY vec_id) <= $ks),
       |${tag}d0 AS (SELECT v.vec_id, v.sub, s.cid,
       |    list_sum(list_transform(generate_series(1, $sd),
       |      i -> CAST(v.sv[i] - s.cw[i] AS HUGEINT) * (v.sv[i] - s.cw[i]))) AS d2
       |  FROM ${tag}sub v JOIN ${tag}seed s ON v.sub = s.sub),
       |${tag}a0 AS (SELECT vec_id, sub, cid FROM ${tag}d0
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, cid ASC) = 1),
       |${tag}mm AS (SELECT a.sub, a.cid, u.i AS pos,
       |    CAST(floor(CAST(SUM(v.sv[u.i]) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cm
       |  FROM ${tag}a0 a JOIN ${tag}sub v ON a.vec_id = v.vec_id AND a.sub = v.sub,
       |    LATERAL (SELECT unnest(generate_series(1, $sd)) AS i) u
       |  GROUP BY a.sub, a.cid, u.i),
       |${tag}cl AS (SELECT sub, cid, list(cm ORDER BY pos) AS cw FROM ${tag}mm GROUP BY sub, cid),
       |${tag}cb AS (SELECT s.sub, s.cid, COALESCE(l.cw, s.cw) AS cw
       |  FROM ${tag}seed s LEFT JOIN ${tag}cl l ON s.sub = l.sub AND s.cid = l.cid),
       |${tag}d1 AS (SELECT v.vec_id, v.sub, c.cid,
       |    list_sum(list_transform(generate_series(1, $sd),
       |      i -> CAST(v.sv[i] - c.cw[i] AS HUGEINT) * (v.sv[i] - c.cw[i]))) AS d2
       |  FROM ${tag}sub v JOIN ${tag}cb c ON v.sub = c.sub),
       |${tag}codes AS (SELECT vec_id, sub, cid FROM ${tag}d1
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, cid ASC) = 1)""".stripMargin

  private val pqMicroE: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS mv
      |  FROM embeddings),
      |""".stripMargin

  private val pqOraclePrefix: String = pqMicroE + pqTrainCtes("", 8, 8, 16) +
    """,
      |adc AS (SELECT q.vec_id AS query_id, co.vec_id AS corpus_id,
      |    SUM(list_sum(list_transform(generate_series(1, 8),
      |      i -> CAST(q.sv[i] - c.cw[i] AS HUGEINT) * (q.sv[i] - c.cw[i])))) AS adc_d2
      |  FROM sub q
      |  JOIN codes co ON q.sub = co.sub AND co.vec_id <> q.vec_id
      |  JOIN cb c ON c.sub = co.sub AND c.cid = co.cid
      |  WHERE q.vec_id < 10
      |  GROUP BY q.vec_id, co.vec_id)
      |""".stripMargin

  /** The Morton interleave + bucket rollup shared by both z-order
    * oracles (linear and rank codes differ only in their `q` CTE).
    */
  private val zorderMortonTail: String =
    """,
      |sp AS (SELECT l_orderkey, l_partkey,
      |    ((xq | (xq << 8)) & 16711935) AS x1, ((yq | (yq << 8)) & 16711935) AS y1
      |  FROM q),
      |sp2 AS (SELECT l_orderkey, l_partkey,
      |    ((x1 | (x1 << 4)) & 252645135) AS x2, ((y1 | (y1 << 4)) & 252645135) AS y2 FROM sp),
      |sp3 AS (SELECT l_orderkey, l_partkey,
      |    ((x2 | (x2 << 2)) & 858993459) AS x3, ((y2 | (y2 << 2)) & 858993459) AS y3 FROM sp2),
      |z AS (SELECT l_orderkey, l_partkey,
      |    (((x3 | (x3 << 1)) & 1431655765) | (((y3 | (y3 << 1)) & 1431655765) << 1)) AS zv
      |  FROM sp3)
      |SELECT (zv >> 14) AS bucket, COUNT(*) AS n_rows,
      |  MIN(l_orderkey) AS min_x, MAX(l_orderkey) AS max_x,
      |  MIN(l_partkey) AS min_y, MAX(l_partkey) AS max_y
      |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin

  /** The IVF16,PQ8 search replayed in SQL — shared verbatim by
    * `sim_ivf_pq_topk` (one-shot) and `sim_ivfpq_index_probe` (stored
    * index): the persisted layout must reproduce the one-shot plan's
    * results exactly, so both share ONE hash oracle.
    */
  private lazy val ivfPqOracleSql: String =
    pqMicroE + pqTrainCtes("c", 1, 64, 16) + ",\n" +
      pqTrainCtes("f", 8, 8, 16) +
      """,
        |probes AS (SELECT vec_id AS query_id, cid AS lid FROM cd1
        |  WHERE vec_id < 10
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) <= 4),
        |lists AS (SELECT vec_id, cid AS lid FROM ccodes),
        |adc2 AS (SELECT p.query_id, l.vec_id AS corpus_id,
        |    SUM(list_sum(list_transform(generate_series(1, 8),
        |      i -> CAST(q.sv[i] - c.cw[i] AS HUGEINT) * (q.sv[i] - c.cw[i])))) AS adc_d2
        |  FROM probes p
        |  JOIN lists l ON l.lid = p.lid AND l.vec_id <> p.query_id
        |  JOIN fcodes co ON co.vec_id = l.vec_id
        |  JOIN fcb c ON c.sub = co.sub AND c.cid = co.cid
        |  JOIN fsub q ON q.vec_id = p.query_id AND q.sub = co.sub
        |  GROUP BY p.query_id, l.vec_id)
        |SELECT query_id, CAST(row_number() OVER w AS INT) AS rank, corpus_id,
        |  CAST(CAST(adc_d2 AS VARCHAR) AS DOUBLE) AS adc_d2
        |FROM adc2
        |WINDOW w AS (PARTITION BY query_id ORDER BY adc_d2 ASC, corpus_id ASC)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY query_id, rank""".stripMargin

  /** The BPE training replay as `merges` chained CTE stages (generated
    * — each stage recounts pairs, takes the (count DESC, l, r) argmax,
    * and replays the same non-overlapping `replace`). `LEFT JOIN b ON
    * TRUE` carries exhausted rounds through unchanged, mirroring the
    * Spark loop's early stop.
    */
  /** The shared BPE chain: tok (per-doc token lists), wc (word
    * counts), then `merges` staged rounds — each recounting pairs,
    * taking the (count DESC, l, r) argmax, and replaying the same
    * non-overlapping replace. The WORD rides through every stage so
    * the final stage doubles as the trained word→symbols map (the
    * encode oracle joins it back to document positions).
    */
  private def bpeChain(merges: Int): String = {
    val head =
      """WITH tok AS (SELECT doc_id,
        |    string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |wc AS (SELECT w, COUNT(*) AS cnt FROM (SELECT unnest(toks) AS w FROM tok) GROUP BY w),
        |w0 AS (SELECT w,
        |    ' ' || COALESCE(array_to_string(regexp_extract_all(w, '(?s).'), '  '), '') || ' ' AS seq,
        |    cnt FROM wc)""".stripMargin
    // COALESCE: DuckDB's array_to_string(EMPTY) is NULL (Spark's
    // array_join is '') — the ''-word's seq must stay '  ', not NULL
    // (encode fuzz catch, seed 43)
    val stages = (1 to merges).map { k =>
      s""",
         |p$k AS (SELECT s.t[u.i] AS l, s.t[u.i + 1] AS r, SUM(s.cnt) AS c
         |  FROM (SELECT string_split(trim(seq), '  ') AS t, cnt FROM w${k - 1}) s,
         |    LATERAL (SELECT unnest(generate_series(1, len(s.t) - 1)) AS i) u
         |  GROUP BY l, r),
         |b$k AS (SELECT l, r, c FROM p$k ORDER BY c DESC, l ASC, r ASC LIMIT 1),
         |w$k AS (SELECT s.w, CASE WHEN b.l IS NULL THEN s.seq
         |    ELSE replace(s.seq, ' ' || b.l || '  ' || b.r || ' ', ' ' || b.l || b.r || ' ') END AS seq,
         |    s.cnt
         |  FROM w${k - 1} s LEFT JOIN b$k b ON TRUE)""".stripMargin
    }.mkString
    head + stages
  }

  private def bpeTrainOracleSql(merges: Int): String = {
    val union = (1 to merges).map { k =>
      s"SELECT $k AS step, l AS lhs, r AS rhs, l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM b$k"
    }.mkString("\nUNION ALL\n")
    s"${bpeChain(merges)}\nSELECT CAST(step AS INT) AS step, lhs, rhs, merged, pair_count FROM (\n$union\n) ORDER BY step"
  }

  /** Encode oracle: document word positions join the final stage's
    * word→symbols map; empty words keep their single ''-symbol.
    */
  private def bpeEncodeOracleSql(merges: Int): String =
    bpeChain(merges) +
      s""",
         |dw AS (SELECT doc_id, CAST(u.i AS INT) AS wpos, toks[u.i + 1] AS w
         |  FROM tok, LATERAL (SELECT unnest(range(len(toks))) AS i) u
         |  WHERE doc_id < 50)
         |SELECT d.doc_id, d.wpos, array_to_string(string_split(trim(v.seq), '  '), ' ') AS sym_text,
         |  CAST(len(string_split(trim(v.seq), '  ')) AS INT) AS n_symbols
         |FROM dw d JOIN w$merges v ON v.w = d.w
         |ORDER BY d.doc_id, d.wpos""".stripMargin

  /** The MMR greedy replay: exact HUGEINT pool + pairwise distances,
    * then `k−1` unrolled argmax stages (min-dist-to-selected minus
    * dist-to-query, ties on candidate id), mirroring the Spark side's
    * unrolled dataframe stages. Final distances surface via the
    * VARCHAR-mediated double cast (same 2^53 rounding trap as PQ).
    */
  /** HUGEINT micro-L2 between two `mv` list columns. */
  private def sqlD2(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, 64), i -> CAST($a.mv[i] - $b.mv[i] AS HUGEINT) * ($a.mv[i] - $b.mv[i])))"

  /** The greedy MMR stages (s1..sel`k`) over existing CTEs
    * `pool(query_id, corpus_id, d2q)` and `pw(query_id, cand, sel,
    * d2p)` — shared by `sim_mmr_topk` and `pipeline_rag`.
    */
  private def mmrStagesSql(k: Int): String = {
    val s1 =
      """,
        |s1 AS (SELECT query_id, corpus_id, d2q, 1 AS rank FROM pool
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2q ASC, corpus_id ASC) = 1),
        |sel1 AS (SELECT * FROM s1)""".stripMargin
    val rest = (2 to k).map { step =>
      s""",
         |s$step AS (SELECT query_id, corpus_id, d2q, $step AS rank FROM (
         |    SELECT p.query_id, p.corpus_id, p.d2q, MIN(pw.d2p) - p.d2q AS mmr
         |    FROM pool p
         |    JOIN pw ON pw.query_id = p.query_id AND pw.cand = p.corpus_id
         |    JOIN sel${step - 1} s ON s.query_id = pw.query_id AND s.corpus_id = pw.sel
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${step - 1} x
         |      WHERE x.query_id = p.query_id AND x.corpus_id = p.corpus_id)
         |    GROUP BY p.query_id, p.corpus_id, p.d2q)
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY mmr DESC, corpus_id ASC) = 1),
         |sel$step AS (SELECT * FROM sel${step - 1} UNION ALL SELECT * FROM s$step)""".stripMargin
    }.mkString
    s1 + rest
  }

  private def mmrOracleSql(k: Int, pool: Int): String = {
    val d2 = sqlD2 _
    val head =
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS mv
         |  FROM embeddings),
         |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, ${d2("q", "c")} AS d2q
         |  FROM e q JOIN e c ON c.vec_id <> q.vec_id WHERE q.vec_id < 10),
         |pool AS (SELECT query_id, corpus_id, d2q FROM sc
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2q ASC, corpus_id ASC) <= $pool),
         |pw AS (SELECT a.query_id, a.corpus_id AS cand, b.corpus_id AS sel, ${d2("ea", "eb")} AS d2p
         |  FROM pool a JOIN pool b ON a.query_id = b.query_id AND a.corpus_id <> b.corpus_id
         |  JOIN e ea ON ea.vec_id = a.corpus_id
         |  JOIN e eb ON eb.vec_id = b.corpus_id)""".stripMargin
    s"""$head${mmrStagesSql(k)}
       |SELECT query_id, CAST(rank AS INT) AS rank, corpus_id,
       |  CAST(CAST(d2q AS VARCHAR) AS DOUBLE) AS d2
       |FROM sel$k ORDER BY query_id, rank""".stripMargin
  }

  /** The hybrid-retrieval replay through the per-(query, item) rank
    * tables (tp = BM25 pool, vp = cosine pool), parameterized by the
    * query-id cutoff so `pipeline_rag` reuses the same proven chain.
    */
  private def hybridOraclePrefix(maxQ: Int): String =
    raw"""WITH tok AS (SELECT doc_id,
        |    string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |post AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM
        |    (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM tok)
        |  GROUP BY doc_id, dl, term),
        |pd AS (SELECT doc_id, dl, term, tf, COUNT(*) OVER (PARTITION BY term) AS df FROM post),
        |st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len(toks)) AS BIGINT) AS t_tot FROM tok),
        |qt AS (SELECT DISTINCT doc_id AS query_id, unnest(toks) AS term FROM tok WHERE doc_id < $maxQ),
        |bsc AS (SELECT qt.query_id, p.doc_id,
        |    CAST(round(ln((st.n_docs - p.df + 0.5) / (p.df + 0.5) + 1) * 1000000) AS BIGINT) AS idf,
        |    st.t_tot * (10 * p.tf + 3) + 9 * p.dl * st.n_docs AS den,
        |    p.tf FROM pd p JOIN qt USING (term) CROSS JOIN st),
        |bct AS (SELECT query_id, doc_id,
        |    (idf * ((44 * tf * st.t_tot * 1000000 + den) // (2 * den)) + 500000) // 1000000 AS contrib
        |  FROM bsc CROSS JOIN st),
        |bg AS (SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT) AS score_micros
        |  FROM bct WHERE doc_id <> query_id GROUP BY query_id, doc_id),
        |tp AS (SELECT query_id, doc_id AS corpus_id, row_number() OVER
        |    (PARTITION BY query_id ORDER BY score_micros DESC, doc_id ASC) AS r_text
        |  FROM bg QUALIFY r_text <= 20),
        |q AS (SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
        |    list_aggregate(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS qn2
        |  FROM embeddings WHERE vec_id < $maxQ),
        |c AS (SELECT vec_id AS corpus_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv,
        |    list_aggregate(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS cn2
        |  FROM embeddings),
        |vs AS (SELECT query_id, corpus_id,
        |    CASE WHEN qn2 = 0 OR cn2 = 0 THEN 0.0
        |         ELSE list_cosine_similarity(cv, qv) END AS cos
        |  FROM q, c WHERE corpus_id <> query_id),
        |vp AS (SELECT query_id, corpus_id, row_number() OVER
        |    (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC) AS r_vec
        |  FROM vs QUALIFY r_vec <= 20),
      |""".stripMargin

  private val hybridOracleFinal: String =
    """f AS (SELECT COALESCE(tp.query_id, vp.query_id) AS query_id,
      |    COALESCE(tp.corpus_id, vp.corpus_id) AS corpus_id,
      |    COALESCE(r_text, 0) AS r_text, COALESCE(r_vec, 0) AS r_vec
      |  FROM tp FULL OUTER JOIN vp
      |    ON tp.query_id = vp.query_id AND tp.corpus_id = vp.corpus_id),
      |sc2 AS (SELECT query_id, corpus_id, r_text, r_vec,
      |    (CASE WHEN r_text > 0 THEN 1000000 // (60 + r_text) ELSE 0 END) +
      |    (CASE WHEN r_vec > 0 THEN 1000000 // (60 + r_vec) ELSE 0 END) AS rrf_micros
      |  FROM f)
      |""".stripMargin

  private val hybridOracleSelect: String =
    """SELECT query_id, CAST(row_number() OVER w AS INT) AS rank, corpus_id,
      |  CAST(rrf_micros AS BIGINT) AS rrf_micros,
      |  CAST(r_text AS BIGINT) AS r_text, CAST(r_vec AS BIGINT) AS r_vec
      |FROM sc2
      |WINDOW w AS (PARTITION BY query_id ORDER BY rrf_micros DESC, corpus_id ASC)
      |QUALIFY row_number() OVER w <= 10
      |ORDER BY query_id, rank""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "tokenizer_bpe_train" -> bpeTrainOracleSql(8),

    // the driver-side scale path must reproduce the distributed merges
    "tokenizer_bpe_fast" -> bpeTrainOracleSql(8),

    "tokenizer_bpe_encode" -> bpeEncodeOracleSql(8),

    "sim_mmr_topk" -> mmrOracleSql(5, 20),

    "text_pmi_collocations" ->
      """WITH tok AS (SELECT
        |    string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |uni AS (SELECT w, COUNT(*) AS c FROM (SELECT unnest(toks) AS w FROM tok) GROUP BY w),
        |t1 AS (SELECT CAST(SUM(c) AS BIGINT) AS t_uni FROM uni),
        |t2 AS (SELECT CAST(SUM(GREATEST(len(toks) - 1, 0)) AS BIGINT) AS t_bi FROM tok),
        |bg AS (SELECT bg, COUNT(*) AS c12 FROM (SELECT
        |      unnest(list_transform(generate_series(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM tok)
        |  GROUP BY bg HAVING COUNT(*) >= 5),
        |sp AS (SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2, c12 FROM bg),
        |p AS (SELECT sp.w1, sp.w2, sp.c12,
        |    CAST(round(ln(CAST(CAST(CAST(sp.c12 AS HUGEINT) * t1.t_uni * t1.t_uni AS VARCHAR) AS DOUBLE) /
        |                  CAST(CAST(CAST(t2.t_bi AS HUGEINT) * u1.c * u2.c AS VARCHAR) AS DOUBLE)) * 1000000) AS BIGINT) AS pmi_micros
        |  FROM sp JOIN uni u1 ON u1.w = sp.w1 JOIN uni u2 ON u2.w = sp.w2
        |  CROSS JOIN t1 CROSS JOIN t2)
        |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, pmi_micros
        |FROM p ORDER BY pmi_micros DESC, w1, w2 LIMIT 50""".stripMargin,

    "q15_above_avg" ->
      """WITH r AS (SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,4))) AS rev
        |  FROM lineitem GROUP BY l_suppkey),
        |t AS (SELECT SUM(rev) AS tot, COUNT(*) AS cnt FROM r)
        |SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS revenue
        |FROM r JOIN supplier ON s_suppkey = l_suppkey CROSS JOIN t
        |WHERE rev * cnt > tot ORDER BY s_suppkey""".stripMargin,

    "q16_attribution" ->
      """WITH e AS (SELECT event_id, user_id, ts, event_type, value FROM events
        |  WHERE ts IS NOT NULL),
        |a AS (SELECT *,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM e)
        |SELECT COALESCE(touch, 'direct') AS channel,
        |  COUNT(*) AS n_purchases,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY channel ORDER BY channel""".stripMargin,

    "stats_active_users" ->
      """WITH p AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        |  WHERE ts IS NOT NULL),
        |d AS (SELECT DISTINCT day FROM p),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM p GROUP BY day),
        |wau AS (SELECT d.day, COUNT(DISTINCT p.user_id) AS wau
        |  FROM d JOIN p ON p.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY d.day)
        |SELECT strftime(dau.day, '%Y-%m-%d') AS day,
        |  CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau
        |FROM dau JOIN wau ON dau.day = wau.day
        |ORDER BY day""".stripMargin,

    // strlen = BYTE length in DuckDB, matching Spark's octet_length
    "layout_compaction_plan" ->
      """WITH f AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) * 64 + SUM(COALESCE(strlen(props), 0)) AS BIGINT) AS bytes
        |  FROM events WHERE ts IS NOT NULL GROUP BY day),
        |p AS (SELECT day, bytes,
        |    COALESCE(SUM(bytes) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        |  FROM f)
        |SELECT day, bytes AS file_bytes, CAST(prior // 65536 AS BIGINT) AS bucket
        |FROM p ORDER BY day""".stripMargin,

    // linear (min,max) 10-bit quantization, 5-step magic-mask Morton
    // interleave, bucket = top 6 z bits. The subtraction runs EXACTLY
    // in HUGEINT and reaches double through the varchar-mediated cast
    // (DuckDB's direct HUGEINT→DOUBLE is not correctly rounded),
    // mirroring the engine's DECIMAL(38,0)-subtract-then-convert — the
    // two sides stay bit-identical over the whole long domain
    "layout_zorder" ->
      ("""WITH s AS (SELECT MIN(l_orderkey) AS mn_x, MAX(l_orderkey) AS mx_x,
        |    MIN(l_partkey) AS mn_y, MAX(l_partkey) AS mx_y FROM lineitem),
        |q AS (SELECT l_orderkey, l_partkey,
        |    CASE WHEN mx_x = mn_x THEN 0
        |         ELSE CAST(floor(CAST(CAST(CAST(l_orderkey AS HUGEINT) - mn_x AS VARCHAR) AS DOUBLE) * 1024.0 /
        |              (CAST(CAST(CAST(mx_x AS HUGEINT) - mn_x AS VARCHAR) AS DOUBLE) + 1.0)) AS BIGINT) END AS xq,
        |    CASE WHEN mx_y = mn_y THEN 0
        |         ELSE CAST(floor(CAST(CAST(CAST(l_partkey AS HUGEINT) - mn_y AS VARCHAR) AS DOUBLE) * 1024.0 /
        |              (CAST(CAST(CAST(mx_y AS HUGEINT) - mn_y AS VARCHAR) AS DOUBLE) + 1.0)) AS BIGINT) END AS yq
        |  FROM lineitem CROSS JOIN s)""".stripMargin + zorderMortonTail),

    // 3-way magic-mask interleave (0x030000FF/0x0300F00F/0x030C30C3/
    // 0x09249249), same exact-subtract quantization as layout_zorder
    "layout_zorder3" ->
      """WITH s AS (SELECT MIN(l_orderkey) AS mn_x, MAX(l_orderkey) AS mx_x,
        |    MIN(l_partkey) AS mn_y, MAX(l_partkey) AS mx_y,
        |    MIN(l_suppkey) AS mn_z, MAX(l_suppkey) AS mx_z FROM lineitem),
        |q AS (SELECT l_orderkey, l_partkey, l_suppkey,
        |    CASE WHEN mx_x = mn_x THEN 0
        |         ELSE CAST(floor(CAST(CAST(CAST(l_orderkey AS HUGEINT) - mn_x AS VARCHAR) AS DOUBLE) * 1024.0 /
        |              (CAST(CAST(CAST(mx_x AS HUGEINT) - mn_x AS VARCHAR) AS DOUBLE) + 1.0)) AS BIGINT) END AS xq,
        |    CASE WHEN mx_y = mn_y THEN 0
        |         ELSE CAST(floor(CAST(CAST(CAST(l_partkey AS HUGEINT) - mn_y AS VARCHAR) AS DOUBLE) * 1024.0 /
        |              (CAST(CAST(CAST(mx_y AS HUGEINT) - mn_y AS VARCHAR) AS DOUBLE) + 1.0)) AS BIGINT) END AS yq,
        |    CASE WHEN mx_z = mn_z THEN 0
        |         ELSE CAST(floor(CAST(CAST(CAST(l_suppkey AS HUGEINT) - mn_z AS VARCHAR) AS DOUBLE) * 1024.0 /
        |              (CAST(CAST(CAST(mx_z AS HUGEINT) - mn_z AS VARCHAR) AS DOUBLE) + 1.0)) AS BIGINT) END AS zq
        |  FROM lineitem CROSS JOIN s),
        |s1 AS (SELECT l_orderkey, l_partkey, l_suppkey,
        |    ((xq | (xq << 16)) & 50331903) AS x1, ((yq | (yq << 16)) & 50331903) AS y1,
        |    ((zq | (zq << 16)) & 50331903) AS z1 FROM q),
        |s2 AS (SELECT l_orderkey, l_partkey, l_suppkey,
        |    ((x1 | (x1 << 8)) & 50393103) AS x2, ((y1 | (y1 << 8)) & 50393103) AS y2,
        |    ((z1 | (z1 << 8)) & 50393103) AS z2 FROM s1),
        |s3 AS (SELECT l_orderkey, l_partkey, l_suppkey,
        |    ((x2 | (x2 << 4)) & 51130563) AS x3, ((y2 | (y2 << 4)) & 51130563) AS y3,
        |    ((z2 | (z2 << 4)) & 51130563) AS z3 FROM s2),
        |z AS (SELECT l_orderkey, l_partkey, l_suppkey,
        |    (((x3 | (x3 << 2)) & 153391689)
        |     | (((y3 | (y3 << 2)) & 153391689) << 1)
        |     | (((z3 | (z3 << 2)) & 153391689) << 2)) AS zv
        |  FROM s3)
        |SELECT (zv >> 24) AS bucket, COUNT(*) AS n_rows,
        |  MIN(l_orderkey) AS min_x, MAX(l_orderkey) AS max_x,
        |  MIN(l_partkey) AS min_y, MAX(l_partkey) AS max_y,
        |  MIN(l_suppkey) AS min_z, MAX(l_suppkey) AS max_z
        |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin,

    // string ranks via the same cumulative-count window (varchar
    // comparison is raw bytes on both engines), numeric ranks as in
    // layout_zorder_rank; bucket = top 4 of 20 interleaved bits
    "layout_zorder_source" ->
      """WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS n_chars FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |kn AS (SELECT source AS v, COUNT(*) AS n FROM d GROUP BY 1),
        |kc AS (SELECT v, CAST(COALESCE(SUM(n) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 1024
        |    // SUM(n) OVER () AS BIGINT) AS code FROM kn),
        |nn AS (SELECT n_chars AS v, COUNT(*) AS n FROM d GROUP BY 1),
        |nc AS (SELECT v, CAST(COALESCE(SUM(n) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 1024
        |    // SUM(n) OVER () AS BIGINT) AS code FROM nn),
        |q AS (SELECT d.source, d.n_chars, kc.code AS xq, nc.code AS yq
        |  FROM d JOIN kc ON d.source = kc.v JOIN nc ON d.n_chars = nc.v),
        |sp AS (SELECT source, n_chars,
        |    ((xq | (xq << 8)) & 16711935) AS x1, ((yq | (yq << 8)) & 16711935) AS y1
        |  FROM q),
        |sp2 AS (SELECT source, n_chars,
        |    ((x1 | (x1 << 4)) & 252645135) AS x2, ((y1 | (y1 << 4)) & 252645135) AS y2 FROM sp),
        |sp3 AS (SELECT source, n_chars,
        |    ((x2 | (x2 << 2)) & 858993459) AS x3, ((y2 | (y2 << 2)) & 858993459) AS y3 FROM sp2),
        |z AS (SELECT source, n_chars,
        |    (((x3 | (x3 << 1)) & 1431655765) | (((y3 | (y3 << 1)) & 1431655765) << 1)) AS zv
        |  FROM sp3)
        |SELECT (zv >> 16) AS bucket, COUNT(*) AS n_rows,
        |  MIN(source) AS min_key, MAX(source) AS max_key,
        |  MIN(n_chars) AS min_num, MAX(n_chars) AS max_num
        |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin,

    // quantile-rank codes: cumulative distinct-value counts, one
    // positive integer division per value (div == // on positive
    // operands), same Morton tail — balanced buckets under ANY skew
    "layout_zorder_rank" ->
      ("""WITH xn AS (SELECT CAST(l_orderkey AS BIGINT) AS v, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1),
        |xc AS (SELECT v, CAST(COALESCE(SUM(n) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 1024
        |    // SUM(n) OVER () AS BIGINT) AS code FROM xn),
        |yn AS (SELECT CAST(l_partkey AS BIGINT) AS v, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1),
        |yc AS (SELECT v, CAST(COALESCE(SUM(n) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 1024
        |    // SUM(n) OVER () AS BIGINT) AS code FROM yn),
        |q AS (SELECT l.l_orderkey, l.l_partkey, xc.code AS xq, yc.code AS yq
        |  FROM lineitem l
        |  JOIN xc ON CAST(l.l_orderkey AS BIGINT) = xc.v
        |  JOIN yc ON CAST(l.l_partkey AS BIGINT) = yc.v)""".stripMargin + zorderMortonTail),

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS sum_disc_price,
        |COUNT(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q2_join_enrich" ->
      """SELECT c_mktsegment, n_name, COUNT(*) AS n_lines,
        |CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the salted join IS the plain join — the oracle proves it
    "q7_salted_join" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        |CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // RANGE frame over epoch days: 6-day lookback by VALUE, so sparse
    // activity windows span calendar days, not row counts
    "q14_moving_avg" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, value FROM events
        |  WHERE ts IS NOT NULL AND event_type = 'purchase'),
        |d AS (SELECT user_id, day, SUM(CAST(value AS DECIMAL(18,6))) AS day_rev,
        |    date_diff('day', DATE '1970-01-01', day) AS epoch_day FROM e GROUP BY 1, 2)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(day_rev AS DOUBLE) AS day_rev,
        |  CAST(SUM(day_rev) OVER w AS DOUBLE) AS rev_7d,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_days_7d
        |FROM d
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_day
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin,

    "q13_deciles" ->
      """WITH r AS (SELECT c.c_nationkey, o.o_custkey,
        |    SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS revenue
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |d AS (SELECT c_nationkey, revenue,
        |    ntile(10) OVER (PARTITION BY c_nationkey ORDER BY revenue, o_custkey) AS decile
        |  FROM r)
        |SELECT c_nationkey, CAST(decile AS INT) AS decile,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(revenue) AS DOUBLE) AS total_revenue,
        |  CAST(MIN(revenue) AS DOUBLE) AS min_revenue,
        |  CAST(MAX(revenue) AS DOUBLE) AS max_revenue
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // DECIMAL day sums (order-free), carry-forward via IGNORE NULLS
    // last_value over the same key exchange
    "q12_gapfill" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, value FROM events
        |  WHERE ts IS NOT NULL AND event_type = 'purchase'
        |    AND CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-30'),
        |a AS (SELECT user_id, day, SUM(CAST(value AS DECIMAL(18,6))) AS dec_v
        |  FROM e GROUP BY 1, 2),
        |days AS (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
        |    INTERVAL 1 DAY)) AS day),
        |spine AS (SELECT u.user_id, CAST(d.day AS DATE) AS day
        |  FROM (SELECT DISTINCT user_id FROM events
        |        WHERE ts IS NOT NULL AND event_type = 'purchase') u CROSS JOIN days d),
        |j AS (SELECT s.user_id, s.day, a.dec_v,
        |    last_value(a.dec_v IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_dec
        |  FROM spine s LEFT JOIN a ON a.user_id = s.user_id AND a.day = s.day)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(dec_v AS DOUBLE) AS day_value, CAST(filled_dec AS DOUBLE) AS filled_value,
        |  (dec_v IS NULL AND filled_dec IS NOT NULL) AS is_filled
        |FROM j ORDER BY user_id, day""".stripMargin,

    // every block reduced to a scalar subquery over the proven SQL
    "pipeline_events" ->
      """WITH e AS (SELECT user_id, event_type, ts, epoch_ms(ts) AS ts_ms FROM events
        |  WHERE ts IS NOT NULL),
        |m AS (SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |    > INTERVAL '8 hours' THEN 1 ELSE 0 END AS brk FROM e),
        |sids AS (SELECT user_id, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m),
        |v AS (SELECT user_id, MIN(ts_ms) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts_ms) AS t_click FROM e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts_ms > v.t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts_ms) AS t_purchase FROM e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts_ms > c.t_click GROUP BY e.user_id),
        |d AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
        |    COUNT(*) AS y FROM e GROUP BY 1),
        |g AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM d)
        |SELECT
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_events,
        |  (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM e) AS n_users,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
        |    (SELECT DISTINCT user_id, sid FROM sids)) AS n_sessions,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_viewers,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_clickers,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_converted,
        |  (SELECT CASE WHEN n >= 2 AND n * sxx <> sx * sx
        |    THEN CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0) AS BIGINT) END FROM g)
        |    AS trend_micros_per_day""".stripMargin,

    // strict sequential semantics: each step's min timestamp must be
    // strictly after the previous step's min — not "did all three ever"
    "q10_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms
        |  FROM events WHERE ts IS NOT NULL),
        |v AS (SELECT user_id, MIN(ts_ms) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts_ms) AS t_click FROM e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts_ms > v.t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts_ms) AS t_purchase FROM e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts_ms > c.t_click GROUP BY e.user_id)
        |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY v.user_id""".stripMargin,

    "q11_cohorts" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE ts IS NOT NULL),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        |  CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        |FROM e JOIN f USING (user_id)
        |WHERE date_diff('day', cohort_day, day) <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // TRY_CAST, not ::JSON — a malformed props row must null out like
    // Spark's from_json, not abort the whole query (events fuzz catch)
    "q9_json_props" ->
      """WITH p AS (SELECT event_type, CAST(TRY_CAST(props AS JSON) ->> 'k' AS BIGINT) AS k FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(k) AS BIGINT) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    // plain overlap predicate join — the bucketed exactly-once plan
    // must reproduce it pair-for-pair
    "q8_overlap_join" ->
      """WITH e AS (SELECT user_id, event_type, ts, strftime(ts, '%Y-%m-%d') AS day
        |  FROM events WHERE ts IS NOT NULL),
        |c AS (SELECT user_id, day AS c_day, epoch_ms(MIN(ts)) AS c_lo,
        |    epoch_ms(MAX(ts)) + 1 AS c_hi, COUNT(*) AS c_n
        |  FROM e WHERE event_type = 'click' GROUP BY user_id, day),
        |p AS (SELECT user_id, day AS p_day, epoch_ms(MIN(ts)) AS p_lo,
        |    epoch_ms(MAX(ts)) + 1 AS p_hi, COUNT(*) AS p_n
        |  FROM e WHERE event_type = 'purchase' GROUP BY user_id, day)
        |SELECT user_id, c_day, p_day, c_lo, c_hi, p_lo, p_hi,
        |  CAST(c_n AS BIGINT) AS c_n, CAST(p_n AS BIGINT) AS p_n,
        |  LEAST(c_hi, p_hi) - GREATEST(c_lo, p_lo) AS overlap_ms
        |FROM c JOIN p USING (user_id)
        |WHERE c_lo < p_hi AND p_lo < c_hi
        |ORDER BY user_id, c_lo, p_lo""".stripMargin,

    "q3_window_topn" ->
      """SELECT o_custkey, CAST(row_number() OVER w AS INT) AS rank, o_orderkey, o_totalprice
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |QUALIFY row_number() OVER w <= 3
        |ORDER BY o_custkey, rank""".stripMargin,

    "q4_setops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
        |sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
        |SELECT 'except' AS tag, (SELECT COUNT(*) FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)) AS n
        |UNION ALL
        |SELECT 'intersect', (SELECT COUNT(*) FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn))
        |UNION ALL
        |SELECT 'union', (SELECT COUNT(*) FROM (SELECT nk FROM cn UNION SELECT nk FROM sn))
        |ORDER BY tag""".stripMargin,

    "q5_asof_join" ->
      // inner-ASOF on non-null left times, then left-join back on the
      // unique event_id: DuckDB's native ASOF matches a NULL-ts left
      // row to a right row, while the operator's contract (and Spark's
      // null-safe window sort) leaves it unmatched — this shape pins
      // "null left time matches nothing" in the oracle itself
      """WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey < 100
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1),
        |nn AS (SELECT e.event_id AS eid, o.o_orderkey, o.o_totalprice
        |  FROM events e ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |  WHERE e.ts IS NOT NULL)
        |SELECT e.event_id, epoch_ms(e.ts) AS ts_ms, e.user_id, nn.o_orderkey, nn.o_totalprice
        |FROM events e LEFT JOIN nn ON e.event_id = nn.eid
        |ORDER BY e.event_id""".stripMargin,

    "o12_salted_agg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, MAX(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q5b_asof_forward" ->
      // same inner-ASOF + join-back shape as q5_asof_join, for the same
      // NULL-left-time reason
      """WITH s AS (SELECT user_id AS su, ts AS sts, event_id AS next_signup_id
        |  FROM events WHERE event_type = 'signup'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
        |nn AS (SELECT e.event_id AS eid, s.next_signup_id
        |  FROM events e ASOF JOIN s ON e.user_id = s.su AND e.ts <= s.sts
        |  WHERE e.ts IS NOT NULL)
        |SELECT e.event_id, epoch_ms(e.ts) AS ts_ms, e.user_id, nn.next_signup_id
        |FROM events e LEFT JOIN nn ON e.event_id = nn.eid
        |ORDER BY e.event_id""".stripMargin,

    "q6_range_join" ->
      """WITH b AS (SELECT n_name AS band, CAST(n_nationkey*n_nationkey*600 AS DOUBLE) AS lo,
        |  CAST((n_nationkey+1)*(n_nationkey+1)*600 AS DOUBLE) AS hi FROM nation)
        |SELECT o.o_orderkey, o.o_totalprice, b.band
        |FROM orders o JOIN b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        |ORDER BY o.o_orderkey""".stripMargin,

    "s3_keyset_chunks" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber",

    "s4_offset_chunks" ->
      """WITH n AS (SELECT COUNT(*) AS total FROM lineitem),
        |c AS (SELECT CAST(GREATEST(1, CEIL(total / 5000.0)) AS BIGINT) AS k FROM n)
        |SELECT u.i AS chunk_idx,
        |  'SELECT * FROM lineitem LIMIT 5000 OFFSET ' || (u.i * 5000) AS page_sql
        |FROM c, LATERAL (SELECT unnest(generate_series(0, k - 1)) AS i) u
        |ORDER BY chunk_idx""".stripMargin,

    "s2_tx_assembly" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY event_id) > 43200000
        |         THEN 1 ELSE 0 END AS new_tx
        |  FROM events),
        |grp AS (
        |  SELECT user_id, event_id, ts,
        |    SUM(new_tx) OVER (PARTITION BY user_id ORDER BY event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tx_index
        |  FROM flagged)
        |SELECT user_id, CAST(tx_index AS BIGINT) AS tx_index, MIN(event_id) AS tx_first_seq,
        |  MAX(event_id) AS tx_last_seq, COUNT(*) AS n_events,
        |  MIN(epoch_ms(ts)) AS tx_start_ms, MAX(epoch_ms(ts)) AS tx_end_ms
        |FROM grp GROUP BY user_id, tx_index ORDER BY user_id, tx_index""".stripMargin,

    "f1_row_filter" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_totalprice > 150000.0 AND upper(o_orderstatus) <> 'P' AND length(o_orderpriority) >= 5
        |ORDER BY o_orderkey""".stripMargin,

    "f2_scalar_funcs" ->
      """SELECT o_orderkey, pow(o_custkey, 2) AS f_pow, sqrt(o_totalprice) AS f_sqrt,
        |replace(o_orderpriority, '-', '_') AS f_replace, upper(o_orderstatus) AS f_upper,
        |lower(o_orderpriority) AS f_lower, CAST(length(o_orderpriority) AS INT) AS f_charlen,
        |epoch_ms(o_orderdate) AS f_unixms
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f3_route_filter" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE lower(source) NOT IN ('mysql','sys','information_schema','performance_schema')
        |  AND (regexp_matches(source, '^src(\d)$') OR source = 'src12')
        |  AND source <> 'src3'
        |ORDER BY doc_id""".stripMargin,

    "f4_op_filter" ->
      s"""SELECT event_id, user_id, $opCaseSql AS op FROM events
         |WHERE $opCaseSql <> 'd' ORDER BY event_id""".stripMargin,

    "f6_column_map" ->
      "SELECT c_custkey AS id, c_name AS name, c_acctbal AS balance FROM customer ORDER BY id",

    "f7_rename_regex" ->
      """SELECT doc_id, regexp_replace(source, '^src(\d+)$', 'source_\1') AS db,
        |regexp_replace(lang, '^(.*)$', 't_\1') AS "table"
        |FROM documents ORDER BY doc_id""".stripMargin,

    "f10_idempotence" ->
      "SELECT event_id, user_id FROM events WHERE event_id % 7 <> 0 ORDER BY event_id",

    "c_type_matrix" ->
      """SELECT o_orderkey,
        |(CASE WHEN o_orderkey % 2 = 0 THEN -1 ELSE 1 END) *
        |  ((hour(o_orderdate)*3600 + minute(o_orderdate)*60 + CAST(floor(second(o_orderdate)) AS BIGINT))*1000000
        |   + (o_orderkey % 10)*100000) AS time_us,
        |epoch_ms(o_orderdate) AS dt_millis,
        |CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INT) AS epoch_days,
        |strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts,
        |list_extract(['A','B','C'], CAST(o_orderkey % 3 + 1 AS INT)) AS enum_label,
        |concat_ws(',',
        |  CASE WHEN (o_orderkey % 8) & 1 <> 0 THEN 'r' END,
        |  CASE WHEN (o_orderkey % 8) & 2 <> 0 THEN 'w' END,
        |  CASE WHEN (o_orderkey % 8) & 4 <> 0 THEN 'x' END) AS set_csv,
        |CAST((o_custkey - 700) & 255 AS SMALLINT) AS u8_widen,
        |to_base64(unhex(lpad(to_hex(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)), 16, '0'))) AS dec_b64,
        |to_base64(encode(o_orderstatus)) AS bin_b64,
        |to_base64(unhex(lpad(to_hex((o_orderkey % 1024) & 255), 2, '0')
        |  || lpad(to_hex(((o_orderkey % 1024) >> 8) & 255), 2, '0'))) AS bit_b64
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f8_ddl_rewrite" ->
      """WITH base AS (SELECT n_nationkey, lower(regexp_replace(n_name, '[^A-Za-z]', '_', 'g')) AS tname FROM nation)
        |SELECT n_nationkey,
        |  CASE n_nationkey % 5 WHEN 0 THEN 'CreateTable' WHEN 1 THEN 'AlterTable'
        |    WHEN 2 THEN 'DropTable' WHEN 3 THEN 'Truncate' ELSE 'SkippedStmt' END AS kind,
        |  CASE n_nationkey % 5
        |    WHEN 0 THEN 'CREATE TABLE `dst`.`t_' || tname || '` (id INT PRIMARY KEY, name VARCHAR(20) COLLATE utf8mb4_general_ci)'
        |    WHEN 1 THEN 'ALTER TABLE `dst`.`t_' || tname || '` ADD COLUMN extra INT'
        |    WHEN 2 THEN 'DROP TABLE `dst`.`t_' || tname || '`'
        |    WHEN 3 THEN 'TRUNCATE TABLE `dst`.`t_' || tname || '`'
        |    ELSE NULL END AS rewritten
        |FROM base ORDER BY n_nationkey""".stripMargin,

    "f9_cycle_filter" ->
      """SELECT event_id, user_id, 'server-' || (user_id % 3) AS originServerId
        |FROM events WHERE 'server-' || (user_id % 3) <> 'server-1'
        |ORDER BY event_id""".stripMargin,

    "a1_row_counts" ->
      """SELECT 'customer' AS table_name, COUNT(*) AS n_rows FROM customer
        |UNION ALL SELECT 'documents', COUNT(*) FROM documents
        |UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
        |UNION ALL SELECT 'events', COUNT(*) FROM events
        |UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
        |UNION ALL SELECT 'nation', COUNT(*) FROM nation
        |UNION ALL SELECT 'orders', COUNT(*) FROM orders
        |UNION ALL SELECT 'part', COUNT(*) FROM part
        |UNION ALL SELECT 'region', COUNT(*) FROM region
        |UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
        |ORDER BY table_name""".stripMargin,

    "a3_lag" ->
      """WITH g AS (SELECT MAX(epoch_ms(ts)) AS now_ms FROM events)
        |SELECT user_id, now_ms - MAX(epoch_ms(ts)) AS lag_ms
        |FROM events, g GROUP BY user_id, now_ms ORDER BY user_id""".stripMargin,

    "o9_windowed_agg" ->
      """SELECT user_id,
        |epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS ws_ms,
        |epoch_ms(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour') AS we_ms,
        |COUNT(*) AS n_events,
        |CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY user_id, ws_ms""".stripMargin,

    // versions number BEFORE tombstones drop (gaps mark deletes); a
    // delete's timestamp closes its predecessor through the lead()
    "k8_scd2_history" ->
      """WITH e AS (SELECT user_id, event_id, ts, event_type, value,
        |    CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op FROM events),
        |v AS (SELECT user_id, event_id, event_type, value, op,
        |    CAST(row_number() OVER w AS INT) AS version,
        |    epoch_ms(ts) AS valid_from_ms,
        |    lead(epoch_ms(ts)) OVER w AS valid_to_ms
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, version, valid_from_ms, valid_to_ms,
        |  (valid_to_ms IS NULL) AS is_current, event_type, value
        |FROM v WHERE op <> 'd' ORDER BY user_id, version""".stripMargin,

    "o13_session_windows" ->
      // gaps-and-islands replay of Spark's session merge: a session
      // breaks only when the inter-arrival gap EXCEEDS 8h — an event
      // landing exactly at last+gap still merges (Spark's session
      // windows are [start, last+gap] inclusive at the merge boundary;
      // the events fuzz caught the >= formulation splitting them).
      // End = last event + gap. Tie-safe: tied timestamps contribute
      // brk=0 after the first, so island ids are order-independent.
      """WITH e AS (SELECT user_id, ts FROM events WHERE ts IS NOT NULL),
        |m AS (SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |    > INTERVAL '8 hours' THEN 1 ELSE 0 END AS brk FROM e),
        |s AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m)
        |SELECT user_id, epoch_ms(MIN(ts)) AS ws_ms,
        |  epoch_ms(MAX(ts)) + 28800000 AS we_ms, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, ws_ms""".stripMargin,

    "o5_mts_schedule" ->
      """SELECT event_id, user_id, user_id % 4 AS worker,
        |CAST(row_number() OVER (PARTITION BY user_id % 4 ORDER BY event_id) AS INT) AS commit_pos
        |FROM events ORDER BY event_id""".stripMargin,

    "o3_bigtx_split" ->
      """WITH c AS (SELECT event_id, user_id,
        |  SUM(length(props)) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |FROM events),
        |p AS (SELECT event_id, user_id, CAST(FLOOR((cum - 1) / 4096.0) AS INT) AS part_index FROM c)
        |SELECT event_id, user_id, part_index,
        |  part_index = MAX(part_index) OVER (PARTITION BY user_id) AS is_final
        |FROM p ORDER BY event_id""".stripMargin,

    "o11_stop_at_gtid" ->
      """SELECT event_id, user_id FROM events
        |WHERE event_id BETWEEN 1 AND 4999 OR event_id BETWEEN 6001 AND 7000
        |ORDER BY event_id""".stripMargin,

    // the snapshot∪incremental upsert equals replaying the whole filtered
    // history (QUALIFY); applied_set = a5's interval fold over the
    // post-cutoff ids; n_replayed = the F10-dropped restart overlap
    "pipeline_replicate" ->
      s"""WITH cut AS (SELECT MAX(event_id) // 2 AS c FROM events),
         |f AS (SELECT user_id, event_id, event_type, value, $opCaseSql AS op
         |      FROM events WHERE event_type <> 'click'),
         |st AS (SELECT user_id, event_id, event_type, value, op FROM f
         |       QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1),
         |live AS (SELECT user_id, event_id, event_type, value FROM st WHERE op <> 'd'),
         |inc AS (SELECT user_id, event_id FROM f, cut WHERE event_id > cut.c),
         |g AS (SELECT user_id, event_id,
         |      event_id - row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS grp FROM inc),
         |i AS (SELECT user_id, MIN(event_id) AS lo, MAX(event_id) AS hi FROM g GROUP BY user_id, grp),
         |sets AS (SELECT user_id, string_agg(
         |  CASE WHEN lo = hi THEN CAST(lo AS VARCHAR) ELSE CAST(lo AS VARCHAR) || '-' || CAST(hi AS VARCHAR) END,
         |  ':' ORDER BY lo) AS applied_set FROM i GROUP BY user_id),
         |rep AS (SELECT user_id, COUNT(*) AS n_replayed FROM f, cut
         |        WHERE event_id > cut.c - (cut.c // 4) AND event_id <= cut.c GROUP BY user_id)
         |SELECT live.user_id AS uid, live.event_id AS last_seq, live.event_type AS last_type,
         |  live.value AS val, coalesce(sets.applied_set, '') AS applied_set,
         |  CAST(coalesce(rep.n_replayed, 0) AS BIGINT) AS n_replayed
         |FROM live LEFT JOIN sets USING (user_id) LEFT JOIN rep USING (user_id)
         |ORDER BY uid""".stripMargin,

    // both sides converge to the same live rows; `via` flips with the
    // key's home-server parity
    "pipeline_twoway" ->
      s"""WITH c AS (SELECT user_id, event_id, event_type, value, $opCaseSql AS op,
         |  CASE WHEN user_id % 2 = 0 THEN 'server-A' ELSE 'server-B' END AS origin FROM events),
         |st AS (SELECT user_id, event_id, event_type, value, origin, op FROM c
         |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1),
         |live AS (SELECT * FROM st WHERE op <> 'd')
         |SELECT side, user_id AS uid, event_id AS last_seq, event_type AS last_type,
         |  value AS val,
         |  CASE WHEN origin = 'server-' || side THEN 'local' ELSE 'replicated' END AS via
         |FROM live CROSS JOIN (SELECT unnest(['A','B']) AS side)
         |ORDER BY side, uid""".stripMargin,

    // golden text pinned here independently of LogMinerSession (like
    // s9): generator drift fails the hash, window arithmetic is
    // recomputed by DuckDB
    "s7_session_plan" ->
      """WITH n AS (SELECT MAX(event_id) AS endscn FROM events),
        |i AS (SELECT unnest(range(CAST(ceil(endscn / 2000.0) AS INT))) AS idx, endscn FROM n)
        |SELECT CAST(idx AS BIGINT) AS window_idx,
        |  CAST(idx * 2000 AS BIGINT) AS start_scn,
        |  CAST(least(endscn, idx * 2000 + 2000) AS BIGINT) AS end_scn,
        |  'SELECT scn, seg_owner, table_name, sql_redo, sql_undo, operation_code,
        |  xid, csf, row_id, rollback, rs_id, timestamp, username
        |FROM V$LOGMNR_CONTENTS
        |WHERE SCN > ' || (idx * 2000) || ' AND SCN <= ' || least(endscn, idx * 2000 + 2000) || '
        |AND ( (operation_code IN (6,7,34,36))
        |  OR (operation_code IN (1,2,3,5)
        |      AND seg_owner not in (''SYS'',''SYSTEM'',''APPQOSSYS'',''AUDSYS'',''CTXSYS'',''DVSYS'',''DBSFWUSER'',''DBSNMP'',''GSMADMIN_INTERNAL'',''LBACSYS'',''MDSYS'',''OJVMSYS'',''OLAPSYS'',''ORDDATA'',''ORDSYS'',''OUTLN'',''WMSYS'',''XDB'') AND( ( seg_owner = ''SHOP'' AND table_name in (''ORDERS'',''LINEITEM'')) OR ( seg_owner = ''HR'') ) AND ( seg_owner <> ''TMP'')) )' AS mine_sql
        |FROM i ORDER BY window_idx""".stripMargin,

    "s9_snapshot_chunks" ->
      """WITH n AS (SELECT COUNT(*) AS total FROM orders),
        |i AS (SELECT unnest(range(CAST(ceil(total / 5000.0) AS INT))) AS idx FROM n)
        |SELECT CAST(idx AS INT) AS chunk_idx,
        |'(SELECT * FROM (SELECT t.*, ROWNUM rn FROM "SHOP"."ORDERS" AS OF SCN 12345 t WHERE ROWNUM <= '
        |  || ((idx + 1) * 5000) || ') WHERE rn > ' || (idx * 5000) || ')' AS chunk_sql
        |FROM i ORDER BY chunk_idx""".stripMargin,

    "s8_redo_parse" ->
      """SELECT o_orderkey, 'SHOP' AS schema_name, 'ORDERS' AS table_name,
        |  CASE o_orderkey % 3 WHEN 0 THEN 'c' WHEN 1 THEN 'u' ELSE 'd' END AS op,
        |  CASE WHEN o_orderkey % 3 IN (0, 1) THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) END AS p_val,
        |  CAST(o_orderkey AS VARCHAR) AS k_val,
        |  CASE WHEN o_orderkey % 3 <> 1 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS d_val
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // mirrors the reference type-mapping table (NUMBER tiers, LimitSize
    // scale cap, CHAR 255-threshold, fsp cap) as direct string building
    "s8_ddl_convert" ->
      """WITH b AS (SELECT CAST(p_partkey AS BIGINT) AS k FROM part),
        |c AS (SELECT k, k % 6 AS m, CAST(k AS VARCHAR) AS ks,
        |    1 + k % 38 AS p0, 1 + k % 2000 AS n0,
        |    CASE WHEN 1 + k % 35 > 30 THEN 30 ELSE 1 + k % 35 END AS s1,
        |    CASE WHEN k % 10 > 6 THEN 6 ELSE k % 10 END AS f2,
        |    1 + k % 300 AS n3
        |  FROM b)
        |SELECT k AS p_partkey,
        |  CASE WHEN m IN (0, 1) THEN 'create_table'
        |       WHEN m = 5 THEN 'drop_table' ELSE 'alter_table' END AS kind,
        |  CASE WHEN m = 5 THEN 'shop' ELSE 'SHOP' END AS schema_name,
        |  CASE WHEN m = 5 THEN 't' || ks ELSE 'T' || ks END AS table_name,
        |  CASE m
        |    WHEN 0 THEN 'CREATE TABLE `SHOP`.`T' || ks || '` (`ID` ' ||
        |      CASE WHEN p0 < 3 THEN 'TINYINT' WHEN p0 < 5 THEN 'SMALLINT'
        |           WHEN p0 < 9 THEN 'INT' WHEN p0 < 19 THEN 'BIGINT'
        |           ELSE 'DECIMAL(' || CAST(p0 AS VARCHAR) || ')' END ||
        |      ',`NAME` VARCHAR(' || CAST(n0 AS VARCHAR) || ')) DEFAULT CHARACTER SET = UTF8MB4'
        |    WHEN 1 THEN 'CREATE TABLE `SHOP`.`T' || ks || '` (`C` DECIMAL(38,' ||
        |      CAST(s1 AS VARCHAR) || ') NOT NULL,`D` DATETIME) DEFAULT CHARACTER SET = UTF8MB4'
        |    WHEN 2 THEN 'ALTER TABLE `SHOP`.`T' || ks || '` ADD COLUMN (`C' || ks ||
        |      '` DATETIME(' || CAST(f2 AS VARCHAR) || '))'
        |    WHEN 3 THEN 'ALTER TABLE `SHOP`.`T' || ks || '` MODIFY COLUMN `C' || ks || '` ' ||
        |      CASE WHEN n3 <= 255 THEN 'CHAR' ELSE 'VARCHAR' END || '(' || CAST(n3 AS VARCHAR) || ')'
        |    WHEN 4 THEN 'ALTER TABLE `SHOP`.`T' || ks || '` DROP COLUMN `SHOP`.`T' || ks ||
        |      '`.`C1`, DROP COLUMN `SHOP`.`T' || ks || '`.`C2`'
        |    ELSE 'DROP TABLE `shop`.`t' || ks || '`'
        |  END AS mysql_sql
        |FROM c ORDER BY p_partkey""".stripMargin,

    "s7_txcache" ->
      """WITH redo AS (
        |  SELECT event_id AS scn,
        |    'x' || CAST(event_id // 20 AS VARCHAR) AS xid,
        |    CASE WHEN event_id % 20 = 19 THEN
        |      CASE WHEN (event_id // 20) % 4 = 0 THEN 'rollback' ELSE 'commit' END
        |    ELSE CASE (event_id % 20) % 3 WHEN 0 THEN 'c' WHEN 1 THEN 'u' ELSE 'd' END END AS op,
        |    'R' || CAST((event_id % 20) % 5 AS VARCHAR) AS row_id,
        |    CASE WHEN event_id % 20 = 15 THEN 1 ELSE 0 END AS rb
        |  FROM events),
        |rbmax AS (SELECT xid, row_id, MAX(scn) AS rb_scn FROM redo
        |  WHERE op NOT IN ('commit','rollback') AND rb = 1 GROUP BY xid, row_id),
        |commits AS (SELECT xid, MIN(scn) AS end_scn FROM redo WHERE op = 'commit' GROUP BY xid),
        |rollbacks AS (SELECT DISTINCT xid FROM redo WHERE op = 'rollback')
        |SELECT r.scn, r.xid, r.op, r.row_id, c.end_scn
        |FROM redo r
        |LEFT JOIN rbmax b ON r.xid = b.xid AND r.row_id = b.row_id
        |JOIN commits c ON r.xid = c.xid
        |WHERE r.op NOT IN ('commit','rollback') AND r.rb = 0
        |  AND (b.rb_scn IS NULL OR r.scn > b.rb_scn)
        |  AND r.xid NOT IN (SELECT xid FROM rollbacks)
        |ORDER BY scn""".stripMargin,

    "s7_csf" ->
      """WITH base AS (SELECT o_orderkey AS k,
        |    CAST(3000 + o_orderkey % 7 * 1500 AS INT) AS tlen
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |f AS (SELECT k, tlen,
        |  'insert into "SHOP"."BIG"("K","TXT") values (' || CAST(k AS VARCHAR)
        |    || ',''' || repeat('ab4', tlen // 3) || ''')' AS full_sql FROM base)
        |SELECT CAST(k AS BIGINT) AS scn, 'x' || CAST(k // 100 AS VARCHAR) AS xid,
        |  'SHOP' AS schema_name, 'BIG' AS table_name, 'c' AS op,
        |  CAST(k AS VARCHAR) AS k_val, tlen AS txt_len,
        |  CAST(ceil(length(full_sql) / 4000.0) AS INT) AS n_pieces
        |FROM f ORDER BY scn""".stripMargin,

    "k_sql_builder" ->
      """SELECT * FROM (VALUES
        |  ('delete_nopk', 'DELETE FROM `shop`.`customer` WHERE (`c_custkey` = ? OR (`c_custkey` IS NULL AND ? IS NULL)) AND (`c_name` = ? OR (`c_name` IS NULL AND ? IS NULL)) AND (`c_nationkey` = ? OR (`c_nationkey` IS NULL AND ? IS NULL)) AND (`c_acctbal` = ? OR (`c_acctbal` IS NULL AND ? IS NULL)) AND (`c_mktsegment` = ? OR (`c_mktsegment` IS NULL AND ? IS NULL)) LIMIT 1'),
        |  ('delete_pk', 'DELETE FROM `shop`.`customer` WHERE (`c_custkey` = ? OR (`c_custkey` IS NULL AND ? IS NULL)) LIMIT 1'),
        |  ('ledger_insert', 'INSERT INTO `shop`.`gtid_executed` (job_id, source_uuid, gtid, gtid_set) VALUES (?, ?, ?, ?)'),
        |  ('prologue', 'SET FOREIGN_KEY_CHECKS = 0; SET UNIQUE_CHECKS = 0; CREATE SCHEMA IF NOT EXISTS `shop`'),
        |  ('replace_1', 'REPLACE INTO `shop`.`customer` (`c_custkey`, `c_name`, `c_nationkey`, `c_acctbal`, `c_mktsegment`) VALUES (?, ?, ?, ?, ?)'),
        |  ('replace_4', 'REPLACE INTO `shop`.`customer` (`c_custkey`, `c_name`, `c_nationkey`, `c_acctbal`, `c_mktsegment`) VALUES (?, ?, ?, ?, ?), (?, ?, ?, ?, ?), (?, ?, ?, ?, ?), (?, ?, ?, ?, ?)'),
        |  ('tier_plan_141', '128x1,8x1,4x1,1x1'),
        |  ('tier_plan_300', '128x2,8x5,4x1'),
        |  ('update_pk', 'UPDATE `shop`.`customer` SET `c_custkey` = ?, `c_name` = ?, `c_nationkey` = ?, `c_acctbal` = ?, `c_mktsegment` = ? WHERE (`c_custkey` = ? OR (`c_custkey` IS NULL AND ? IS NULL)) LIMIT 1')
        |) AS t(stmt_kind, sql) ORDER BY stmt_kind""".stripMargin,

    "k7_ledger_compact" ->
      """WITH l AS (SELECT 'job1' AS job_id,
        |    'uuid-' || CAST(user_id % 5 AS VARCHAR) AS source_uuid,
        |    event_id AS gtid FROM events),
        |d AS (SELECT DISTINCT job_id, source_uuid, gtid FROM l),
        |g AS (SELECT job_id, source_uuid, gtid,
        |  gtid - row_number() OVER (PARTITION BY job_id, source_uuid ORDER BY gtid) AS grp FROM d),
        |i AS (SELECT job_id, source_uuid, MIN(gtid) AS lo, MAX(gtid) AS hi
        |  FROM g GROUP BY job_id, source_uuid, grp),
        |sets AS (SELECT job_id, source_uuid, string_agg(
        |    CASE WHEN lo = hi THEN CAST(lo AS VARCHAR)
        |         ELSE CAST(lo AS VARCHAR) || '-' || CAST(hi AS VARCHAR) END,
        |    ':' ORDER BY lo) AS gtid_set
        |  FROM i GROUP BY job_id, source_uuid),
        |counts AS (SELECT job_id, source_uuid, COUNT(*) AS n_txs FROM l GROUP BY job_id, source_uuid)
        |SELECT s.job_id, s.source_uuid, CAST(0 AS BIGINT) AS gtid, s.gtid_set, c.n_txs
        |FROM sets s JOIN counts c USING (job_id, source_uuid)
        |ORDER BY source_uuid""".stripMargin,

    "a2_checksum" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        |CAST(SUM(l_orderkey * 31 + l_linenumber * 7) AS BIGINT) AS checksum
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a5_gtid_set" ->
      """WITH d AS (SELECT DISTINCT user_id, event_id FROM events),
        |g AS (SELECT user_id, event_id,
        |  event_id - row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS grp FROM d),
        |i AS (SELECT user_id, MIN(event_id) AS lo, MAX(event_id) AS hi FROM g GROUP BY user_id, grp)
        |SELECT user_id, string_agg(
        |  CASE WHEN lo = hi THEN CAST(lo AS VARCHAR) ELSE CAST(lo AS VARCHAR) || '-' || CAST(hi AS VARCHAR) END,
        |  ':' ORDER BY lo) AS gtid_set
        |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin,

    "k2_cdc_apply" ->
      s"""WITH c AS (SELECT user_id, event_id, event_type, value, $opCaseSql AS op FROM events)
         |SELECT user_id, event_id, event_type, value FROM c
         |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1 AND op <> 'd'
         |ORDER BY user_id""".stripMargin,

    "o1_size_batches" ->
      """WITH c AS (SELECT event_id, user_id,
        |  SUM(length(props)) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |FROM events)
        |SELECT event_id, user_id, CAST(FLOOR((cum - 1) / 2048.0) AS BIGINT) AS batch_id
        |FROM c ORDER BY event_id""".stripMargin,

    "o2_merge_inserts" ->
      s"""WITH c AS (SELECT user_id % 5 AS table_id, event_id, $opCaseSql AS op FROM events),
         |f AS (SELECT table_id, event_id, op,
         |  CASE WHEN op <> coalesce(lag(op) OVER (PARTITION BY table_id ORDER BY event_id), '__none')
         |       THEN 1 ELSE 0 END AS brk FROM c),
         |g AS (SELECT table_id, event_id, op,
         |  SUM(brk) OVER (PARTITION BY table_id ORDER BY event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM f)
         |SELECT table_id, op, MIN(event_id) AS first_seq, MAX(event_id) AS last_seq, COUNT(*) AS n_rows
         |FROM g GROUP BY table_id, run, op ORDER BY table_id, first_seq""".stripMargin,

    "o4_writeset_multi" ->
      """WITH c AS (SELECT event_id, user_id, event_type,
        |  CAST(floor(value) AS BIGINT) % 7 AS k2 FROM events)
        |SELECT event_id, user_id, k2,
        |  CASE WHEN event_type = 'error' THEN event_id - 1
        |       ELSE greatest(
        |         coalesce(lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id), -1),
        |         coalesce(lag(event_id) OVER (PARTITION BY k2 ORDER BY event_id), -1))
        |  END AS last_committed
        |FROM c ORDER BY event_id""".stripMargin,

    "o4_writeset" ->
      """SELECT event_id, user_id,
        |coalesce(lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id), -1) AS last_committed
        |FROM events ORDER BY event_id""".stripMargin,

    "k6_debezium" ->
      s"""WITH c AS (SELECT event_id, user_id, event_type, ts, $opCaseSql AS op FROM events)
         |SELECT '{"user_id":' || user_id || '}' AS key,
         |'{"after":{"event_id":' || event_id || ',"user_id":' || user_id ||
         |',"event_type":"' || event_type || '"},"source":{"name":"graft","db":"shop","table":"events","server_id":"server-1","pos":' ||
         |event_id || '},"op":"' || op || '","ts_ms":' || epoch_ms(ts) || '}' AS value,
         |'graft.shop.events' AS topic
         |FROM c ORDER BY event_id""".stripMargin,

    "s6_discovery" ->
      """WITH cat AS (SELECT DISTINCT source AS db, lang AS "table" FROM documents),
        |r AS (SELECT * FROM cat
        |  WHERE lower(db) NOT IN ('mysql','sys','information_schema','performance_schema')
        |    AND (regexp_matches(db, '^src(\d)$') OR db = 'src12')
        |    AND db <> 'src3')
        |SELECT db, "table",
        |  CASE WHEN regexp_matches(db, '^src(\d)$')
        |       THEN regexp_replace(db, '^src(\d)$', 'shard_\1') ELSE db END AS out_db,
        |  CASE WHEN regexp_matches(db, '^src(\d)$')
        |       THEN regexp_replace("table", '^(.*)$', 't_\1') ELSE "table" END AS out_table
        |FROM r ORDER BY db, "table"""".stripMargin,

    "k6_schema_topic" ->
      """WITH base AS (SELECT n_nationkey,
        |  lower(regexp_replace(n_name, '[^A-Za-z]', '_', 'g')) AS tname FROM nation
        |  WHERE n_nationkey % 5 <> 4),
        |d AS (SELECT n_nationkey,
        |  CASE n_nationkey % 5
        |    WHEN 0 THEN 'CREATE TABLE `dst`.`t_' || tname || '` (id INT PRIMARY KEY, name VARCHAR(20) COLLATE utf8mb4_general_ci)'
        |    WHEN 1 THEN 'ALTER TABLE `dst`.`t_' || tname || '` ADD COLUMN extra INT'
        |    WHEN 2 THEN 'DROP TABLE `dst`.`t_' || tname || '`'
        |    ELSE 'TRUNCATE TABLE `dst`.`t_' || tname || '`' END AS ddl
        |FROM base)
        |SELECT '{"databaseName":"dst"}' AS key,
        |  '{"source":{"name":"graft","db":"dst","server_id":"server-1","pos":' || n_nationkey ||
        |  '},"databaseName":"dst","ddl":"' || ddl || '","ts_ms":' || (n_nationkey * 1000) || '}' AS value,
        |  'graft' AS topic
        |FROM d ORDER BY n_nationkey""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g')))) AS content_hash,
        |MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_ngram" ->
      """WITH w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s WHERE len(sh) > 0),
        |f AS (SELECT * FROM e QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 50),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS common
        |  FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b, round(common / (na + nb - common), 6) AS jaccard
        |FROM p WHERE common / (na + nb - common) >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // brute force with NO frequency cap: every shared-shingle pair is
    // graded, so a green row proves the Spark-side prefix filter is
    // lossless; the tau=3/5 filter is integer cross-multiplication in
    // both engines (no float boundary can flip a pair)
    "dedup_prefix_exact" ->
      """WITH w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s WHERE len(sh) > 0),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS common
        |  FROM e a JOIN e b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |  CAST(common AS BIGINT) AS common,
        |  round(common / (na + nb - common), 6) AS jaccard
        |FROM p WHERE 5 * common >= 3 * (na + nb - common) ORDER BY id_a, id_b""".stripMargin,

    // full cross-product truth with no caps — green proves the frozen
    // index order + PPJoin filters lost no batch×corpus pair
    "dedup_prefix_incremental" ->
      """WITH w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s WHERE len(sh) > 0),
        |p AS (SELECT a.doc_id AS batch_id, b.doc_id AS index_id,
        |    a.n AS na, b.n AS nb, COUNT(*) AS common
        |  FROM e a JOIN e b USING (shingle)
        |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0 GROUP BY 1, 2, 3, 4)
        |SELECT batch_id, index_id, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |  CAST(common AS BIGINT) AS common,
        |  round(common / (na + nb - common), 6) AS jaccard
        |FROM p WHERE 2 * common >= 1 * (na + nb - common)
        |ORDER BY batch_id, index_id""".stripMargin,

    "dedup_containment" ->
      """WITH w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s WHERE len(sh) > 0),
        |f AS (SELECT * FROM e QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 50),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS common
        |  FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b, round(common / na, 6) AS c_a_in_b, round(common / nb, 6) AS c_b_in_a
        |FROM p WHERE GREATEST(common / na, common / nb) >= 0.8 ORDER BY id_a, id_b""".stripMargin,

    "dedup_incremental_bloom" ->
      """WITH base AS (SELECT doc_id,
        |  lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))) AS norm,
        |  doc_id % 5 = 0 AS is_batch FROM documents)
        |SELECT doc_id FROM base b WHERE b.is_batch
        |  AND md5(b.norm) NOT IN (SELECT md5(norm) FROM base WHERE NOT is_batch)
        |ORDER BY doc_id""".stripMargin,

    "dedup_incremental" ->
      """WITH base AS (SELECT doc_id, text,
        |  lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))) AS norm,
        |  doc_id % 5 = 0 AS is_batch FROM documents),
        |exact_drop AS (SELECT b.doc_id FROM base b
        |  WHERE b.is_batch AND md5(b.norm) IN (SELECT md5(norm) FROM base WHERE NOT is_batch)),
        |w AS (SELECT doc_id, is_batch, string_split(norm, ' ') AS words FROM base),
        |s2 AS (SELECT doc_id, is_batch, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |e AS (SELECT doc_id, is_batch, len(sh) AS nsh, unnest(sh) AS shingle FROM s2 WHERE len(sh) > 0),
        |f AS (SELECT * FROM e QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000),
        |p AS (SELECT b.doc_id AS batch_id, i.doc_id AS index_id, b.nsh AS nb, i.nsh AS ni, COUNT(*) AS common
        |  FROM f b JOIN f i USING (shingle) WHERE b.is_batch AND NOT i.is_batch GROUP BY 1, 2, 3, 4),
        |near_drop AS (SELECT DISTINCT batch_id AS doc_id FROM p
        |  WHERE common / CAST(nb + ni - common AS DOUBLE) >= 0.5)
        |SELECT doc_id FROM base WHERE is_batch
        |  AND doc_id NOT IN (SELECT doc_id FROM exact_drop)
        |  AND doc_id NOT IN (SELECT doc_id FROM near_drop)
        |ORDER BY doc_id""".stripMargin,

    "dedup_minhash" ->
      """WITH w AS (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |h AS (SELECT doc_id, list_transform(sh, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647) AS hs
        |  FROM s WHERE len(sh) > 0),
        |sig AS (SELECT doc_id,
        |  list_transform(range(0, 64), j ->
        |    list_min(list_transform(hs, x -> ((2*j + 1) * x + j * 12345 + 7) % 2147483647))) AS sig
        |  FROM h),
        |banded AS (SELECT doc_id, sig, u.b AS band,
        |  sig[u.b*4+1] || ':' || sig[u.b*4+2] || ':' || sig[u.b*4+3] || ':' || sig[u.b*4+4] AS bkey
        |  FROM sig, LATERAL (SELECT unnest(generate_series(0, 15)) AS b) u),
        |f AS (SELECT * FROM banded QUALIFY COUNT(*) OVER (PARTITION BY band, bkey) <= 500),
        |p AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
        |  FROM f a JOIN f b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |scored AS (SELECT id_a, id_b,
        |  len(list_filter(range(1, 65), i -> sa[i] = sb[i])) / 64.0 AS sig_frac FROM p)
        |SELECT id_a, id_b, round(sig_frac, 6) AS sig_frac FROM scored
        |WHERE sig_frac >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // batch × stored-index probe: same portable construction, bucket
    // cap applies to INDEX members only (the stored side)
    "dedup_minhash_incremental" ->
      """WITH w AS (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |h AS (SELECT doc_id, list_transform(sh, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647) AS hs
        |  FROM s WHERE len(sh) > 0),
        |sig AS (SELECT doc_id,
        |  list_transform(range(0, 16), j ->
        |    list_min(list_transform(hs, x -> ((2*j + 1) * x + j * 12345 + 7) % 2147483647))) AS sig
        |  FROM h),
        |banded AS (SELECT doc_id, sig, u.b AS band,
        |  sig[u.b*4+1] || ':' || sig[u.b*4+2] || ':' || sig[u.b*4+3] || ':' || sig[u.b*4+4] AS bkey
        |  FROM sig, LATERAL (SELECT unnest(generate_series(0, 3)) AS b) u),
        |idx AS (SELECT * FROM banded WHERE doc_id % 5 = 0
        |        QUALIFY COUNT(*) OVER (PARTITION BY band, bkey) <= 500),
        |bat AS (SELECT * FROM banded WHERE doc_id % 5 <> 0),
        |p AS (SELECT DISTINCT bat.doc_id AS doc_id, idx.doc_id AS dup_of,
        |  bat.sig AS sa, idx.sig AS sb
        |  FROM bat JOIN idx ON bat.band = idx.band AND bat.bkey = idx.bkey),
        |scored AS (SELECT doc_id, dup_of,
        |  len(list_filter(range(1, 17), i -> sa[i] = sb[i])) / 16.0 AS sig_frac FROM p)
        |SELECT doc_id, dup_of, round(sig_frac, 6) AS sig_frac FROM scored
        |WHERE sig_frac >= 0.5 ORDER BY doc_id, dup_of""".stripMargin,

    "dedup_minhash_md5" ->
      """WITH w AS (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |h AS (SELECT doc_id, list_transform(sh, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647) AS hs
        |  FROM s WHERE len(sh) > 0),
        |sig AS (SELECT doc_id,
        |  list_transform(range(0, 16), j ->
        |    list_min(list_transform(hs, x -> ((2*j + 1) * x + j * 12345 + 7) % 2147483647))) AS sig
        |  FROM h),
        |banded AS (SELECT doc_id, sig, u.b AS band,
        |  sig[u.b*4+1] || ':' || sig[u.b*4+2] || ':' || sig[u.b*4+3] || ':' || sig[u.b*4+4] AS bkey
        |  FROM sig, LATERAL (SELECT unnest(generate_series(0, 3)) AS b) u),
        |f AS (SELECT * FROM banded QUALIFY COUNT(*) OVER (PARTITION BY band, bkey) <= 500),
        |p AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
        |  FROM f a JOIN f b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |scored AS (SELECT id_a, id_b,
        |  len(list_filter(range(1, 17), i -> sa[i] = sb[i])) / 16.0 AS sig_frac FROM p)
        |SELECT id_a, id_b, round(sig_frac, 6) AS sig_frac FROM scored
        |WHERE sig_frac >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // batch × stored-fingerprint-index probe; block cap on INDEX side
    "dedup_simhash_incremental" ->
      """WITH w AS (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents),
        |h AS (SELECT doc_id, list_transform(words, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs FROM w),
        |v AS (SELECT doc_id, list_transform(range(0, 60), b ->
        |    list_sum(list_transform(hs, x -> ((x >> b) & 1) * 2 - 1))) AS votes FROM h),
        |fp AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), b ->
        |    CASE WHEN votes[b+1] > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS f FROM v),
        |blk AS (SELECT doc_id, f, u.b AS block_idx, (f >> (u.b*12)) & 4095 AS block_val
        |  FROM fp, LATERAL (SELECT unnest(generate_series(0, 4)) AS b) u),
        |idx AS (SELECT * FROM blk WHERE doc_id % 5 = 0
        |        QUALIFY COUNT(*) OVER (PARTITION BY block_idx, block_val) <= 1000),
        |bat AS (SELECT * FROM blk WHERE doc_id % 5 <> 0),
        |p AS (SELECT DISTINCT bat.doc_id AS doc_id, idx.doc_id AS dup_of,
        |    CAST(bit_count(xor(bat.f, idx.f)) AS INT) AS hamming
        |  FROM bat JOIN idx ON bat.block_idx = idx.block_idx AND bat.block_val = idx.block_val)
        |SELECT doc_id, dup_of, hamming FROM p WHERE hamming <= 3 ORDER BY doc_id, dup_of""".stripMargin,

    "dedup_simhash" ->
      """WITH w AS (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents),
        |h AS (SELECT doc_id, list_transform(words, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs FROM w),
        |v AS (SELECT doc_id, list_transform(range(0, 60), b ->
        |    list_sum(list_transform(hs, x -> ((x >> b) & 1) * 2 - 1))) AS votes FROM h),
        |fp AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), b ->
        |    CASE WHEN votes[b+1] > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS f FROM v),
        |blk AS (SELECT doc_id, f, u.b AS block_idx, (f >> (u.b*12)) & 4095 AS block_val
        |  FROM fp, LATERAL (SELECT unnest(generate_series(0, 4)) AS b) u),
        |flt AS (SELECT * FROM blk QUALIFY COUNT(*) OVER (PARTITION BY block_idx, block_val) <= 1000),
        |p AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(bit_count(xor(a.f, b.f)) AS INT) AS hamming
        |  FROM flt a JOIN flt b ON a.block_idx = b.block_idx AND a.block_val = b.block_val AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    "dedup_clusters" ->
      """WITH RECURSIVE w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s WHERE len(sh) > 0),
        |f AS (SELECT * FROM e QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 50),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS common
        |  FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4),
        |pairs AS (SELECT id_a, id_b FROM p WHERE common / (na + nb - common) >= 0.5),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(node, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
        |)
        |SELECT node, MIN(label) AS cluster FROM reach GROUP BY node ORDER BY node""".stripMargin,

    // the cluster chain + a (score DESC, id ASC) argmax per component;
    // singletons (no pair) always keep
    "dedup_keep_best" ->
      """WITH RECURSIVE w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s WHERE len(sh) > 0),
        |f AS (SELECT * FROM e QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 50),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS common
        |  FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4),
        |pairs AS (SELECT id_a, id_b FROM p WHERE common / (na + nb - common) >= 0.5),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(node, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
        |),
        |comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
        |sc AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS score FROM w),
        |j AS (SELECT s.doc_id, COALESCE(c.cluster, s.doc_id) AS component, s.score
        |  FROM sc s LEFT JOIN comp c ON s.doc_id = c.node)
        |SELECT doc_id, component,
        |  CAST(CASE WHEN row_number() OVER (PARTITION BY component
        |    ORDER BY score DESC, doc_id ASC) = 1 THEN 1 ELSE 0 END AS INT) AS kept,
        |  score
        |FROM j ORDER BY doc_id""".stripMargin,

    // fold keys on the exact-dup group representative — copies can
    // never straddle folds; 60-bit md5 bucket, same hash60 contract
    "sample_kfold" ->
      """WITH h AS (SELECT doc_id,
        |    md5(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g')))) AS hh
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT hh, MIN(doc_id) AS rep FROM h GROUP BY hh)
        |SELECT doc_id, rep,
        |  CAST(('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 15))::BIGINT % 5 AS INT) AS fold
        |FROM h JOIN r USING (hh) ORDER BY doc_id""".stripMargin,

    "sample_split_leakfree" ->
      """WITH RECURSIVE w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s WHERE len(sh) > 0),
        |f AS (SELECT * FROM e QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 50),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS common
        |  FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4),
        |pairs AS (SELECT id_a, id_b FROM p WHERE common / (na + nb - common) >= 0.5),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(node, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
        |),
        |comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
        |j AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster_rep
        |      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
        |b AS (SELECT doc_id, cluster_rep,
        |  ('0x' || substr(md5(CAST(cluster_rep AS VARCHAR)), 1, 15))::BIGINT % 10000 AS bucket FROM j)
        |SELECT doc_id, cluster_rep,
        |  CASE WHEN bucket < 8000 THEN 'train' WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    // the n2 = 0 arms mirror the native expression's cosine(0, x) := 0
    // convention (zero vectors would otherwise NaN past the threshold)
    "emb_cosine_pairs" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    list_aggregate(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS n2
        |  FROM embeddings),
        |s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CASE WHEN a.n2 = 0 OR b.n2 = 0 THEN 0.0
        |         ELSE list_cosine_similarity(a.v, b.v) END AS cos
        |  FROM e a, e b WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(cos, 6) AS cosine
        |FROM s WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    "sim_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
        |    list_aggregate(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS qn2
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS corpus_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv,
        |    list_aggregate(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS cn2
        |  FROM embeddings),
        |scored AS (SELECT query_id, corpus_id,
        |    CASE WHEN qn2 = 0 OR cn2 = 0 THEN 0.0
        |         ELSE list_cosine_similarity(cv, qv) END AS cos
        |  FROM q, c WHERE corpus_id <> query_id)
        |SELECT query_id, CAST(row_number() OVER w AS INT) AS rank, corpus_id, round(cos, 6) AS cosine
        |FROM scored
        |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "emb_lsh_md5" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |bk AS (SELECT vec_id, v, u.t AS tbl,
        |  CAST(list_sum(list_transform(range(0, 6), b ->
        |    CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(range(1, len(v)+1), d ->
        |          v[d] * (('0x' || substr(md5(u.t || '_' || b || '_' || (d-1)), 1, 13))::BIGINT / 2251799813685248.0 - 1.0))),
        |        (a, x) -> a + x) >= 0
        |    THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
        |  FROM e, LATERAL (SELECT unnest(generate_series(0, 3)) AS t) u),
        |flt AS (SELECT * FROM bk QUALIFY COUNT(*) OVER (PARTITION BY tbl, bucket) <= 500),
        |p AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
        |  FROM flt a JOIN flt b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |s AS (SELECT id_a, id_b, list_cosine_similarity(va, vb) AS cos FROM p)
        |SELECT id_a, id_b, round(cos, 6) AS cosine FROM s WHERE cos >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    // lshPairs with portable planes: buckets (8 bits × 4 tables), drop
    // over-cap buckets (BoundedCollectList semantics), distinct pairs,
    // cosine filter — bit-identical fold order on both engines
    // batch × stored-LSH-index probe; bucket cap on INDEX side only
    "emb_lsh_incremental" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |bk AS (SELECT vec_id, v, u.t AS tbl,
        |  CAST(list_sum(list_transform(range(0, 8), b ->
        |    CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(range(1, len(v)+1), d ->
        |          v[d] * (('0x' || substr(md5(u.t || '_' || b || '_' || (d-1)), 1, 13))::BIGINT / 2251799813685248.0 - 1.0))),
        |        (a, x) -> a + x) >= 0
        |    THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
        |  FROM e, LATERAL (SELECT unnest(generate_series(0, 3)) AS t) u),
        |idx AS (SELECT * FROM bk WHERE vec_id % 5 = 0
        |        QUALIFY COUNT(*) OVER (PARTITION BY tbl, bucket) <= 1000),
        |bat AS (SELECT * FROM bk WHERE vec_id % 5 <> 0),
        |p AS (SELECT DISTINCT bat.vec_id AS vec_id, idx.vec_id AS dup_of, bat.v AS va, idx.v AS vb
        |  FROM bat JOIN idx ON bat.tbl = idx.tbl AND bat.bucket = idx.bucket),
        |s AS (SELECT vec_id, dup_of, list_cosine_similarity(va, vb) AS cos FROM p)
        |SELECT vec_id, dup_of, round(cos, 6) AS cosine FROM s WHERE cos >= 0.4
        |ORDER BY vec_id, dup_of""".stripMargin,

    "emb_lsh_pairs" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |bk AS (SELECT vec_id, v, u.t AS tbl,
        |  CAST(list_sum(list_transform(range(0, 8), b ->
        |    CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(range(1, len(v)+1), d ->
        |          v[d] * (('0x' || substr(md5(u.t || '_' || b || '_' || (d-1)), 1, 13))::BIGINT / 2251799813685248.0 - 1.0))),
        |        (a, x) -> a + x) >= 0
        |    THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
        |  FROM e, LATERAL (SELECT unnest(generate_series(0, 3)) AS t) u),
        |flt AS (SELECT * FROM bk QUALIFY COUNT(*) OVER (PARTITION BY tbl, bucket) <= 1000),
        |p AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
        |  FROM flt a JOIN flt b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |s AS (SELECT id_a, id_b, list_cosine_similarity(va, vb) AS cos FROM p)
        |SELECT id_a, id_b, round(cos, 6) AS cosine FROM s WHERE cos >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    // lshTopK: same portable buckets; candidates = corpus∞query bucket
    // matches, best cosine per pair, top-5 re-rank with corpus_id
    // tie-break — mirrors the broadcast-join + groupBy(max) Spark plan
    "sim_lsh_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |bk AS (SELECT vec_id, v, u.t AS tbl,
        |  CAST(list_sum(list_transform(range(0, 8), b ->
        |    CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(range(1, len(v)+1), d ->
        |          v[d] * (('0x' || substr(md5(u.t || '_' || b || '_' || (d-1)), 1, 13))::BIGINT / 2251799813685248.0 - 1.0))),
        |        (a, x) -> a + x) >= 0
        |    THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
        |  FROM e, LATERAL (SELECT unnest(generate_series(0, 3)) AS t) u),
        |q AS (SELECT * FROM bk WHERE vec_id < 10),
        |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id, q.v AS qv, c.v AS cv
        |  FROM bk c JOIN q ON c.tbl = q.tbl AND c.bucket = q.bucket AND c.vec_id <> q.vec_id),
        |s AS (SELECT query_id, corpus_id, list_cosine_similarity(cv, qv) AS cos FROM cand)
        |SELECT query_id, CAST(row_number() OVER w AS INT) AS rank, corpus_id, round(cos, 6) AS cosine
        |FROM s
        |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // knnGraph: lshPairs-style capped buckets (auto-scaled bits × 4
    // tables, cap 1000) but DIRECTED candidates, per-src top-5 by
    // (cos DESC, dst ASC), then the mutual filter = self-join on the
    // reversed edge; zero-norm guard matches cosineNative's
    // cosine(0,·)=0 convention. `nb` replays autoNBits: smallest b in
    // [4,24] with count <= 64*2^b — pure integer, so it cannot drift
    // from the Spark side at any corpus size
    "sim_knn_graph" ->
      """WITH nb AS (SELECT CAST(coalesce(MIN(b), 24) AS INT) AS nbits
        |  FROM range(4, 25) t(b)
        |  WHERE (SELECT count(*) FROM embeddings) <= 64 * (1::BIGINT << b)),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    list_aggregate(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS n2
        |  FROM embeddings),
        |bk AS (SELECT vec_id, v, n2, u.t AS tbl,
        |  CAST(list_sum(list_transform(range(0, nb.nbits), b ->
        |    CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(range(1, len(v)+1), d ->
        |          v[d] * (('0x' || substr(md5(u.t || '_' || b || '_' || (d-1)), 1, 13))::BIGINT / 2251799813685248.0 - 1.0))),
        |        (a, x) -> a + x) >= 0
        |    THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
        |  FROM e, nb, LATERAL (SELECT unnest(generate_series(0, 3)) AS t) u),
        |flt AS (SELECT * FROM bk QUALIFY COUNT(*) OVER (PARTITION BY tbl, bucket) <= 1000),
        |p AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst, a.v AS va, b.v AS vb,
        |    a.n2 AS na2, b.n2 AS nb2
        |  FROM flt a JOIN flt b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
        |s AS (SELECT src, dst,
        |    CASE WHEN na2 = 0 OR nb2 = 0 THEN 0.0
        |         ELSE list_cosine_similarity(va, vb) END AS cos FROM p),
        |d AS (SELECT src, dst, cos, CAST(row_number() OVER w AS INT) AS rk FROM s
        |  WINDOW w AS (PARTITION BY src ORDER BY cos DESC, dst ASC)
        |  QUALIFY row_number() OVER w <= 5)
        |SELECT a.src AS id_a, a.dst AS id_b, round(a.cos, 6) AS cosine,
        |  a.rk AS rank_ab, b.rk AS rank_ba
        |FROM d a JOIN d b ON a.src = b.dst AND a.dst = b.src
        |WHERE a.src < a.dst
        |ORDER BY id_a, id_b""".stripMargin,

    // recallAtK(bruteForceTopK, lshTopK) at k=5: exact side = sim_topk's
    // CTEs (incl. the zero-norm guard), approx side = sim_lsh_topk's;
    // hits summed as BIGINT (not HUGEINT→float64), recall via `//` on
    // positive operands == Spark's `div`
    "sim_recall_eval" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    list_aggregate(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS n2
        |  FROM embeddings),
        |xs AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CASE WHEN q.n2 = 0 OR c.n2 = 0 THEN 0.0
        |         ELSE list_cosine_similarity(c.v, q.v) END AS cos
        |  FROM e q, e c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |exact AS (SELECT query_id, corpus_id FROM xs
        |  WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC)
        |  QUALIFY row_number() OVER w <= 5),
        |bk AS (SELECT vec_id, v, n2, u.t AS tbl,
        |  CAST(list_sum(list_transform(range(0, 8), b ->
        |    CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(range(1, len(v)+1), d ->
        |          v[d] * (('0x' || substr(md5(u.t || '_' || b || '_' || (d-1)), 1, 13))::BIGINT / 2251799813685248.0 - 1.0))),
        |        (a, x) -> a + x) >= 0
        |    THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
        |  FROM e, LATERAL (SELECT unnest(generate_series(0, 3)) AS t) u),
        |qb AS (SELECT * FROM bk WHERE vec_id < 10),
        |cand AS (SELECT DISTINCT qb.vec_id AS query_id, c.vec_id AS corpus_id, qb.v AS qv, c.v AS cv,
        |    qb.n2 AS qn2, c.n2 AS cn2
        |  FROM bk c JOIN qb ON c.tbl = qb.tbl AND c.bucket = qb.bucket AND c.vec_id <> qb.vec_id),
        |ap AS (SELECT query_id, corpus_id,
        |    CASE WHEN qn2 = 0 OR cn2 = 0 THEN 0.0
        |         ELSE list_cosine_similarity(cv, qv) END AS cos FROM cand),
        |approx AS (SELECT query_id, corpus_id FROM ap
        |  WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC)
        |  QUALIFY row_number() OVER w <= 5)
        |SELECT x.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
        |  CAST(SUM(CASE WHEN a.corpus_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |  CAST(SUM(CASE WHEN a.corpus_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000
        |    // CAST(COUNT(*) AS BIGINT) AS recall_micros
        |FROM exact x LEFT JOIN approx a
        |  ON a.query_id = x.query_id AND a.corpus_id = x.corpus_id
        |GROUP BY x.query_id
        |ORDER BY x.query_id""".stripMargin,

    // ivfTopK with iters=0: seed centroids = the 16 lowest-id vectors;
    // nearest/probe ordering matches Spark's sort_array(desc) struct
    // comparison (cos DESC, then cid DESC on ties)
    "sim_ivf_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |cent0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
        |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
        |a1 AS (SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.v) AS cos
        |  FROM e, cent0 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY cos DESC, c.cid DESC) = 1),
        |m1 AS (SELECT a.cid, u.i AS pos,
        |    (SUM(CAST(floor(a.v[u.i] * 1000000) AS BIGINT))::DOUBLE / COUNT(*)::DOUBLE) / 1000000.0 AS m
        |  FROM a1 a, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
        |  GROUP BY a.cid, u.i),
        |l1 AS (SELECT cid, list(m ORDER BY pos) AS v FROM m1 GROUP BY cid),
        |cent1 AS (SELECT c.cid, COALESCE(l.v, c.v) AS v FROM cent0 c LEFT JOIN l1 l ON l.cid = c.cid),
        |a2 AS (SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.v) AS cos
        |  FROM e, cent1 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY cos DESC, c.cid DESC) = 1),
        |m2 AS (SELECT a.cid, u.i AS pos,
        |    (SUM(CAST(floor(a.v[u.i] * 1000000) AS BIGINT))::DOUBLE / COUNT(*)::DOUBLE) / 1000000.0 AS m
        |  FROM a2 a, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
        |  GROUP BY a.cid, u.i),
        |l2 AS (SELECT cid, list(m ORDER BY pos) AS v FROM m2 GROUP BY cid),
        |cent2 AS (SELECT c.cid, COALESCE(l.v, c.v) AS v FROM cent1 c LEFT JOIN l2 l ON l.cid = c.cid),
        |scoredc AS (SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.v) AS cos
        |  FROM e, cent2 c),
        |assign AS (SELECT vec_id, v, cid FROM scoredc
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid DESC) = 1),
        |probes AS (SELECT vec_id AS query_id, v AS qv, cid FROM scoredc WHERE vec_id < 10
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid DESC) <= 4),
        |s AS (SELECT p.query_id, a.vec_id AS corpus_id,
        |    list_cosine_similarity(a.v, p.qv) AS cos
        |  FROM assign a JOIN probes p ON a.cid = p.cid AND a.vec_id <> p.query_id)
        |SELECT query_id, CAST(row_number() OVER w AS INT) AS rank, corpus_id, round(cos, 6) AS cosine
        |FROM s
        |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // same Lloyd replay as sim_ivf_topk up to `assign`, then pairs
    // within each list instead of query probes
    "dedup_semantic" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |cent0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
        |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
        |a1 AS (SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.v) AS cos
        |  FROM e, cent0 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY cos DESC, c.cid DESC) = 1),
        |m1 AS (SELECT a.cid, u.i AS pos,
        |    (SUM(CAST(floor(a.v[u.i] * 1000000) AS BIGINT))::DOUBLE / COUNT(*)::DOUBLE) / 1000000.0 AS m
        |  FROM a1 a, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
        |  GROUP BY a.cid, u.i),
        |l1 AS (SELECT cid, list(m ORDER BY pos) AS v FROM m1 GROUP BY cid),
        |cent1 AS (SELECT c.cid, COALESCE(l.v, c.v) AS v FROM cent0 c LEFT JOIN l1 l ON l.cid = c.cid),
        |a2 AS (SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.v) AS cos
        |  FROM e, cent1 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY cos DESC, c.cid DESC) = 1),
        |m2 AS (SELECT a.cid, u.i AS pos,
        |    (SUM(CAST(floor(a.v[u.i] * 1000000) AS BIGINT))::DOUBLE / COUNT(*)::DOUBLE) / 1000000.0 AS m
        |  FROM a2 a, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
        |  GROUP BY a.cid, u.i),
        |l2 AS (SELECT cid, list(m ORDER BY pos) AS v FROM m2 GROUP BY cid),
        |cent2 AS (SELECT c.cid, COALESCE(l.v, c.v) AS v FROM cent1 c LEFT JOIN l2 l ON l.cid = c.cid),
        |assign AS (SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.v) AS cos
        |  FROM e, cent2 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY cos DESC, c.cid DESC) = 1)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        |FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    // dedup_semantic's Lloyd replay + recursive transitive closure of
    // the pair graph; each group keeps its farthest-from-centroid member
    "dedup_semantic_prune" ->
      """WITH RECURSIVE e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |cent0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
        |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
        |a1 AS (SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.v) AS cos
        |  FROM e, cent0 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY cos DESC, c.cid DESC) = 1),
        |m1 AS (SELECT a.cid, u.i AS pos,
        |    (SUM(CAST(floor(a.v[u.i] * 1000000) AS BIGINT))::DOUBLE / COUNT(*)::DOUBLE) / 1000000.0 AS m
        |  FROM a1 a, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
        |  GROUP BY a.cid, u.i),
        |l1 AS (SELECT cid, list(m ORDER BY pos) AS v FROM m1 GROUP BY cid),
        |cent1 AS (SELECT c.cid, COALESCE(l.v, c.v) AS v FROM cent0 c LEFT JOIN l1 l ON l.cid = c.cid),
        |a2 AS (SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.v) AS cos
        |  FROM e, cent1 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY cos DESC, c.cid DESC) = 1),
        |m2 AS (SELECT a.cid, u.i AS pos,
        |    (SUM(CAST(floor(a.v[u.i] * 1000000) AS BIGINT))::DOUBLE / COUNT(*)::DOUBLE) / 1000000.0 AS m
        |  FROM a2 a, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
        |  GROUP BY a.cid, u.i),
        |l2 AS (SELECT cid, list(m ORDER BY pos) AS v FROM m2 GROUP BY cid),
        |cent2 AS (SELECT c.cid, COALESCE(l.v, c.v) AS v FROM cent1 c LEFT JOIN l2 l ON l.cid = c.cid),
        |assign AS (SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.v) AS cos
        |  FROM e, cent2 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY cos DESC, c.cid DESC) = 1),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.v, b.v) >= 0.4),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM p
        |          UNION ALL SELECT id_b, id_a FROM p),
        |reach(node, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e2.src, r.label FROM edges e2 JOIN reach r ON e2.dst = r.node
        |),
        |comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
        |sc AS (SELECT a.vec_id, COALESCE(c.cluster, a.vec_id) AS cluster,
        |    round(a.cos, 6) AS cent_cos
        |  FROM assign a LEFT JOIN comp c ON c.node = a.vec_id)
        |SELECT vec_id, cluster, cent_cos,
        |  (row_number() OVER (PARTITION BY cluster ORDER BY cent_cos ASC, vec_id ASC) = 1) AS keep
        |FROM sc ORDER BY vec_id""".stripMargin,

    "sim_ivf_topk_quantized" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |cent0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
        |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
        |a1 AS (SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.v) AS cos
        |  FROM e, cent0 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY cos DESC, c.cid DESC) = 1),
        |m1 AS (SELECT a.cid, u.i AS pos,
        |    (SUM(CAST(floor(a.v[u.i] * 1000000) AS BIGINT))::DOUBLE / COUNT(*)::DOUBLE) / 1000000.0 AS m
        |  FROM a1 a, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
        |  GROUP BY a.cid, u.i),
        |l1 AS (SELECT cid, list(m ORDER BY pos) AS v FROM m1 GROUP BY cid),
        |cent1 AS (SELECT c.cid, COALESCE(l.v, c.v) AS v FROM cent0 c LEFT JOIN l1 l ON l.cid = c.cid),
        |a2 AS (SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.v) AS cos
        |  FROM e, cent1 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY cos DESC, c.cid DESC) = 1),
        |m2 AS (SELECT a.cid, u.i AS pos,
        |    (SUM(CAST(floor(a.v[u.i] * 1000000) AS BIGINT))::DOUBLE / COUNT(*)::DOUBLE) / 1000000.0 AS m
        |  FROM a2 a, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
        |  GROUP BY a.cid, u.i),
        |l2 AS (SELECT cid, list(m ORDER BY pos) AS v FROM m2 GROUP BY cid),
        |cent2 AS (SELECT c.cid, COALESCE(l.v, c.v) AS v FROM cent1 c LEFT JOIN l2 l ON l.cid = c.cid),
        |scoredc AS (SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.v) AS cos
        |  FROM e, cent2 c),
        |assign AS (SELECT vec_id, v, cid FROM scoredc
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid DESC) = 1),
        |probes AS (SELECT vec_id AS query_id, v AS qv, cid FROM scoredc WHERE vec_id < 10
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid DESC) <= 4),
        |qz AS (SELECT a.vec_id, a.cid,
        |    list_transform(a.v, x -> greatest(-127.0, least(127.0,
        |      sign(x) * floor(abs(x) * (CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END) + 0.5)))) AS v8
        |  FROM (SELECT *, list_aggregate(list_transform(v, x -> abs(x)), 'max') AS mx FROM assign) a),
        |s AS (SELECT p.query_id, z.vec_id AS corpus_id,
        |    list_cosine_similarity(z.v8, p.qv) AS cos
        |  FROM qz z JOIN probes p ON z.cid = p.cid AND z.vec_id <> p.query_id)
        |SELECT query_id, CAST(row_number() OVER w AS INT) AS rank, corpus_id, round(cos, 6) AS cosine
        |FROM s
        |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "sim_ivf_topk_seed" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
        |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
        |scoredc AS (SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.v) AS cos
        |  FROM e, cent c),
        |assign AS (SELECT vec_id, v, cid FROM scoredc
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid DESC) = 1),
        |probes AS (SELECT vec_id AS query_id, v AS qv, cid FROM scoredc WHERE vec_id < 10
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid DESC) <= 4),
        |s AS (SELECT p.query_id, a.vec_id AS corpus_id,
        |    list_cosine_similarity(a.v, p.qv) AS cos
        |  FROM assign a JOIN probes p ON a.cid = p.cid AND a.vec_id <> p.query_id)
        |SELECT query_id, CAST(row_number() OVER w AS INT) AS rank, corpus_id, round(cos, 6) AS cosine
        |FROM s
        |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "sim_topk_quantized" ->
      """WITH m AS (SELECT vec_id, embedding,
        |  list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
        |  FROM embeddings),
        |s AS (SELECT vec_id, embedding, CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END AS sc FROM m),
        |qz AS (SELECT vec_id AS corpus_id,
        |  list_transform(embedding, x -> greatest(-127.0, least(127.0,
        |    sign(CAST(x AS DOUBLE)) * floor(abs(CAST(x AS DOUBLE)) * sc + 0.5)))) AS cv8
        |  FROM s),
        |q AS (SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
        |    list_aggregate(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS qn2
        |  FROM embeddings WHERE vec_id < 10),
        |scored AS (SELECT query_id, corpus_id,
        |    CASE WHEN qn2 = 0
        |      OR list_aggregate(list_transform(cv8, x -> x * x), 'sum') = 0 THEN 0.0
        |      ELSE list_cosine_similarity(cv8, qv) END AS cos
        |  FROM q, qz WHERE corpus_id <> query_id)
        |SELECT query_id, CAST(row_number() OVER w AS INT) AS rank, corpus_id, round(cos, 6) AS cosine
        |FROM scored
        |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "pipeline_ingest" ->
      """WITH base AS (SELECT doc_id, text,
        |  lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))) AS norm,
        |  doc_id % 5 = 0 AS is_batch FROM documents),
        |bw AS (SELECT doc_id, text, norm, string_split(norm, ' ') AS words FROM base WHERE is_batch),
        |sc AS (SELECT doc_id, text, norm, words,
        |  len(list_filter(words, t -> t IN ('the','and','of','to','is','in','that','it'))) AS s_en,
        |  len(list_filter(words, t -> t IN ('der','die','das','und','ist','nicht','ein','zu'))) AS s_de,
        |  len(list_filter(words, t -> t IN ('le','la','les','et','est','un','une','que'))) AS s_fr,
        |  len(list_filter(words, t -> t IN ('el','la','los','y','es','un','una','que'))) AS s_es,
        |  len(list_filter(words, t -> t IN ('的','是','了','在','我','有','和','不'))) AS s_zh
        |FROM bw),
        |m AS (SELECT *, greatest(s_en, s_de, s_fr, s_es, s_zh) AS best,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |       ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
        |  CASE WHEN len(words) = 0 THEN 0.0
        |       ELSE CAST(list_sum(list_transform(words, t -> length(t))) AS DOUBLE) / len(words) END AS mwl
        |FROM sc),
        |prof AS (SELECT doc_id,
        |  floor((least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4 +
        |        (1.0 - least(punct * 5.0, 1.0)) * 0.3 +
        |        (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) * 0.3) * 1000000 + 0.5) / 1000000 AS quality,
        |  CASE WHEN best = 0 THEN 'und'
        |       WHEN s_en = best THEN 'en' WHEN s_de = best THEN 'de'
        |       WHEN s_fr = best THEN 'fr' WHEN s_es = best THEN 'es' ELSE 'zh' END AS lang_pred
        |FROM m),
        |gated AS (SELECT doc_id, quality, lang_pred FROM prof
        |  WHERE quality >= 0.5 AND lang_pred <> 'und'),
        |cor AS (SELECT b.doc_id, b.norm, b.is_batch FROM base b WHERE NOT b.is_batch
        |  UNION ALL SELECT b.doc_id, b.norm, b.is_batch FROM base b JOIN gated g USING (doc_id)),
        |exact_drop AS (SELECT doc_id FROM cor
        |  WHERE is_batch AND md5(norm) IN (SELECT md5(norm) FROM cor WHERE NOT is_batch)),
        |cw AS (SELECT doc_id, is_batch, string_split(norm, ' ') AS words FROM cor),
        |s2 AS (SELECT doc_id, is_batch, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM cw),
        |e AS (SELECT doc_id, is_batch, len(sh) AS nsh, unnest(sh) AS shingle FROM s2 WHERE len(sh) > 0),
        |f AS (SELECT * FROM e QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000),
        |p AS (SELECT b.doc_id AS batch_id, i.doc_id AS index_id, b.nsh AS nb, i.nsh AS ni, COUNT(*) AS common
        |  FROM f b JOIN f i USING (shingle) WHERE b.is_batch AND NOT i.is_batch GROUP BY 1, 2, 3, 4),
        |near_drop AS (SELECT DISTINCT batch_id AS doc_id FROM p
        |  WHERE common / CAST(nb + ni - common AS DOUBLE) >= 0.5),
        |kept AS (SELECT g.doc_id, g.lang_pred, g.quality FROM gated g
        |  WHERE g.doc_id NOT IN (SELECT doc_id FROM exact_drop)
        |    AND g.doc_id NOT IN (SELECT doc_id FROM near_drop))
        |SELECT doc_id, lang_pred, quality,
        |  CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT k.*, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 AS b
        |      FROM kept k)
        |ORDER BY doc_id""".stripMargin,

    "pipeline_datacard" ->
      """WITH base AS (SELECT doc_id, source, text,
        |  lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))) AS norm,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words,
        |  string_split(text, chr(10)) AS lines FROM documents),
        |c AS (SELECT doc_id, source,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(words) END AS BIGINT) AS nw,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE list_sum(list_transform(words, t -> length(t))) END AS BIGINT) AS swl,
        |  CAST(len(regexp_extract_all(text, '#|\.{3}|…')) AS BIGINT) AS nsym,
        |  CAST(len(lines) AS BIGINT) AS nl,
        |  CAST(len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•]'))) AS BIGINT) AS nb,
        |  CAST(len(list_filter(lines, l -> regexp_matches(rtrim(l), '(\.{3}|…)$'))) AS BIGINT) AS ne,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) END AS BIGINT) AS na
        |FROM base),
        |gate AS (SELECT doc_id, nw AS n_words FROM c
        |  WHERE nw >= 50 AND nw <= 100000
        |    AND nw > 0 AND swl >= nw * 3 AND swl <= nw * 10
        |    AND nsym * 10 < nw AND nb * 10 < nl * 9 AND ne * 10 < nl * 3
        |    AND na * 5 >= nw * 4),
        |rb AS (SELECT unnest(list_transform(generate_series(1, len(words) - 1),
        |    i -> words[i] || ' ' || words[i + 1])) AS bg
        |  FROM base WHERE source = 'src0'),
        |big AS (SELECT bg, COUNT(*) AS c12 FROM rb GROUP BY bg),
        |rh AS (SELECT unnest(words[1:len(words) - 1]) AS w1 FROM base WHERE source = 'src0'),
        |hist AS (SELECT w1, COUNT(*) AS c1 FROM rh GROUP BY w1),
        |v AS (SELECT COUNT(DISTINCT w) AS v_size
        |  FROM (SELECT unnest(words) AS w FROM base WHERE source = 'src0')),
        |db AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(words) - 1),
        |      i -> words[i] || ' ' || words[i + 1])) AS bg FROM base)
        |  GROUP BY doc_id, bg),
        |sc AS (SELECT d.doc_id, d.cnt,
        |    CAST(round(ln((COALESCE(h.c1, 0) + v.v_size)::DOUBLE /
        |                  (COALESCE(b.c12, 0) + 1)::DOUBLE) * 1000000) AS BIGINT) AS nll
        |  FROM db d
        |  LEFT JOIN big b USING (bg)
        |  LEFT JOIN hist h ON h.w1 = string_split(d.bg, ' ')[1]
        |  CROSS JOIN v),
        |lm AS (SELECT doc_id FROM sc GROUP BY doc_id
        |  HAVING CAST(SUM(cnt * nll) AS BIGINT) // CAST(SUM(cnt) AS BIGINT) < 3550000),
        |fp AS (SELECT doc_id, md5(norm) AS fp FROM base),
        |rep AS (SELECT fp, MIN(doc_id) AS rep FROM fp GROUP BY fp),
        |surv AS (SELECT d.doc_id, d.source, g.n_words, f.fp, r.rep,
        |  ('0x' || substr(md5(CAST(r.rep AS VARCHAR)), 1, 15))::BIGINT % 10000 AS bucket
        |  FROM documents d
        |  JOIN gate g USING (doc_id) JOIN lm USING (doc_id)
        |  JOIN fp f USING (doc_id) JOIN rep r USING (fp))
        |SELECT CASE WHEN bucket < 8000 THEN 'train' WHEN bucket < 9000 THEN 'val'
        |    ELSE 'test' END AS split,
        |  source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_words) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_groups
        |FROM surv GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "pipeline_quality" ->
      """WITH base AS (SELECT doc_id, source, text,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words,
        |  string_split(text, chr(10)) AS lines FROM documents),
        |c AS (SELECT doc_id, source,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(words) END AS BIGINT) AS nw,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE list_sum(list_transform(words, t -> length(t))) END AS BIGINT) AS swl,
        |  CAST(len(regexp_extract_all(text, '#|\.{3}|…')) AS BIGINT) AS nsym,
        |  CAST(len(lines) AS BIGINT) AS nl,
        |  CAST(len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•]'))) AS BIGINT) AS nb,
        |  CAST(len(list_filter(lines, l -> regexp_matches(rtrim(l), '(\.{3}|…)$'))) AS BIGINT) AS ne,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) END AS BIGINT) AS na
        |FROM base),
        |gate AS (SELECT doc_id, nw AS n_words FROM c
        |  WHERE nw >= 50 AND nw <= 100000
        |    AND nw > 0 AND swl >= nw * 3 AND swl <= nw * 10
        |    AND nsym * 10 < nw AND nb * 10 < nl * 9 AND ne * 10 < nl * 3
        |    AND na * 5 >= nw * 4),
        |rb AS (SELECT unnest(list_transform(generate_series(1, len(words) - 1),
        |    i -> words[i] || ' ' || words[i + 1])) AS bg
        |  FROM base WHERE source = 'src0'),
        |big AS (SELECT bg, COUNT(*) AS c12 FROM rb GROUP BY bg),
        |rh AS (SELECT unnest(words[1:len(words) - 1]) AS w1 FROM base WHERE source = 'src0'),
        |hist AS (SELECT w1, COUNT(*) AS c1 FROM rh GROUP BY w1),
        |v AS (SELECT COUNT(DISTINCT w) AS v_size
        |  FROM (SELECT unnest(words) AS w FROM base WHERE source = 'src0')),
        |db AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(words) - 1),
        |      i -> words[i] || ' ' || words[i + 1])) AS bg FROM base)
        |  GROUP BY doc_id, bg),
        |sc AS (SELECT d.doc_id, d.cnt,
        |    CAST(round(ln((COALESCE(h.c1, 0) + v.v_size)::DOUBLE /
        |                  (COALESCE(b.c12, 0) + 1)::DOUBLE) * 1000000) AS BIGINT) AS nll
        |  FROM db d
        |  LEFT JOIN big b USING (bg)
        |  LEFT JOIN hist h ON h.w1 = string_split(d.bg, ' ')[1]
        |  CROSS JOIN v),
        |lm AS (SELECT doc_id,
        |  CAST(SUM(cnt * nll) AS BIGINT) // CAST(SUM(cnt) AS BIGINT) AS avg_nll_micros
        |  FROM sc GROUP BY doc_id
        |  HAVING CAST(SUM(cnt * nll) AS BIGINT) // CAST(SUM(cnt) AS BIGINT) < 3550000),
        |rep AS (SELECT MIN(doc_id) AS doc_id
        |  FROM (SELECT doc_id, md5(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g')))) AS fp
        |        FROM documents) GROUP BY fp)
        |SELECT d.doc_id, d.source, g.n_words, lm.avg_nll_micros
        |FROM documents d
        |JOIN gate g USING (doc_id) JOIN lm USING (doc_id)
        |JOIN rep USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "pipeline_curate" ->
      """WITH RECURSIVE base AS (SELECT doc_id, text,
        |  lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))) AS norm FROM documents),
        |w AS (SELECT doc_id, text, norm, string_split(norm, ' ') AS words FROM base),
        |sc AS (SELECT doc_id, text, norm, words,
        |  len(list_filter(words, t -> t IN ('the','and','of','to','is','in','that','it'))) AS s_en,
        |  len(list_filter(words, t -> t IN ('der','die','das','und','ist','nicht','ein','zu'))) AS s_de,
        |  len(list_filter(words, t -> t IN ('le','la','les','et','est','un','une','que'))) AS s_fr,
        |  len(list_filter(words, t -> t IN ('el','la','los','y','es','un','una','que'))) AS s_es,
        |  len(list_filter(words, t -> t IN ('的','是','了','在','我','有','和','不'))) AS s_zh
        |FROM w),
        |m AS (SELECT *, greatest(s_en, s_de, s_fr, s_es, s_zh) AS best,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |       ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
        |  CASE WHEN len(words) = 0 THEN 0.0
        |       ELSE CAST(list_sum(list_transform(words, t -> length(t))) AS DOUBLE) / len(words) END AS mwl
        |FROM sc),
        |prof AS (SELECT doc_id, words,
        |  floor((least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4 +
        |        (1.0 - least(punct * 5.0, 1.0)) * 0.3 +
        |        (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) * 0.3) * 1000000 + 0.5) / 1000000 AS quality,
        |  CASE WHEN best = 0 THEN 'und'
        |       WHEN s_en = best THEN 'en' WHEN s_de = best THEN 'de'
        |       WHEN s_fr = best THEN 'fr' WHEN s_es = best THEN 'es' ELSE 'zh' END AS lang_pred,
        |  md5(norm) AS fingerprint
        |FROM m),
        |gated AS (SELECT * FROM prof WHERE quality >= 0.5 AND lang_pred <> 'und'),
        |uniq AS (SELECT * FROM gated QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fingerprint)),
        |s2 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM uniq),
        |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s2 WHERE len(sh) > 0),
        |f AS (SELECT * FROM e QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 50),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS common
        |  FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4),
        |pairs AS (SELECT id_a, id_b FROM p WHERE common / (na + nb - common) >= 0.5),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(node, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e2.src, r.label FROM edges e2 JOIN reach r ON e2.dst = r.node
        |),
        |cc AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
        |drops AS (SELECT node FROM cc WHERE node <> cluster)
        |SELECT u.doc_id, u.lang_pred, u.quality FROM uniq u
        |LEFT JOIN drops d ON u.doc_id = d.node WHERE d.node IS NULL
        |ORDER BY u.doc_id""".stripMargin,

    "stats_profile" ->
      """SELECT 'o_custkey' AS column_name, COUNT(*) AS n_rows,
        |  COUNT(*) - COUNT(o_custkey) AS n_nulls, COUNT(DISTINCT o_custkey) AS n_distinct,
        |  CAST(MIN(o_custkey) AS VARCHAR) AS min_val, CAST(MAX(o_custkey) AS VARCHAR) AS max_val
        |FROM orders
        |UNION ALL SELECT 'o_orderkey', COUNT(*), COUNT(*) - COUNT(o_orderkey),
        |  COUNT(DISTINCT o_orderkey), CAST(MIN(o_orderkey) AS VARCHAR), CAST(MAX(o_orderkey) AS VARCHAR) FROM orders
        |UNION ALL SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
        |  COUNT(DISTINCT o_orderpriority), CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR) FROM orders
        |UNION ALL SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
        |  COUNT(DISTINCT o_orderstatus), CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR) FROM orders
        |ORDER BY column_name""".stripMargin,

    "text_profile" ->
      """WITH base AS (SELECT doc_id, text,
        |  lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))) AS norm
        |  FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT doc_id, text, norm, string_split(norm, ' ') AS words FROM base),
        |sc AS (SELECT doc_id, text, norm, words,
        |  len(list_filter(words, t -> t IN ('the','and','of','to','is','in','that','it'))) AS s_en,
        |  len(list_filter(words, t -> t IN ('der','die','das','und','ist','nicht','ein','zu'))) AS s_de,
        |  len(list_filter(words, t -> t IN ('le','la','les','et','est','un','une','que'))) AS s_fr,
        |  len(list_filter(words, t -> t IN ('el','la','los','y','es','un','una','que'))) AS s_es,
        |  len(list_filter(words, t -> t IN ('的','是','了','在','我','有','和','不'))) AS s_zh
        |FROM w),
        |m AS (SELECT *, greatest(s_en, s_de, s_fr, s_es, s_zh) AS best,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |       ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
        |  CASE WHEN len(words) = 0 THEN 0.0
        |       ELSE CAST(list_sum(list_transform(words, t -> length(t))) AS DOUBLE) / len(words) END AS mwl
        |FROM sc)
        |SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0 ELSE CAST(len(words) AS INT) END AS n_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s\x0b]')) AS INT) AS n_subwords,
        |  CAST(length(text) AS INT) AS n_chars_m,
        |  floor(punct * 1000000 + 0.5) / 1000000 AS punct_ratio,
        |  floor(mwl * 1000000 + 0.5) / 1000000 AS mean_word_len,
        |  floor((least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4 +
        |        (1.0 - least(punct * 5.0, 1.0)) * 0.3 +
        |        (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) * 0.3) * 1000000 + 0.5) / 1000000 AS quality,
        |  CASE WHEN best = 0 THEN 'und'
        |       WHEN s_en = best THEN 'en' WHEN s_de = best THEN 'de'
        |       WHEN s_fr = best THEN 'fr' WHEN s_es = best THEN 'es' ELSE 'zh' END AS lang_pred,
        |  md5(norm) AS fingerprint
        |FROM m ORDER BY doc_id""".stripMargin,

    "sample_quality_prune" ->
      """WITH base AS (SELECT doc_id, source, text,
        |  lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))) AS norm
        |  FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT doc_id, source, text, string_split(norm, ' ') AS words FROM base),
        |m AS (SELECT doc_id, source, text, words,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |       ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
        |  CASE WHEN len(words) = 0 THEN 0.0
        |       ELSE CAST(list_sum(list_transform(words, t -> length(t))) AS DOUBLE) / len(words) END AS mwl
        |FROM w),
        |q AS (SELECT doc_id, source,
        |  CAST(floor((least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4 +
        |        (1.0 - least(punct * 5.0, 1.0)) * 0.3 +
        |        (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) * 0.3)
        |    * 1000000 + 0.5) AS BIGINT) AS q_micros
        |FROM m),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY q_micros, doc_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY source) AS n FROM q),
        |med AS (SELECT source,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN q_micros END) AS med
        |  FROM r GROUP BY source)
        |SELECT q.doc_id, q.source, q.q_micros, med.med AS source_median_micros
        |FROM q JOIN med USING (source) WHERE q.q_micros >= med.med
        |ORDER BY q.doc_id""".stripMargin,

    "sample_dsir" ->
      """WITH base AS (SELECT doc_id, source,
        |  list_filter(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' '),
        |    w -> w <> '') AS words
        |  FROM documents WHERE text IS NOT NULL),
        |tw AS (SELECT unnest(words) AS w FROM base WHERE source = 'src0'),
        |rw AS (SELECT unnest(words) AS w FROM base),
        |tc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS ct FROM tw GROUP BY w),
        |rc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cr FROM rw GROUP BY w),
        |model AS (SELECT rc.w,
        |  CAST(round(ln(COALESCE(tc.ct, 0) + 1) * 1000000) AS BIGINT)
        |    - CAST(round(ln(rc.cr + 1) * 1000000) AS BIGINT) AS dw_micros
        |  FROM rc LEFT JOIN tc USING (w)),
        |nt AS (SELECT CAST(SUM(ct) AS BIGINT) AS n_t FROM tc),
        |nrv AS (SELECT CAST(SUM(cr) AS BIGINT) AS n_r, CAST(COUNT(*) AS BIGINT) AS v_size FROM rc),
        |b AS (SELECT CAST(round(ln(n_r + v_size) * 1000000) AS BIGINT)
        |    - CAST(round(ln(n_t + v_size) * 1000000) AS BIGINT) AS base_micros
        |  FROM nrv, nt),
        |dw AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS cnt FROM
        |  (SELECT doc_id, unnest(words) AS w FROM base) GROUP BY doc_id, w),
        |agg AS (SELECT dw.doc_id, CAST(SUM(dw.cnt) AS BIGINT) AS t_tokens,
        |  CAST(SUM(dw.cnt * m.dw_micros) AS BIGINT) AS seen_micros
        |  FROM dw JOIN model m USING (w) GROUP BY dw.doc_id)
        |SELECT doc_id, t_tokens,
        |  seen_micros + t_tokens * b.base_micros AS weight_micros
        |FROM agg, b
        |ORDER BY weight_micros DESC, doc_id LIMIT 200""".stripMargin,

    "text_classify_nb" ->
      """WITH base AS (SELECT doc_id, lang,
        |  list_filter(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' '),
        |    w -> w <> '') AS words
        |  FROM documents WHERE text IS NOT NULL),
        |tr AS (SELECT * FROM base WHERE doc_id % 5 <> 0),
        |sc AS (SELECT * FROM base WHERE doc_id % 5 = 0),
        |trw AS (SELECT lang AS cls, unnest(words) AS w FROM tr),
        |wc AS (SELECT cls, w, CAST(COUNT(*) AS BIGINT) AS cwc FROM trw GROUP BY cls, w),
        |ct AS (SELECT cls, CAST(SUM(cwc) AS BIGINT) AS n_c FROM wc GROUP BY cls),
        |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v_size FROM wc),
        |pri AS (SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS d_c FROM tr GROUP BY lang),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS d_tot FROM tr),
        |consts AS (SELECT p.cls,
        |  CAST(round(ln(d_c) * 1000000) AS BIGINT)
        |    - CAST(round(ln(d_tot) * 1000000) AS BIGINT) AS prior_micros,
        |  CAST(round(ln(n_c + v_size) * 1000000) AS BIGINT) AS lnden_micros
        |  FROM pri p JOIN ct USING (cls), tot, v),
        |dwx AS (SELECT doc_id, unnest(words) AS w FROM sc),
        |dw AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS cnt FROM dwx GROUP BY doc_id, w),
        |dt AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS t_tokens FROM dw GROUP BY doc_id),
        |model AS (SELECT cls, w, CAST(round(ln(cwc + 1) * 1000000) AS BIGINT) AS ln1p FROM wc),
        |contrib AS (SELECT dw.doc_id, m.cls, CAST(SUM(dw.cnt * m.ln1p) AS BIGINT) AS seen
        |  FROM dw JOIN model m USING (w) GROUP BY dw.doc_id, m.cls),
        |scored AS (SELECT dt.doc_id, c.cls,
        |  c.prior_micros + COALESCE(k.seen, 0) - dt.t_tokens * c.lnden_micros AS score_micros
        |  FROM dt CROSS JOIN consts c
        |  LEFT JOIN contrib k ON k.doc_id = dt.doc_id AND k.cls = c.cls),
        |best AS (SELECT doc_id, cls, score_micros,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY score_micros DESC, cls) AS rk
        |  FROM scored)
        |SELECT b.doc_id, s.lang AS label, b.cls AS pred,
        |  CAST(b.score_micros AS BIGINT) AS score_micros,
        |  CAST(b.cls = s.lang AS INT) AS correct
        |FROM best b JOIN sc s USING (doc_id) WHERE rk = 1 ORDER BY b.doc_id""".stripMargin,

    "contamination_spans" ->
      """WITH w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents WHERE text IS NOT NULL),
        |tg AS (SELECT DISTINCT array_to_string(words[u.i+1:u.i+5], ' ') AS ng
        |  FROM w, LATERAL (SELECT unnest(range(0, GREATEST(len(words) - 4, 0))) AS i) u
        |  WHERE doc_id % 10 <> 0),
        |eg AS (SELECT doc_id, CAST(u.i AS INT) AS pos, array_to_string(words[u.i+1:u.i+5], ' ') AS ng
        |  FROM w, LATERAL (SELECT unnest(range(0, GREATEST(len(words) - 4, 0))) AS i) u
        |  WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id, pos FROM eg WHERE ng IN (SELECT ng FROM tg)),
        |i AS (SELECT doc_id, pos, CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
        |    THEN 1 ELSE 0 END AS brk FROM d),
        |s AS (SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM i)
        |SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start, CAST(MAX(pos) + 5 AS INT) AS span_end
        |FROM s GROUP BY doc_id, sid ORDER BY doc_id, span_start""".stripMargin,

    "text_repetition_gopher" ->
      """WITH base AS (SELECT doc_id, text,
        |  lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))) AS norm
        |  FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT doc_id, text, norm, string_split(norm, ' ') AS words FROM base),
        |g AS (
        |  SELECT doc_id, 2 AS n, unnest(CASE WHEN len(words) < 2 THEN CAST([] AS VARCHAR[])
        |    ELSE list_transform(range(1, len(words)), i -> array_to_string(words[i:i+1], ' ')) END) AS gram FROM w
        |  UNION ALL
        |  SELECT doc_id, 3 AS n, unnest(CASE WHEN len(words) < 3 THEN CAST([] AS VARCHAR[])
        |    ELSE list_transform(range(1, len(words) - 1), i -> array_to_string(words[i:i+2], ' ')) END) AS gram FROM w
        |  UNION ALL
        |  SELECT doc_id, 4 AS n, unnest(CASE WHEN len(words) < 4 THEN CAST([] AS VARCHAR[])
        |    ELSE list_transform(range(1, len(words) - 2), i -> array_to_string(words[i:i+3], ' ')) END) AS gram FROM w),
        |gc AS (SELECT doc_id, n, gram, COUNT(*) AS c FROM g GROUP BY doc_id, n, gram),
        |top AS (SELECT doc_id, n, CAST(c * length(gram) AS BIGINT) AS covered,
        |  row_number() OVER (PARTITION BY doc_id, n ORDER BY c DESC, gram) AS rk FROM gc),
        |t1 AS (SELECT doc_id,
        |  MAX(CASE WHEN n = 2 THEN covered END) AS cov2,
        |  MAX(CASE WHEN n = 3 THEN covered END) AS cov3,
        |  MAX(CASE WHEN n = 4 THEN covered END) AS cov4
        |  FROM top WHERE rk = 1 GROUP BY doc_id),
        |ln_ AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM base),
        |lc AS (SELECT doc_id, line, COUNT(*) AS c FROM ln_ GROUP BY doc_id, line),
        |dl AS (SELECT doc_id, CAST(SUM(c * length(line)) AS BIGINT) AS dupcov
        |  FROM lc WHERE c >= 2 GROUP BY doc_id),
        |lens AS (SELECT doc_id, CAST(length(norm) AS BIGINT) AS lnm,
        |  CAST(length(text) AS BIGINT) AS lr FROM base)
        |SELECT l.doc_id,
        |  CASE WHEN lnm = 0 THEN 0 ELSE (COALESCE(cov2, 0) * 2000000 + lnm) // (lnm * 2) END AS top2_micros,
        |  CASE WHEN lnm = 0 THEN 0 ELSE (COALESCE(cov3, 0) * 2000000 + lnm) // (lnm * 2) END AS top3_micros,
        |  CASE WHEN lnm = 0 THEN 0 ELSE (COALESCE(cov4, 0) * 2000000 + lnm) // (lnm * 2) END AS top4_micros,
        |  CASE WHEN lr = 0 THEN 0 ELSE (COALESCE(dupcov, 0) * 2000000 + lr) // (lr * 2) END AS dupline_micros
        |FROM lens l LEFT JOIN t1 USING (doc_id) LEFT JOIN dl USING (doc_id)
        |ORDER BY l.doc_id""".stripMargin,

    "text_quality_gopher" ->
      """WITH base AS (SELECT doc_id, text,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words,
        |  string_split(text, chr(10)) AS lines
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id, words,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(words) END AS BIGINT) AS nw,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE list_sum(list_transform(words, t -> length(t))) END AS BIGINT) AS swl,
        |  CAST(len(regexp_extract_all(text, '#|\.{3}|…')) AS BIGINT) AS nsym,
        |  CAST(len(lines) AS BIGINT) AS nl,
        |  CAST(len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•]'))) AS BIGINT) AS nb,
        |  CAST(len(list_filter(lines, l -> regexp_matches(rtrim(l), '(\.{3}|…)$'))) AS BIGINT) AS ne,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) END AS BIGINT) AS na,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(list_filter(['the','be','to','of','and','that','have','with'],
        |      w -> list_contains(words, w))) END AS BIGINT) AS nrs
        |FROM base)
        |SELECT doc_id, nw AS n_words,
        |  CASE WHEN nw = 0 THEN 0 ELSE (swl * 2000000 + nw) // (nw * 2) END AS mwl_micros,
        |  CASE WHEN nw = 0 THEN 0 ELSE (nsym * 2000000 + nw) // (nw * 2) END AS sym_micros,
        |  CASE WHEN nl = 0 THEN 0 ELSE (nb * 2000000 + nl) // (nl * 2) END AS bullet_micros,
        |  CASE WHEN nl = 0 THEN 0 ELSE (ne * 2000000 + nl) // (nl * 2) END AS ellipsis_micros,
        |  CASE WHEN nw = 0 THEN 0 ELSE (na * 2000000 + nw) // (nw * 2) END AS alpha_micros,
        |  nrs AS n_req_stop,
        |  CAST(nw >= 50 AND nw <= 100000 AS INT) AS r_words,
        |  CAST(nw > 0 AND swl >= nw * 3 AND swl <= nw * 10 AS INT) AS r_mwl,
        |  CAST(nsym * 10 < nw AS INT) AS r_sym,
        |  CAST(nb * 10 < nl * 9 AS INT) AS r_bullet,
        |  CAST(ne * 10 < nl * 3 AS INT) AS r_ellipsis,
        |  CAST(nw > 0 AND na * 5 >= nw * 4 AS INT) AS r_alpha,
        |  CAST(nrs >= 2 AS INT) AS r_stop,
        |  CAST(nw >= 50 AND nw <= 100000 AS INT) * CAST(nw > 0 AND swl >= nw * 3 AND swl <= nw * 10 AS INT)
        |    * CAST(nsym * 10 < nw AS INT) * CAST(nb * 10 < nl * 9 AS INT)
        |    * CAST(ne * 10 < nl * 3 AS INT) * CAST(nw > 0 AND na * 5 >= nw * 4 AS INT)
        |    * CAST(nrs >= 2 AS INT) AS passes
        |FROM c ORDER BY doc_id""".stripMargin,

    "text_rolling_hash" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' '),
        |        t -> ('0x' || substr(md5(t), 1, 15))::BIGINT)),
        |    (acc, t) -> (acc * 1000003 + t) % 2147483647) AS rhash
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,

    "sql_surface" ->
      """WITH base AS (SELECT doc_id, text,
        |  lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))) AS norm FROM documents),
        |w AS (SELECT doc_id, text, norm, string_split(norm, ' ') AS words FROM base),
        |sc AS (SELECT doc_id, text, words,
        |  len(list_filter(words, t -> t IN ('the','and','of','to','is','in','that','it'))) AS s_en,
        |  len(list_filter(words, t -> t IN ('der','die','das','und','ist','nicht','ein','zu'))) AS s_de,
        |  len(list_filter(words, t -> t IN ('le','la','les','et','est','un','une','que'))) AS s_fr,
        |  len(list_filter(words, t -> t IN ('el','la','los','y','es','un','una','que'))) AS s_es,
        |  len(list_filter(words, t -> t IN ('的','是','了','在','我','有','和','不'))) AS s_zh
        |FROM w),
        |m AS (SELECT *, greatest(s_en, s_de, s_fr, s_es, s_zh) AS best,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |       ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
        |  CASE WHEN len(words) = 0 THEN 0.0
        |       ELSE CAST(list_sum(list_transform(words, t -> length(t))) AS DOUBLE) / len(words) END AS mwl
        |FROM sc)
        |SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0 ELSE CAST(len(words) AS INT) END AS n_tokens,
        |  floor((least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4 +
        |        (1.0 - least(punct * 5.0, 1.0)) * 0.3 +
        |        (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) * 0.3) * 1000000 + 0.5) / 1000000 AS quality,
        |  CASE WHEN best = 0 THEN 'und'
        |       WHEN s_en = best THEN 'en' WHEN s_de = best THEN 'de'
        |       WHEN s_fr = best THEN 'fr' WHEN s_es = best THEN 'es' ELSE 'zh' END AS lang_pred,
        |  CAST(len(list_distinct(list_transform(range(1, len(words) - 1),
        |    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS INT) AS n_shingles
        |FROM m ORDER BY doc_id""".stripMargin,

    "stats_corr" ->
      """WITH t0 AS (SELECT source, n_chars,
        |  CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |    ELSE len(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ')) END AS toks
        |  FROM documents),
        |m AS (SELECT source, COUNT(*) AS n, SUM(n_chars) AS sx, SUM(toks) AS sy,
        |  SUM(n_chars * toks) AS sxy, SUM(n_chars * n_chars) AS sxx,
        |  SUM(CAST(toks AS BIGINT) * toks) AS syy
        |  FROM t0 GROUP BY source)
        |SELECT source,
        |  round(CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0 THEN NULL
        |    ELSE CAST(n*sxy - sx*sy AS DOUBLE) / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
        |  END, 6) AS corr_chars_tokens
        |FROM m ORDER BY source""".stripMargin,

    "corpus_pivot" ->
      """SELECT source,
        |  CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
        |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
        |  CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
        |  CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
        |  CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "corpus_rollup" ->
      """SELECT source, lang, CAST(GROUPING(source, lang) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY ROLLUP(source, lang)
        |ORDER BY gid, source NULLS LAST, lang NULLS LAST""".stripMargin,

    "corpus_report" ->
      """WITH base AS (SELECT doc_id, source, text,
        |  lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))) AS norm
        |  FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT doc_id, source, text, norm, string_split(norm, ' ') AS words FROM base),
        |sc AS (SELECT doc_id, source, text, norm, words,
        |  len(list_filter(words, t -> t IN ('the','and','of','to','is','in','that','it'))) AS s_en,
        |  len(list_filter(words, t -> t IN ('der','die','das','und','ist','nicht','ein','zu'))) AS s_de,
        |  len(list_filter(words, t -> t IN ('le','la','les','et','est','un','une','que'))) AS s_fr,
        |  len(list_filter(words, t -> t IN ('el','la','los','y','es','un','una','que'))) AS s_es,
        |  len(list_filter(words, t -> t IN ('的','是','了','在','我','有','和','不'))) AS s_zh
        |FROM w),
        |m AS (SELECT *, greatest(s_en, s_de, s_fr, s_es, s_zh) AS best,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |       ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
        |  CASE WHEN len(words) = 0 THEN 0.0
        |       ELSE CAST(list_sum(list_transform(words, t -> length(t))) AS DOUBLE) / len(words) END AS mwl
        |FROM sc),
        |prof AS (SELECT doc_id, source,
        |  CASE WHEN length(trim(text)) = 0 THEN 0 ELSE CAST(len(words) AS INT) END AS n_tokens,
        |  CAST(floor((least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4 +
        |        (1.0 - least(punct * 5.0, 1.0)) * 0.3 +
        |        (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) * 0.3)
        |    * 1000000 + 0.5) AS BIGINT) AS q_micros,
        |  CASE WHEN best = 0 THEN 'und'
        |       WHEN s_en = best THEN 'en' WHEN s_de = best THEN 'de'
        |       WHEN s_fr = best THEN 'fr' WHEN s_es = best THEN 'es' ELSE 'zh' END AS lang_pred,
        |  md5(norm) AS fingerprint
        |FROM m)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST((2 * CAST(SUM(q_micros) AS HUGEINT) + COUNT(*))
        |    // (2 * COUNT(*)) AS BIGINT) AS avg_quality_micros,
        |  CAST(SUM(CASE WHEN lang_pred = 'und' THEN 1 ELSE 0 END) AS BIGINT) AS n_und,
        |  CAST((2 * CAST(SUM(n_tokens) AS HUGEINT) * 1000000 + COUNT(*))
        |    // (2 * COUNT(*)) AS BIGINT) AS avg_tokens_micros,
        |  COUNT(*) - COUNT(DISTINCT fingerprint) AS n_exact_dups
        |FROM prof GROUP BY source ORDER BY source""".stripMargin,

    "stats_histogram" ->
      """WITH t AS (SELECT CASE WHEN length(trim(text)) = 0 THEN 0
        |  ELSE CAST(len(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ')) AS INT) END AS v
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (SELECT CASE WHEN v < 0 THEN -1 WHEN v >= 100 THEN 10
        |  ELSE CAST(floor(v / 10.0) AS INT) END AS bin FROM t)
        |SELECT bin, COUNT(*) AS n,
        |  CASE WHEN bin = -1 THEN '-infinity'::DOUBLE ELSE 0.0 + bin * 10.0 END AS bin_lo,
        |  CASE WHEN bin = 10 THEN 'infinity'::DOUBLE ELSE 0.0 + (bin + 1) * 10.0 END AS bin_hi
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "text_repetition" ->
      """WITH w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words,
        |  CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ')) END AS nt
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (SELECT doc_id, words, nt,
        |  list_distinct(list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i+1])) AS big
        |  FROM w)
        |SELECT doc_id,
        |  round(CASE WHEN nt <= 0 THEN 0.0
        |    ELSE 1.0 - CAST(len(list_distinct(list_filter(words, t -> t <> ''))) AS DOUBLE) / nt END, 6) AS dup_word_frac,
        |  round(CASE WHEN nt - 1 <= 0 THEN 0.0
        |    ELSE 1.0 - CAST(len(big) AS DOUBLE) / (nt - 1) END, 6) AS dup_bigram_frac
        |FROM b ORDER BY doc_id""".stripMargin,

    "dedup_paragraph" ->
      """WITH w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words FROM documents),
        |p AS (SELECT doc_id, CAST(u.i AS INT) AS para_idx,
        |  md5(array_to_string(words[u.i*10+1 : u.i*10+10], ' ')) AS para_hash
        |  FROM w, LATERAL (SELECT unnest(range(0,
        |    CAST(CEIL(len(words) / 10.0) AS BIGINT))) AS i) u
        |  WHERE len(words) > 0)
        |SELECT doc_id, para_idx, para_hash,
        |  CAST(COUNT(*) OVER (PARTITION BY para_hash) AS BIGINT) AS n_copies,
        |  ROW_NUMBER() OVER (PARTITION BY para_hash ORDER BY doc_id, para_idx) = 1 AS keep
        |FROM p ORDER BY doc_id, para_idx""".stripMargin,

    "stats_quantiles" ->
      """WITH r AS (SELECT source, n_chars,
        |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY source) AS n FROM documents
        |  WHERE n_chars IS NOT NULL)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  MAX(CASE WHEN rn = CEIL(n * 0.25) THEN n_chars END) AS p25,
        |  MAX(CASE WHEN rn = CEIL(n * 0.5) THEN n_chars END) AS p50,
        |  MAX(CASE WHEN rn = CEIL(n * 0.9) THEN n_chars END) AS p90,
        |  MAX(CASE WHEN rn = CEIL(n * 0.99) THEN n_chars END) AS p99
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "text_chunk" ->
      """WITH w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
        |  array_to_string(words[u.i*40+1 : u.i*40+50], ' ') AS chunk
        |  FROM w, LATERAL (SELECT unnest(range(0,
        |    1 + CAST(CEIL(GREATEST(0, len(words) - 50) / 40.0) AS BIGINT))) AS i) u)
        |SELECT doc_id, chunk_idx, chunk,
        |  CAST(CASE WHEN chunk = '' THEN 0 ELSE len(string_split(chunk, ' ')) END AS INT) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "corpus_diff" ->
      """WITH o AS (SELECT doc_id,
        |  COALESCE(md5(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g')))), 'null') AS old_hash
        |  FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id,
        |  COALESCE(md5(lower(trim(regexp_replace(
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END, '[\s\x0b]+', ' ', 'g')))), 'null') AS new_hash
        |  FROM documents WHERE doc_id % 3 <> 0)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN old_hash = new_hash THEN 'unchanged'
        |       ELSE 'modified' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    // both span queries replay the hash-bucketed Spark pipeline on the
    // window STRINGS (the hashes never reach the output, so the oracle
    // needs no hash parity — a 64-bit collision would surface here)
    "text_dup_spans" ->
      """WITH w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, CAST(u.i AS INT) AS pos, array_to_string(words[u.i+1:u.i+10], ' ') AS ng
        |  FROM w, LATERAL (SELECT unnest(range(0, GREATEST(len(words) - 9, 0))) AS i) u),
        |d AS (SELECT doc_id, pos FROM
        |  (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY ng) AS cnt FROM g) WHERE cnt >= 2),
        |i AS (SELECT doc_id, pos, CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 10
        |    THEN 1 ELSE 0 END AS brk FROM d),
        |s AS (SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM i)
        |SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start, CAST(MAX(pos) + 10 AS INT) AS span_end
        |FROM s GROUP BY doc_id, sid ORDER BY doc_id, span_start""".stripMargin,

    "text_span_trim" ->
      """WITH w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, CAST(u.i AS INT) AS pos, array_to_string(words[u.i+1:u.i+10], ' ') AS ng
        |  FROM w, LATERAL (SELECT unnest(range(0, GREATEST(len(words) - 9, 0))) AS i) u),
        |d AS (SELECT doc_id, pos FROM
        |  (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY ng) AS cnt FROM g) WHERE cnt >= 2),
        |i AS (SELECT doc_id, pos, CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 10
        |    THEN 1 ELSE 0 END AS brk FROM d),
        |s AS (SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM i),
        |spans AS (SELECT doc_id, MIN(pos) AS ss, MAX(pos) + 10 AS se FROM s GROUP BY doc_id, sid),
        |keep AS (SELECT w.doc_id, u.i AS pos, words[u.i + 1] AS word
        |  FROM w, LATERAL (SELECT unnest(range(len(words))) AS i) u
        |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
        |    WHERE sp.doc_id = w.doc_id AND u.i >= sp.ss AND u.i < sp.se)),
        |agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text_trimmed
        |  FROM keep GROUP BY doc_id)
        |SELECT w.doc_id, COALESCE(agg.text_trimmed, '') AS text_trimmed
        |FROM w LEFT JOIN agg ON w.doc_id = agg.doc_id
        |ORDER BY w.doc_id""".stripMargin,

    "text_tfidf" ->
      """WITH w AS (SELECT doc_id,
        |  unnest(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY doc_id, term),
        |d AS (SELECT doc_id, term, tf, COUNT(*) OVER (PARTITION BY term) AS df FROM tf),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL),
        |s AS (SELECT doc_id, term, tf, df,
        |  tf * CAST(round(ln(CAST(n_docs AS DOUBLE) / df) * 1000000) AS BIGINT) AS score_micros
        |  FROM d, n),
        |r AS (SELECT doc_id, term, tf, df, score_micros, ROW_NUMBER() OVER
        |  (PARTITION BY doc_id ORDER BY score_micros DESC, term) AS rk FROM s)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score_micros
        |FROM r WHERE rk <= 3 ORDER BY doc_id, score_micros DESC, term""".stripMargin,

    "pipeline_refine" ->
      // the trim oracle's CTE chain, then Spark's tokenCount gate
      // (empty -> 0) and the context-window chunking replay; trimmed
      // text is already normalized, so the chunk stage re-splits as-is
      """WITH w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, CAST(u.i AS INT) AS pos, array_to_string(words[u.i+1:u.i+10], ' ') AS ng
        |  FROM w, LATERAL (SELECT unnest(range(0, GREATEST(len(words) - 9, 0))) AS i) u),
        |d AS (SELECT doc_id, pos FROM
        |  (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY ng) AS cnt FROM g) WHERE cnt >= 2),
        |i AS (SELECT doc_id, pos, CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 10
        |    THEN 1 ELSE 0 END AS brk FROM d),
        |s AS (SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM i),
        |spans AS (SELECT doc_id, MIN(pos) AS ss, MAX(pos) + 10 AS se FROM s GROUP BY doc_id, sid),
        |kept AS (SELECT w.doc_id, u.i AS pos, words[u.i + 1] AS word
        |  FROM w, LATERAL (SELECT unnest(range(len(words))) AS i) u
        |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
        |    WHERE sp.doc_id = w.doc_id AND u.i >= sp.ss AND u.i < sp.se)),
        |agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS t2
        |  FROM kept GROUP BY doc_id),
        |tr AS (SELECT w.doc_id, COALESCE(agg.t2, '') AS t2
        |  FROM w LEFT JOIN agg ON w.doc_id = agg.doc_id),
        |gated AS (SELECT doc_id, string_split(t2, ' ') AS words2 FROM tr
        |  WHERE CASE WHEN trim(t2) = '' THEN 0 ELSE len(string_split(t2, ' ')) END >= 10),
        |c AS (SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
        |  array_to_string(words2[u.i*40+1 : u.i*40+50], ' ') AS chunk
        |  FROM gated, LATERAL (SELECT unnest(range(0,
        |    1 + CAST(CEIL(GREATEST(0, len(words2) - 50) / 40.0) AS BIGINT))) AS i) u)
        |SELECT doc_id, chunk_idx, chunk,
        |  CAST(CASE WHEN chunk = '' THEN 0 ELSE len(string_split(chunk, ' ')) END AS INT) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "tokenizer_bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |v AS (SELECT w, COUNT(*) AS freq FROM w WHERE len(w) >= 2 GROUP BY w),
        |p AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> substr(w, CAST(i AS INTEGER), 2))) AS pair, freq FROM v)
        |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_sites, CAST(SUM(freq) AS BIGINT) AS total
        |FROM p GROUP BY pair ORDER BY total DESC, pair LIMIT 50""".stripMargin,

    // bigram Laplace LM trained on src0; -ln p in integer micros, exact
    // integer sums and floor division mirror the Spark derivation
    "text_lm_score" ->
      """WITH tok AS (SELECT doc_id, source,
        |    string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |rb AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS bg
        |  FROM tok WHERE source = 'src0'),
        |big AS (SELECT bg, COUNT(*) AS c12 FROM rb GROUP BY bg),
        |rh AS (SELECT unnest(toks[1:len(toks) - 1]) AS w1 FROM tok WHERE source = 'src0'),
        |hist AS (SELECT w1, COUNT(*) AS c1 FROM rh GROUP BY w1),
        |v AS (SELECT COUNT(DISTINCT w) AS v_size
        |  FROM (SELECT unnest(toks) AS w FROM tok WHERE source = 'src0')),
        |db AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM tok)
        |  GROUP BY doc_id, bg),
        |s AS (SELECT d.doc_id, d.cnt,
        |    CAST(round(ln((COALESCE(h.c1, 0) + v.v_size)::DOUBLE /
        |                  (COALESCE(b.c12, 0) + 1)::DOUBLE) * 1000000) AS BIGINT) AS nll
        |  FROM db d
        |  LEFT JOIN big b USING (bg)
        |  LEFT JOIN hist h ON h.w1 = string_split(d.bg, ' ')[1]
        |  CROSS JOIN v)
        |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(cnt * nll) AS BIGINT) AS nll_sum_micros,
        |  CAST(SUM(cnt * nll) AS BIGINT) // CAST(SUM(cnt) AS BIGINT) AS avg_nll_micros
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // BM25 pool (query-by-example over each query doc's own tokens) +
    // cosine pool (the sim_topk arithmetic incl. the cosine(0,.)=0
    // guard), RRF-fused with integer 10^6 // (60+rank) contributions;
    // rank 0 = absent-from-pool sentinel, all output ranks BIGINT
    "sim_hybrid_rrf" -> (hybridOraclePrefix(10) + hybridOracleFinal + hybridOracleSelect),

    // hybrid fusion (3 queries) -> fused top-10 pool -> MMR stages over
    // exact micro-L2 (em) -> context windows from the SAME tok CTE the
    // BM25 side tokenized with
    "pipeline_rag" -> (hybridOraclePrefix(3) + hybridOracleFinal +
      s""",em AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS mv
         |  FROM embeddings),
         |pool0 AS (SELECT query_id, corpus_id FROM sc2
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY rrf_micros DESC, corpus_id ASC) <= 10),
         |pool AS (SELECT p.query_id, p.corpus_id, ${sqlD2("eq", "ec")} AS d2q
         |  FROM pool0 p
         |  JOIN em eq ON eq.vec_id = p.query_id
         |  JOIN em ec ON ec.vec_id = p.corpus_id),
         |pw AS (SELECT a.query_id, a.corpus_id AS cand, b.corpus_id AS sel, ${sqlD2("ea", "eb")} AS d2p
         |  FROM pool a JOIN pool b ON a.query_id = b.query_id AND a.corpus_id <> b.corpus_id
         |  JOIN em ea ON ea.vec_id = a.corpus_id
         |  JOIN em eb ON eb.vec_id = b.corpus_id)""".stripMargin +
      mmrStagesSql(3) +
      """,
        |selw AS (SELECT s.query_id, s.rank, s.corpus_id, t.toks AS words
        |  FROM sel3 s JOIN tok t ON t.doc_id = s.corpus_id),
        |cw AS (SELECT query_id, rank, corpus_id, CAST(u.i AS INT) AS chunk_idx,
        |    array_to_string(words[u.i*5+1 : u.i*5+10], ' ') AS chunk
        |  FROM selw, LATERAL (SELECT unnest(range(0,
        |    1 + CAST(CEIL(GREATEST(0, len(words) - 10) / 5.0) AS BIGINT))) AS i) u)
        |SELECT query_id, CAST(rank AS INT) AS rank, corpus_id, chunk_idx, chunk,
        |  CAST(CASE WHEN chunk = '' THEN 0 ELSE len(string_split(chunk, ' ')) END AS INT) AS n_tokens
        |FROM cw ORDER BY query_id, rank, chunk_idx""".stripMargin),

    // the final HUGEINT->DOUBLE goes through VARCHAR: DuckDB's direct
    // integer->double cast TRUNCATES above 2^53 while Spark's
    // Decimal.toDouble is correctly rounded — string->double is
    // correctly rounded in both (1-ULP fuzz catch, seed 7)
    // coarse chain (c*, m=1 over the full 64 dims) assigns lists; the
    // fine chain (f*, m=8) supplies codes; queries probe their 4
    // nearest coarse centroids and ADC only inside those lists
    "sim_ivf_pq_topk" -> ivfPqOracleSql,

    // the stored-index probe must reproduce the one-shot plan exactly
    "sim_ivfpq_index_probe" -> ivfPqOracleSql,

    // the same tagged train chain at m=1, ks=8; inertia sums the
    // assigned HUGEINT distances (varchar-mediated double cast)
    "sim_kmeans_clusters" -> (pqMicroE + pqTrainCtes("c", 1, 64, 8) +
      """,
        |a AS (SELECT co.vec_id, co.cid, d.d2
        |  FROM ccodes co JOIN cd1 d
        |    ON d.vec_id = co.vec_id AND d.cid = co.cid AND d.sub = co.sub),
        |t AS (SELECT COUNT(*) AS total FROM a)
        |SELECT CAST(cid AS INT) AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  CAST(COUNT(*) * 1000000 // total AS BIGINT) AS share_micros,
        |  CAST(CAST(SUM(d2) AS VARCHAR) AS DOUBLE) AS inertia
        |FROM a CROSS JOIN t GROUP BY cid, total ORDER BY cluster_id""".stripMargin),

    "sim_pq_topk" -> (pqOraclePrefix +
      """SELECT query_id, CAST(row_number() OVER w AS INT) AS rank, corpus_id,
        |  CAST(CAST(adc_d2 AS VARCHAR) AS DOUBLE) AS adc_d2
        |FROM adc
        |WINDOW w AS (PARTITION BY query_id ORDER BY adc_d2 ASC, corpus_id ASC)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY query_id, rank""".stripMargin),

    "sim_pq_topk_refined" -> (pqOraclePrefix +
      """, cand AS (SELECT query_id, corpus_id FROM adc
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adc_d2 ASC, corpus_id ASC) <= 50),
        |ex AS (SELECT cand.query_id, cand.corpus_id,
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(eq.mv[i] - ec.mv[i] AS HUGEINT) * (eq.mv[i] - ec.mv[i]))) AS d2
        |  FROM cand
        |  JOIN e eq ON eq.vec_id = cand.query_id
        |  JOIN e ec ON ec.vec_id = cand.corpus_id)
        |SELECT query_id, CAST(row_number() OVER w AS INT) AS rank, corpus_id,
        |  CAST(CAST(d2 AS VARCHAR) AS DOUBLE) AS d2
        |FROM ex
        |WINDOW w AS (PARTITION BY query_id ORDER BY d2 ASC, corpus_id ASC)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY query_id, rank""".stripMargin),

    "text_bm25_topk" -> bm25OracleSql,

    "text_bm25_prf" -> bm25PrfOracleSql,

    // percolator: frozen corpus stats (tdf/st), batch docs re-derive
    // dl/tf; COALESCE(df, 0) mirrors the left join for unseen terms
    "text_bm25_percolate" ->
      """WITH q(query_id, qtext) AS (VALUES (1, 'spark join table'),
        |    (2, 'window agg stream'), (3, 'hash merge sort batch'),
        |    (4, 'the cat and naïve 😀')),
        |tok AS (SELECT doc_id,
        |    string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |tdf AS (SELECT term, COUNT(*) AS df FROM
        |    (SELECT DISTINCT doc_id, term FROM
        |      (SELECT doc_id, unnest(toks) AS term FROM tok))
        |  GROUP BY term),
        |st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len(toks)) AS BIGINT) AS t_tot FROM tok),
        |qt AS (SELECT DISTINCT query_id,
        |    unnest(string_split(lower(trim(regexp_replace(qtext, '[\s\x0b]+', ' ', 'g'))), ' ')) AS term
        |  FROM q),
        |btf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM
        |    (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM tok
        |     WHERE doc_id BETWEEN 100 AND 119)
        |  GROUP BY doc_id, dl, term),
        |sc AS (SELECT qt.query_id, b.doc_id,
        |    CAST(round(ln((st.n_docs - COALESCE(t.df, 0) + 0.5) / (COALESCE(t.df, 0) + 0.5) + 1) * 1000000) AS BIGINT) AS idf,
        |    st.t_tot * (10 * b.tf + 3) + 9 * b.dl * st.n_docs AS den,
        |    b.tf FROM btf b JOIN qt USING (term) LEFT JOIN tdf t USING (term) CROSS JOIN st),
        |ct AS (SELECT query_id, doc_id,
        |    (idf * ((44 * tf * st.t_tot * 1000000 + den) // (2 * den)) + 500000) // 1000000 AS contrib
        |  FROM sc CROSS JOIN st)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |  CAST(SUM(contrib) AS BIGINT) AS score_micros, CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        |FROM ct GROUP BY query_id, doc_id
        |ORDER BY query_id, doc_id""".stripMargin,

    // the stored-index probe must reproduce the one-shot BM25 ranking
    // exactly — same oracle
    "text_bm25_index_probe" -> bm25OracleSql,

    "text_top_ngrams" ->
      """WITH w AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |e AS (SELECT unnest(sh) AS ngram FROM s WHERE len(sh) > 0)
        |SELECT ngram, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM e GROUP BY 1
        |ORDER BY doc_freq DESC, ngram LIMIT 50""".stripMargin,

    "text_redact" ->
      """WITH synth AS (SELECT doc_id,
        |  substr(text, 1, 40) || ' reach me at user' || doc_id || '@example.com or https://site' ||
        |  doc_id || '.example/page?q=1 call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(raw, 'https?://[^\s\x0b]+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
        |FROM synth ORDER BY doc_id""".stripMargin,

    "mm_resize" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 200)),
        |p AS (SELECT id, array_to_string(list_transform(range(0, least(512 + id % 512, 256)),
        |  j -> chr(CAST((id * 31 + j) % 95 + 32 AS INT))), '') AS s FROM ids)
        |SELECT id AS media_id,
        |  CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(length(s) AS INT) AS n_bytes, sha256(s) AS sha,
        |  16 AS width, 16 AS height
        |FROM p ORDER BY media_id""".stripMargin,

    "mm_frames" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 200) WHERE range % 3 = 2),
        |m AS (SELECT id, 512 + id % 512 AS len, 4000 + id % 2000 AS dur FROM ids),
        |fr AS (SELECT id, CAST(u.i AS INT) AS frame_idx, u.i * 1000 AS ts_ms, len, dur
        |       FROM m, LATERAL (SELECT unnest(generate_series(0, CAST(greatest(1, dur // 1000) AS INT) - 1)) AS i) u),
        |st AS (SELECT id, frame_idx, ts_ms,
        |       CAST(floor((ts_ms / CAST(dur AS DOUBLE)) * len) AS INT) AS strt, len FROM fr),
        |p AS (SELECT id, frame_idx, ts_ms,
        |      array_to_string(list_transform(range(strt, len), j -> chr(CAST((id * 31 + j) % 95 + 32 AS INT))), '') AS s
        |      FROM st)
        |SELECT id AS media_id, frame_idx, ts_ms, CAST(length(s) AS INT) AS n_bytes, sha256(s) AS sha
        |FROM p ORDER BY media_id, frame_idx""".stripMargin,

    "pack_sequences" ->
      """WITH RECURSIVE t AS (
        |  SELECT source AS shard, doc_id AS id,
        |    least(CASE WHEN length(trim(text)) = 0 THEN 0
        |          ELSE CAST(len(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ')) AS INT) END, 512) AS ntok,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents),
        |p AS (
        |  SELECT shard, id, ntok, rn, CAST(ntok AS BIGINT) AS acc, CAST(0 AS BIGINT) AS win
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.shard, t.id, t.ntok, t.rn,
        |    CASE WHEN p.acc + t.ntok > 512 THEN CAST(t.ntok AS BIGINT) ELSE p.acc + t.ntok END,
        |    CASE WHEN p.acc + t.ntok > 512 THEN p.win + 1 ELSE p.win END
        |  FROM t JOIN p ON t.shard = p.shard AND t.rn = p.rn + 1)
        |SELECT shard, id AS doc_id, CAST(ntok AS INTEGER) AS n_tokens, win AS window_idx
        |FROM p ORDER BY shard, doc_id""".stripMargin,

    "pack_stats" ->
      """WITH RECURSIVE t AS (
        |  SELECT source AS shard, doc_id AS id,
        |    least(CASE WHEN length(trim(text)) = 0 THEN 0
        |          ELSE CAST(len(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ')) AS INT) END, 512) AS ntok,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents),
        |p AS (
        |  SELECT shard, id, ntok, rn, CAST(ntok AS BIGINT) AS acc, CAST(0 AS BIGINT) AS win
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.shard, t.id, t.ntok, t.rn,
        |    CASE WHEN p.acc + t.ntok > 512 THEN CAST(t.ntok AS BIGINT) ELSE p.acc + t.ntok END,
        |    CASE WHEN p.acc + t.ntok > 512 THEN p.win + 1 ELSE p.win END
        |  FROM t JOIN p ON t.shard = p.shard AND t.rn = p.rn + 1)
        |SELECT shard, win AS window_idx, COUNT(*) AS n_docs,
        |  CAST(SUM(ntok) AS BIGINT) AS window_tokens,
        |  round(CAST(SUM(ntok) AS DOUBLE) / 512, 6) AS fill_ratio
        |FROM p GROUP BY shard, win ORDER BY shard, window_idx""".stripMargin,

    "sample_split" ->
      """WITH b AS (SELECT doc_id,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 AS bucket
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN bucket < 8000 THEN 'train' WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    "sample_mixture" ->
      """WITH b AS (SELECT doc_id, source,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 AS bucket
        |  FROM documents)
        |SELECT doc_id, source FROM b
        |WHERE bucket < CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
        |  WHEN 'src2' THEN 2500 WHEN 'src3' THEN 1000 ELSE 0 END
        |ORDER BY doc_id""".stripMargin,

    "sample_shuffle" ->
      """SELECT doc_id FROM documents
        |ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000, doc_id""".stripMargin,

    // -ln(u) rounded once to integer nanos, then exact BIGINT division
    // by the weight — the E-S priority reproduces bit-for-bit
    "sample_weighted" ->
      """WITH h AS (SELECT doc_id, n_chars,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
        |SELECT doc_id, n_chars,
        |  CAST(round(ln(1152921504606846976.0 / (hv + 1)::DOUBLE) * 1000000000) AS BIGINT)
        |    // CAST(n_chars AS BIGINT) AS priority
        |FROM h ORDER BY priority, doc_id LIMIT 100""".stripMargin,

    // 60-bit md5 prefixes are the sketch registers: k-th smallest
    // distinct hash -> (k-1) * 2^60 / h_(k), exact below k
    "stats_distinct_kmv" ->
      """WITH h AS (SELECT DISTINCT source,
        |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT source, hv, row_number() OVER (PARTITION BY source ORDER BY hv) AS rk
        |  FROM h),
        |t AS (SELECT source, COUNT(*) AS n_distinct,
        |    MAX(CASE WHEN rk <= 16 THEN hv END) AS kth FROM r GROUP BY source)
        |SELECT source, CAST(n_distinct AS BIGINT) AS n_distinct,
        |  CASE WHEN n_distinct < 16 THEN CAST(n_distinct AS BIGINT)
        |       ELSE CAST(round(15.0 * 1152921504606846976.0 / kth::DOUBLE) AS BIGINT) END
        |    AS kmv_estimate
        |FROM t ORDER BY source""".stripMargin,

    // every stage of the image path re-derived from the pixel formula:
    // cell mapping (p*dim div n), integer luminance sums, the float32
    // feature rounding (CAST AS REAL), and the double cosine
    "pipeline_multimodal" ->
      """WITH ids AS (SELECT i AS mid, 8 + i % 5 AS w, 6 + i % 3 AS h FROM range(16) t(i)),
        |px AS (SELECT mid, p, CAST(p * 8 // (w * h) AS INT) AS cell,
        |    299 * ((mid * 7 + p * 3) % 256) + 587 * ((mid * 11 + p * 5) % 256)
        |      + 114 * ((mid * 15 + p * 7) % 256) AS lum
        |  FROM ids CROSS JOIN range(96) r(p) WHERE p < w * h),
        |cells AS (SELECT mid, cell, SUM(lum) AS s, COUNT(*) AS c FROM px GROUP BY 1, 2),
        |f AS (SELECT mid, list(CAST(CAST(s AS DOUBLE) / (c * 1000.0) AS REAL) ORDER BY cell) AS fv
        |  FROM cells GROUP BY mid)
        |SELECT a.mid AS id_a, b.mid AS id_b,
        |  round(list_cosine_similarity(list_transform(a.fv, x -> CAST(x AS DOUBLE)),
        |    list_transform(b.fv, x -> CAST(x AS DOUBLE))), 6) AS cosine
        |FROM f a JOIN f b ON a.mid < b.mid
        |ORDER BY id_a, id_b""".stripMargin,

    // the four monitor blocks verbatim (each already proven green
    // standalone), joined on the per-source rows
    "pipeline_monitor" ->
      """WITH d AS (SELECT doc_id, source,
        |    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ')) END AS tc
        |  FROM documents),
        |bkt AS (SELECT source, LEAST(CAST(floor(tc / 32.0) AS BIGINT), 15) AS bucket,
        |    doc_id % 2 AS half FROM d),
        |ca AS (SELECT source, bucket, COUNT(*) AS a FROM bkt WHERE half = 0 GROUP BY 1, 2),
        |cb AS (SELECT source, bucket, COUNT(*) AS b FROM bkt WHERE half = 1 GROUP BY 1, 2),
        |dj AS (SELECT COALESCE(ca.source, cb.source) AS source,
        |    COALESCE(a, 0) AS a, COALESCE(b, 0) AS b
        |  FROM ca FULL OUTER JOIN cb ON ca.source = cb.source AND ca.bucket = cb.bucket),
        |dt AS (SELECT source, a, b,
        |    SUM(a) OVER (PARTITION BY source) AS ta, SUM(b) OVER (PARTITION BY source) AS tb,
        |    COUNT(*) OVER (PARTITION BY source) AS nb FROM dj),
        |terms AS (SELECT source, a, b,
        |    CAST(round((CAST(a + 1 AS DOUBLE) / CAST(ta + nb AS DOUBLE)
        |               - CAST(b + 1 AS DOUBLE) / CAST(tb + nb AS DOUBLE))
        |      * ln((CAST(a + 1 AS DOUBLE) * CAST(tb + nb AS DOUBLE))
        |          / (CAST(b + 1 AS DOUBLE) * CAST(ta + nb AS DOUBLE)))
        |      * 1000000.0) AS BIGINT) AS term FROM dt),
        |drift AS (SELECT source, CAST(SUM(a) AS BIGINT) AS n_old,
        |    CAST(SUM(b) AS BIGINT) AS n_new, CAST(SUM(term) AS BIGINT) AS psi_micros
        |  FROM terms GROUP BY source),
        |cw AS (SELECT source,
        |    string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents WHERE text IS NOT NULL),
        |ct AS (SELECT source, unnest(words) AS tok FROM cw),
        |ctt AS (SELECT source, tok FROM ct WHERE tok <> ''),
        |cv AS (SELECT tok, 1 AS in_vocab FROM (
        |  SELECT tok, COUNT(*) AS c FROM ctt GROUP BY tok ORDER BY c DESC, tok LIMIT 200)),
        |cov AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(round((COUNT(*) - SUM(COALESCE(in_vocab, 0))) / CAST(COUNT(*) AS DOUBLE)
        |      * 1000000.0) AS BIGINT) AS oov_micros
        |  FROM ctt LEFT JOIN cv USING (tok) GROUP BY source),
        |qs AS (SELECT source, length(bin(CAST(tc + 1 AS BIGINT))) AS bin, COUNT(*) AS cnt
        |  FROM d WHERE tc IS NOT NULL AND tc >= 0 GROUP BY 1, 2),
        |qt AS (SELECT source, bin, cnt,
        |    SUM(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
        |    SUM(cnt) OVER (PARTITION BY source) AS n FROM qs),
        |qq AS (SELECT source,
        |    MIN(CASE WHEN cum >= ceil(n * 0.5) THEN bin END) AS b50,
        |    MIN(CASE WHEN cum >= ceil(n * 0.99) THEN bin END) AS b99
        |  FROM qt GROUP BY source),
        |sk AS (SELECT source, (CAST(1 AS BIGINT) << b50) - 2 AS p50_hi,
        |    (CAST(1 AS BIGINT) << b99) - 2 AS p99_hi FROM qq),
        |orr AS (SELECT doc_id, source, tc,
        |    row_number() OVER (PARTITION BY source ORDER BY tc, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n FROM d),
        |om AS (SELECT *, MAX(CASE WHEN rn = (n + 1) // 2 THEN tc END)
        |    OVER (PARTITION BY source) AS med FROM orr),
        |odv AS (SELECT doc_id, source, n, ABS(tc - med) AS dev FROM om),
        |or2 AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rn2 FROM odv),
        |om2 AS (SELECT *, MAX(CASE WHEN rn2 = (n + 1) // 2 THEN dev END)
        |    OVER (PARTITION BY source) AS mad FROM or2),
        |outl AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_outliers
        |  FROM om2 WHERE dev > 3 * mad GROUP BY source)
        |SELECT d2.source, d2.n_old, d2.n_new, d2.psi_micros,
        |  cov.n_tokens, cov.oov_micros, sk.p50_hi, sk.p99_hi,
        |  COALESCE(outl.n_outliers, 0) AS n_outliers
        |FROM drift d2 JOIN cov USING (source) JOIN sk USING (source)
        |LEFT JOIN outl USING (source)
        |ORDER BY source""".stripMargin,

    // same integer-micro mean arithmetic as the IVF oracle; argmax
    // tie-break is (cos DESC, label DESC), the struct sort order
    "emb_classify_centroid" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |tr AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
        |te AS (SELECT * FROM e WHERE vec_id % 5 = 0),
        |m AS (SELECT tr.label AS lbl, u.i AS pos,
        |    (SUM(CAST(floor(tr.v[u.i] * 1000000) AS BIGINT))::DOUBLE / COUNT(*)::DOUBLE) / 1000000.0 AS m
        |  FROM tr, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
        |  GROUP BY tr.label, u.i),
        |c AS (SELECT lbl, list(m ORDER BY pos) AS cv FROM m GROUP BY lbl),
        |s AS (SELECT te.vec_id, te.label AS true_label, c.lbl,
        |    CASE WHEN list_aggregate(list_transform(te.v, x -> x * x), 'sum') = 0
        |      OR list_aggregate(list_transform(c.cv, x -> x * x), 'sum') = 0 THEN 0.0
        |      ELSE list_cosine_similarity(te.v, c.cv) END AS cos FROM te, c)
        |SELECT vec_id, CAST(true_label AS INT) AS true_label, CAST(lbl AS INT) AS pred_label,
        |  round(cos, 6) AS cosine
        |FROM s QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, lbl DESC) = 1
        |ORDER BY vec_id""".stripMargin,

    // integer signal stats re-derived from the sawtooth formula —
    // cross-engine proof the RIFF/PCM byte decode is exact
    "mm_wav_decode" ->
      """WITH ids AS (SELECT i AS media_id, 400 + (i % 7) * 50 AS n FROM range(24) t(i)),
        |sm AS (SELECT media_id, n, p, ((media_id * 31 + p * 7) % 2001) - 1000 AS v
        |  FROM ids CROSS JOIN range(750) r(p) WHERE p < n),
        |w AS (SELECT media_id, n, p, v,
        |    LAG(v) OVER (PARTITION BY media_id ORDER BY p) AS pv FROM sm)
        |SELECT media_id, CAST(8000 AS INT) AS sample_rate,
        |  CAST(MAX(n) AS BIGINT) AS n_samples,
        |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs, CAST(MAX(ABS(v)) AS BIGINT) AS max_abs,
        |  CAST(SUM(CASE WHEN pv IS NOT NULL
        |    AND ((pv < 0 AND v >= 0) OR (pv >= 0 AND v < 0)) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_crossings
        |FROM w GROUP BY media_id ORDER BY media_id""".stripMargin,

    // the signal stats come straight from the quadratic sample formula
    // — cross-engine proof the FLAC bitstream round-trip is lossless
    "mm_flac_decode" ->
      """WITH ids AS (SELECT i AS media_id, 400 + (i % 7) * 50 AS n FROM range(24) t(i)),
        |sm AS (SELECT media_id, n, p, ((media_id * 31 + p * p) % 2801) - 1400 AS v
        |  FROM ids CROSS JOIN range(750) r(p) WHERE p < n)
        |SELECT media_id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS n_channels,
        |  CAST(MAX(n) AS BIGINT) AS n_samples,
        |  CAST(SUM(v) AS BIGINT) AS sum_v,
        |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
        |  CAST(MAX(ABS(v)) AS BIGINT) AS max_abs
        |FROM sm GROUP BY media_id ORDER BY media_id""".stripMargin,

    // sample stats replayed from the sine-table formula; lpc_wins=true
    // pins the deterministic cost contest (a two-pole sinusoid is
    // near-perfectly linearly predictable, so the LPC stream must be
    // strictly smaller than FIXED-only)
    "mm_flac_lpc" ->
      """WITH s16(j, sv) AS (VALUES (0,0),(1,383),(2,707),(3,924),(4,1000),(5,924),
        |    (6,707),(7,383),(8,0),(9,-383),(10,-707),(11,-924),(12,-1000),(13,-924),
        |    (14,-707),(15,-383)),
        |ids AS (SELECT i AS media_id, 600 + (i % 5) * 40 AS n,
        |    1 + 2 * (i % 3) AS freq, 1 + (i % 4) AS amp FROM range(18) t(i)),
        |sm AS (SELECT media_id, n, p, sv * amp AS v
        |  FROM ids CROSS JOIN range(760) r(p)
        |  JOIN s16 ON s16.j = (p * freq + media_id) % 16
        |  WHERE p < n)
        |SELECT media_id, CAST(8000 AS INT) AS sample_rate,
        |  CAST(MAX(n) AS BIGINT) AS n_samples,
        |  CAST(SUM(v) AS BIGINT) AS sum_v,
        |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
        |  CAST(MAX(ABS(v)) AS BIGINT) AS max_abs,
        |  true AS lpc_wins
        |FROM sm GROUP BY media_id ORDER BY media_id""".stripMargin,

    // L/R stats replayed from the stereo formulas;
    // decorrelation_wins=true pins the deterministic channel-layout
    // contest (a near-identical R makes the side channel ~free)
    "mm_flac_stereo" ->
      """WITH s16(j, sv) AS (VALUES (0,0),(1,383),(2,707),(3,924),(4,1000),(5,924),
        |    (6,707),(7,383),(8,0),(9,-383),(10,-707),(11,-924),(12,-1000),(13,-924),
        |    (14,-707),(15,-383)),
        |ids AS (SELECT i AS media_id, 500 + (i % 4) * 60 AS n,
        |    2 + (i % 3) AS amp FROM range(16) t(i)),
        |sm AS (SELECT media_id, n, p, sv * amp AS l,
        |    sv * amp - ((p % 7) - 3) AS r
        |  FROM ids CROSS JOIN range(680) q(p)
        |  JOIN s16 ON s16.j = (p + media_id) % 16
        |  WHERE p < n)
        |SELECT media_id, CAST(8000 AS INT) AS sample_rate, CAST(2 AS INT) AS n_channels,
        |  CAST(MAX(n) AS BIGINT) AS n_frames,
        |  CAST(SUM(l) AS BIGINT) AS sum_l,
        |  CAST(SUM(r) AS BIGINT) AS sum_r,
        |  CAST(MAX(GREATEST(ABS(l), ABS(r))) AS BIGINT) AS max_abs,
        |  true AS decorrelation_wins
        |FROM sm GROUP BY media_id ORDER BY media_id""".stripMargin,

    // the oracle derives the sums from the pixel formula alone —
    // cross-engine proof the byte-level PPM decode is exact
    // dHash replay from the pixel formula: 9x8 nearest-resize source
    // coordinates, integer BT.601 milli-luma, per-position bit compare
    // (no 64-bit packing — DuckDB's checked shift rejects 1<<63), then
    // Hamming as the count of differing positions
    "mm_dhash_pairs" ->
      """WITH ids AS (SELECT i AS media_id, i % 8 AS b,
        |    8 + (i % 8) % 5 AS w, 6 + (i % 8) % 3 AS h FROM range(24) t(i)),
        |cells AS (SELECT media_id, b, w, h, rr.r, cc.c,
        |    ((cc.c * w) // 9) AS sx, ((rr.r * h) // 8) AS sy
        |  FROM ids CROSS JOIN range(8) rr(r) CROSS JOIN range(9) cc(c)),
        |lum AS (SELECT media_id, r, c,
        |    299 * ((b * 7 + (sy * w + sx) * 3) % 256) +
        |    587 * ((b * 11 + (sy * w + sx) * 5) % 256) +
        |    114 * ((b * 15 + (sy * w + sx) * 7) % 256) AS l
        |  FROM cells),
        |bits AS (SELECT a.media_id, a.r * 8 + a.c AS pos,
        |    CASE WHEN n.l > a.l THEN 1 ELSE 0 END AS bit
        |  FROM lum a JOIN lum n ON n.media_id = a.media_id AND n.r = a.r AND n.c = a.c + 1
        |  WHERE a.c < 8),
        |hp AS (SELECT a.media_id AS id_a, b.media_id AS id_b,
        |    CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS INT) AS hamming
        |  FROM bits a JOIN bits b ON a.media_id < b.media_id AND a.pos = b.pos
        |  GROUP BY a.media_id, b.media_id)
        |SELECT id_a, id_b, hamming FROM hp WHERE hamming <= 10
        |ORDER BY id_a, id_b""".stripMargin,

    "mm_ppm_decode" ->
      """WITH ids AS (SELECT i AS media_id, 8 + i % 5 AS w, 6 + i % 3 AS h FROM range(24) t(i)),
        |px AS (SELECT media_id, w, h, p FROM ids CROSS JOIN range(96) r(p) WHERE p < w * h)
        |SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h AS BIGINT) AS n_px,
        |  CAST(SUM((media_id * 7 + p * 3) % 256) AS BIGINT) AS sum_r,
        |  CAST(SUM((media_id * 11 + p * 5) % 256) AS BIGINT) AS sum_g,
        |  CAST(SUM((media_id * 15 + p * 7) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3, 4 ORDER BY media_id""".stripMargin,

    // the decoder must invert BGR + bottom-up + padding exactly: the
    // row weight (p // w + 1) is computed in TOP-DOWN pixel order
    "mm_bmp_decode" ->
      """WITH ids AS (SELECT i AS media_id, 8 + i % 5 AS w, 6 + i % 3 AS h FROM range(24) t(i)),
        |px AS (SELECT media_id, w, h, p, p // w + 1 AS wt
        |  FROM ids CROSS JOIN range(96) r(p) WHERE p < w * h)
        |SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h AS BIGINT) AS n_px,
        |  CAST(SUM(wt * ((media_id * 7 + p * 3) % 256)) AS BIGINT) AS wsum_r,
        |  CAST(SUM(wt * ((media_id * 11 + p * 5) % 256)) AS BIGINT) AS wsum_g,
        |  CAST(SUM(wt * ((media_id * 15 + p * 7) % 256)) AS BIGINT) AS wsum_b
        |FROM px GROUP BY 1, 2, 3, 4 ORDER BY media_id""".stripMargin,

    // deflate→inflate must round-trip and every filter must invert:
    // any filter-algebra error shifts pixel values and breaks the sums
    "mm_png_decode" ->
      """WITH ids AS (SELECT i AS media_id, 9 + i % 4 AS w, 7 + i % 5 AS h FROM range(24) t(i)),
        |px AS (SELECT media_id, w, h, p, p // w + 1 AS wt
        |  FROM ids CROSS JOIN range(132) r(p) WHERE p < w * h)
        |SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h AS BIGINT) AS n_px,
        |  CAST(SUM(wt * ((media_id * 13 + p * 5) % 256)) AS BIGINT) AS wsum_r,
        |  CAST(SUM(wt * ((media_id * 19 + p * 9) % 256)) AS BIGINT) AS wsum_g,
        |  CAST(SUM(wt * ((media_id * 25 + p * 13) % 256)) AS BIGINT) AS wsum_b
        |FROM px GROUP BY 1, 2, 3, 4 ORDER BY media_id""".stripMargin,

    // pixel value = palette[index]: both are formulas, so the oracle
    // composes them without ever seeing a byte of the LZW stream
    "mm_gif_decode" ->
      """WITH ids AS (SELECT i AS media_id, 40 + (i % 4) * 5 AS w, 30 + (i % 3) * 5 AS h
        |  FROM range(12) t(i)),
        |px AS (SELECT media_id, w, h, p, p // w + 1 AS wt,
        |    (media_id * 7 + p * 13) % 256 AS idx
        |  FROM ids CROSS JOIN range(2200) r(p) WHERE p < w * h)
        |SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h AS BIGINT) AS n_px,
        |  CAST(SUM(wt * ((idx * 3 + media_id + 1) % 256)) AS BIGINT) AS wsum_r,
        |  CAST(SUM(wt * ((idx * 5 + media_id + 1) % 256)) AS BIGINT) AS wsum_g,
        |  CAST(SUM(wt * ((idx * 7 + media_id + 1) % 256)) AS BIGINT) AS wsum_b
        |FROM px GROUP BY 1, 2, 3, 4 ORDER BY media_id""".stripMargin,

    // duration = nf/fps; one frame per 500 ms; idx floors ts·fps/1000
    "mm_avi_frames" ->
      """WITH v AS (SELECT i AS media_id, 2 + i % 4 AS fps, 5 + i % 6 AS nf FROM range(12) t(i)),
        |d AS (SELECT media_id, fps, nf,
        |    GREATEST(1, ((nf * 1000) // fps) // 500) AS n FROM v),
        |f AS (SELECT media_id, fps, nf, k * 500 AS ts_ms
        |  FROM d CROSS JOIN range(20) r(k) WHERE k < n)
        |SELECT media_id,
        |  CAST(LEAST(nf - 1, ts_ms * fps // 1000) AS INT) AS frame_idx,
        |  CAST(ts_ms AS BIGINT) AS ts_ms
        |FROM f ORDER BY media_id, ts_ms""".stripMargin,

    // canonical ulaw2linear: b = ~u; t = (((b&15)<<3)+132) << ((b&112)>>4);
    // sample = ±(t−132) by the sign bit — pure integer bit algebra
    "mm_mulaw_decode" ->
      """WITH ids AS (SELECT i AS media_id, 200 + i * 10 AS n FROM range(24) t(i)),
        |sm AS (SELECT media_id, p,
        |    255 - CAST((media_id * 31 + p * 7) % 256 AS INT) AS b
        |  FROM ids CROSS JOIN range(430) r(p) WHERE p < n),
        |ex AS (SELECT media_id, p,
        |  CASE WHEN (b & 128) <> 0
        |    THEN 132 - ((((b & 15) << 3) + 132) << ((b & 112) >> 4))
        |    ELSE ((((b & 15) << 3) + 132) << ((b & 112) >> 4)) - 132 END AS sample
        |  FROM sm)
        |SELECT media_id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS n_channels,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM((p + 1) * sample) AS BIGINT) AS wsum
        |FROM ex GROUP BY media_id ORDER BY media_id""".stripMargin,

    // the stopword-profile predictor re-derived in SQL (same block as
    // text_profile), cross-tabbed against the labeled lang column
    "corpus_lang_confusion" ->
      """WITH base AS (SELECT doc_id, lang, text,
        |  lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))) AS norm
        |  FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT doc_id, lang, text, string_split(norm, ' ') AS words FROM base),
        |sc AS (SELECT doc_id, lang, text,
        |  len(list_filter(words, t -> t IN ('the','and','of','to','is','in','that','it'))) AS s_en,
        |  len(list_filter(words, t -> t IN ('der','die','das','und','ist','nicht','ein','zu'))) AS s_de,
        |  len(list_filter(words, t -> t IN ('le','la','les','et','est','un','une','que'))) AS s_fr,
        |  len(list_filter(words, t -> t IN ('el','la','los','y','es','un','una','que'))) AS s_es,
        |  len(list_filter(words, t -> t IN ('的','是','了','在','我','有','和','不'))) AS s_zh
        |FROM w),
        |m AS (SELECT lang, greatest(s_en, s_de, s_fr, s_es, s_zh) AS best, * FROM sc),
        |pr AS (SELECT lang,
        |  CASE WHEN best = 0 THEN 'und'
        |       WHEN s_en = best THEN 'en' WHEN s_de = best THEN 'de'
        |       WHEN s_fr = best THEN 'fr' WHEN s_es = best THEN 'es' ELSE 'zh' END AS lang_pred
        |FROM m),
        |c AS (SELECT lang, lang_pred, COUNT(*) AS n FROM pr GROUP BY 1, 2),
        |tt AS (SELECT lang, lang_pred, n, SUM(n) OVER (PARTITION BY lang) AS n_true FROM c)
        |SELECT lang, lang_pred, CAST(n AS BIGINT) AS n, CAST(n_true AS BIGINT) AS n_true,
        |  CAST(round(CAST(n AS DOUBLE) / CAST(n_true AS DOUBLE) * 1000000.0) AS BIGINT) AS cell_micros
        |FROM tt ORDER BY lang, lang_pred""".stripMargin,

    // integer x (epoch day) and integer y (count): every OLS moment is
    // exact; one rounded division at the end
    "stats_trend" ->
      """WITH d AS (SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
        |    COUNT(*) AS y
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |g AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM d GROUP BY event_type)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days, CAST(sy AS BIGINT) AS n_events,
        |  CASE WHEN n >= 2 AND n * sxx <> sx * sx
        |    THEN CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0) AS BIGINT) END
        |    AS trend_micros_per_day
        |FROM g ORDER BY event_type""".stripMargin,

    // per-term micro-rounded lns, exact integer moment sums, ONE final
    // IEEE division — the OLS slope hash-matches
    "stats_zipf" ->
      """WITH w AS (SELECT source,
        |    string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents WHERE text IS NOT NULL),
        |t AS (SELECT source, unnest(words) AS tok FROM w),
        |tt AS (SELECT source, tok FROM t WHERE tok <> ''),
        |c AS (SELECT source, tok, COUNT(*) AS cnt FROM tt GROUP BY 1, 2),
        |r AS (SELECT source, cnt,
        |    row_number() OVER (PARTITION BY source ORDER BY cnt DESC, tok) AS rank
        |  FROM c QUALIFY rank <= 100),
        |m AS (SELECT source,
        |    CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS x,
        |    CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT) AS y FROM r),
        |g AS (SELECT source, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM m GROUP BY source)
        |SELECT source, CAST(n AS BIGINT) AS n_ranks,
        |  CASE WHEN n >= 2 AND n * sxx <> sx * sx
        |    THEN CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0) AS BIGINT) END AS zipf_slope_micros
        |FROM g ORDER BY source""".stripMargin,

    // same precedence as the redact chain: emails counted after URLs
    // blank out, phones after both — an email inside a URL is a URL
    "text_pii_inventory" ->
      """WITH synth AS (SELECT source,
        |    substr(text, 1, 40)
        |    || CASE WHEN doc_id % 3 = 0 THEN ' reach user@example.com' ELSE '' END
        |    || CASE WHEN doc_id % 4 = 0 THEN ' https://site' || doc_id || '.example/p?q=1' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN ' call 555-0134' ELSE '' END AS raw
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (SELECT source,
        |    len(regexp_extract_all(raw, 'https?://[^\s\x0b]+')) AS u,
        |    len(regexp_extract_all(regexp_replace(raw, 'https?://[^\s\x0b]+', ' ', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
        |    len(regexp_extract_all(regexp_replace(regexp_replace(raw,
        |        'https?://[^\s\x0b]+', ' ', 'g'),
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', ' ', 'g'),
        |      '\b\d{3}-\d{4}\b')) AS p
        |  FROM synth)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(u) AS BIGINT) AS n_urls, CAST(SUM(e) AS BIGINT) AS n_emails,
        |  CAST(SUM(p) AS BIGINT) AS n_phones,
        |  CAST(SUM(CASE WHEN u + e + p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    // vocab = top-200 under the (count desc, token) total order;
    // coverage counts are integers, one rounded division at output
    "tokenizer_coverage" ->
      """WITH w AS (SELECT source,
        |    string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents WHERE text IS NOT NULL),
        |t AS (SELECT source, unnest(words) AS tok FROM w),
        |tt AS (SELECT source, tok FROM t WHERE tok <> ''),
        |v AS (SELECT tok, 1 AS in_vocab FROM (
        |  SELECT tok, COUNT(*) AS c FROM tt GROUP BY tok ORDER BY c DESC, tok LIMIT 200)),
        |g AS (SELECT source, COUNT(*) AS n_tokens,
        |    SUM(COALESCE(in_vocab, 0)) AS n_covered
        |  FROM tt LEFT JOIN v USING (tok) GROUP BY source)
        |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_covered AS BIGINT) AS n_covered,
        |  CAST(n_tokens - n_covered AS BIGINT) AS n_oov,
        |  CAST(round((n_tokens - n_covered) / CAST(n_tokens AS DOUBLE) * 1000000.0) AS BIGINT) AS oov_micros
        |FROM g ORDER BY source""".stripMargin,

    // lower-median ranks via (n+1) div 2 — pure integer picks, no
    // interpolation, so median and MAD match the engine bit-for-bit
    "stats_outliers" ->
      """WITH d AS (SELECT doc_id, source,
        |    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ')) END AS tc
        |  FROM documents),
        |r AS (SELECT doc_id, source, tc,
        |    row_number() OVER (PARTITION BY source ORDER BY tc, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n FROM d),
        |m AS (SELECT *, MAX(CASE WHEN rn = (n + 1) // 2 THEN tc END)
        |    OVER (PARTITION BY source) AS med FROM r),
        |dv AS (SELECT doc_id, source, tc, n, med, ABS(tc - med) AS dev FROM m),
        |r2 AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rn2 FROM dv),
        |m2 AS (SELECT *, MAX(CASE WHEN rn2 = (n + 1) // 2 THEN dev END)
        |    OVER (PARTITION BY source) AS mad FROM r2)
        |SELECT doc_id, source, CAST(tc AS BIGINT) AS n_tokens, CAST(med AS BIGINT) AS med,
        |  CAST(mad AS BIGINT) AS mad, CAST(dev AS BIGINT) AS dev
        |FROM m2 WHERE dev > 3 * mad ORDER BY source, doc_id""".stripMargin,

    // bin = bit-length of (tc+1): pure integer binning, so the sketch
    // and its quantile bounds reproduce exactly in any engine
    "stats_quantiles_sketch" ->
      """WITH d AS (SELECT source,
        |    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ')) END AS tc
        |  FROM documents),
        |s AS (SELECT source, length(bin(CAST(tc + 1 AS BIGINT))) AS bin, COUNT(*) AS cnt
        |  FROM d WHERE tc IS NOT NULL AND tc >= 0 GROUP BY 1, 2),
        |t AS (SELECT source, bin, cnt,
        |    SUM(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
        |    SUM(cnt) OVER (PARTITION BY source) AS n FROM s),
        |q AS (SELECT source, MAX(n) AS n_rows,
        |    MIN(CASE WHEN cum >= ceil(n * 0.5) THEN bin END) AS b50,
        |    MIN(CASE WHEN cum >= ceil(n * 0.9) THEN bin END) AS b90,
        |    MIN(CASE WHEN cum >= ceil(n * 0.99) THEN bin END) AS b99
        |  FROM t GROUP BY source)
        |SELECT source, CAST(n_rows AS BIGINT) AS n_rows,
        |  (CAST(1 AS BIGINT) << b50) - 2 AS p50_hi,
        |  (CAST(1 AS BIGINT) << b90) - 2 AS p90_hi,
        |  (CAST(1 AS BIGINT) << b99) - 2 AS p99_hi
        |FROM q ORDER BY source""".stripMargin,

    // per-bucket terms round to integer micros BEFORE the per-source
    // sum, so no order-dependent float accumulation exists in either
    // engine; num/den are single-rounded products of exact counts
    "stats_drift" ->
      """WITH d AS (SELECT doc_id, source,
        |    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ')) END AS tc
        |  FROM documents),
        |bkt AS (SELECT source, LEAST(CAST(floor(tc / 32.0) AS BIGINT), 15) AS bucket,
        |    doc_id % 2 AS half FROM d),
        |ca AS (SELECT source, bucket, COUNT(*) AS a FROM bkt WHERE half = 0 GROUP BY 1, 2),
        |cb AS (SELECT source, bucket, COUNT(*) AS b FROM bkt WHERE half = 1 GROUP BY 1, 2),
        |j AS (SELECT COALESCE(ca.source, cb.source) AS source,
        |    COALESCE(ca.bucket, cb.bucket) AS bucket,
        |    COALESCE(a, 0) AS a, COALESCE(b, 0) AS b
        |  FROM ca FULL OUTER JOIN cb ON ca.source = cb.source AND ca.bucket = cb.bucket),
        |t AS (SELECT source, a, b,
        |    SUM(a) OVER (PARTITION BY source) AS ta,
        |    SUM(b) OVER (PARTITION BY source) AS tb,
        |    COUNT(*) OVER (PARTITION BY source) AS nb FROM j),
        |terms AS (SELECT source, a, b, nb,
        |    CAST(round((CAST(a + 1 AS DOUBLE) / CAST(ta + nb AS DOUBLE)
        |               - CAST(b + 1 AS DOUBLE) / CAST(tb + nb AS DOUBLE))
        |      * ln((CAST(a + 1 AS DOUBLE) * CAST(tb + nb AS DOUBLE))
        |          / (CAST(b + 1 AS DOUBLE) * CAST(ta + nb AS DOUBLE)))
        |      * 1000000.0) AS BIGINT) AS term FROM t)
        |SELECT source, CAST(SUM(a) AS BIGINT) AS n_old, CAST(SUM(b) AS BIGINT) AS n_new,
        |  CAST(MAX(nb) AS BIGINT) AS n_buckets, CAST(SUM(term) AS BIGINT) AS psi_micros
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,

    // the sketch cells are exact integer sums over md5-derived buckets,
    // so DuckDB rebuilds the identical 4x1024 sketch and the min-over-
    // rows estimate matches cell-for-cell
    "stats_heavy_hitters" ->
      """WITH w AS (SELECT string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ') AS words
        |  FROM documents WHERE text IS NOT NULL),
        |t AS (SELECT unnest(words) AS token FROM w),
        |tt AS (SELECT token FROM t WHERE token <> ''),
        |exact AS (SELECT token, COUNT(*) AS exact_cnt FROM tt GROUP BY token
        |  ORDER BY exact_cnt DESC, token LIMIT 30),
        |sk AS (SELECT i, ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || token), 1, 15))::BIGINT % 1024 AS bucket,
        |    COUNT(*) AS cnt
        |  FROM tt CROSS JOIN range(4) AS r(i) GROUP BY 1, 2),
        |est AS (SELECT e.token, MIN(s.cnt) AS est_cnt
        |  FROM exact e CROSS JOIN range(4) AS r(i)
        |  JOIN sk s ON s.i = r.i
        |    AND s.bucket = ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || e.token), 1, 15))::BIGINT % 1024
        |  GROUP BY e.token)
        |SELECT e.token, CAST(e.exact_cnt AS BIGINT) AS exact_cnt, CAST(est.est_cnt AS BIGINT) AS est_cnt
        |FROM exact e JOIN est USING (token) ORDER BY exact_cnt DESC, token""".stripMargin,

    // integer micro-weights (floor(sqrt(share)*1e6)) + integer
    // normalizer: no order-dependent double summation, every remaining
    // float op is one correctly-rounded IEEE step — exact parity
    "sample_temperature" ->
      """WITH n AS (SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
        |tot AS (SELECT SUM(cnt) AS total, CAST(SUM(cnt) // 4 AS BIGINT) AS target FROM n),
        |w AS (SELECT source, cnt,
        |  CAST(floor(sqrt(cnt / (total * 1.0)) * 1000000) AS BIGINT) AS micro FROM n, tot),
        |z AS (SELECT SUM(micro) AS z FROM w),
        |thr AS (SELECT source,
        |  CAST(floor(least(1.0, (tot.target * ((micro * 1.0) / z.z)) / cnt) * 10000) AS BIGINT) AS thr
        |  FROM w, z, tot)
        |SELECT d.doc_id, d.source FROM documents d JOIN thr USING (source)
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < thr.thr
        |ORDER BY d.doc_id""".stripMargin,

    // the naive single-window form of the two-tier Spark plan: keep a
    // doc iff its cumulative token count in md5-priority order fits the
    // source's budget (identical result by construction)
    "sample_token_budget" ->
      """WITH t AS (SELECT doc_id, source,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE CAST(len(string_split(lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))), ' ')) AS INT)
        |  END AS n_tokens,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS prio
        |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')),
        |c AS (SELECT doc_id, source, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY source ORDER BY prio, doc_id) AS cum FROM t)
        |SELECT doc_id, source, n_tokens FROM c
        |WHERE cum <= CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 1200
        |  WHEN 'src2' THEN 500 ELSE 100000 END
        |ORDER BY doc_id""".stripMargin,

    "link_fuzzy" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL),
        |b AS (SELECT p_name, string_split(p_name, ' ')[1] AS blk FROM n)
        |SELECT a.p_name AS name_a, c.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, c.p_name) AS BIGINT) AS dist
        |FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
        |WHERE levenshtein(a.p_name, c.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin,

    "link_canonical" ->
      """WITH canon AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL),
        |dirty AS (SELECT DISTINCT CASE WHEN p_partkey % 2 = 1 THEN p_name || 'x'
        |    ELSE p_name END AS dn
        |  FROM part WHERE p_name IS NOT NULL),
        |db AS (SELECT dn, string_split(dn, ' ')[1] AS blk FROM dirty),
        |cb AS (SELECT p_name, string_split(p_name, ' ')[1] AS blk FROM canon),
        |j AS (SELECT db.dn AS dirty, cb.p_name AS canonical,
        |    CAST(levenshtein(db.dn, cb.p_name) AS BIGINT) AS dist
        |  FROM db JOIN cb ON db.blk = cb.blk
        |  WHERE levenshtein(db.dn, cb.p_name) <= 1),
        |r AS (SELECT dirty, canonical, dist,
        |    row_number() OVER (PARTITION BY dirty ORDER BY dist, canonical) AS rk FROM j)
        |SELECT dirty, canonical, dist FROM r WHERE rk = 1
        |ORDER BY dirty, canonical""".stripMargin,

    "contamination" ->
      """WITH base AS (SELECT doc_id, lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))) AS norm,
        |  doc_id % 10 = 0 AS is_eval FROM documents),
        |w AS (SELECT doc_id, is_eval, string_split(norm, ' ') AS words FROM base),
        |s2 AS (SELECT doc_id, is_eval, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |e AS (SELECT doc_id, is_eval, len(sh) AS n, unnest(sh) AS shingle FROM s2 WHERE len(sh) > 0),
        |f AS (SELECT * FROM e QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000),
        |p AS (SELECT ev.doc_id AS eval_id, tr.doc_id AS train_id, ev.n AS n_eval, COUNT(*) AS common
        |      FROM f ev JOIN f tr USING (shingle) WHERE ev.is_eval AND NOT tr.is_eval GROUP BY 1, 2, 3)
        |SELECT eval_id, train_id, common, round(common / CAST(n_eval AS DOUBLE), 6) AS overlap_frac
        |FROM p WHERE round(common / CAST(n_eval AS DOUBLE), 6) >= 0.1
        |ORDER BY eval_id, train_id""".stripMargin,

    // identical by construction: the Bloom stage cannot change the result
    "contamination_bloom" ->
      """WITH base AS (SELECT doc_id, lower(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'))) AS norm,
        |  doc_id % 10 = 0 AS is_eval FROM documents),
        |w AS (SELECT doc_id, is_eval, string_split(norm, ' ') AS words FROM base),
        |s2 AS (SELECT doc_id, is_eval, list_distinct(list_transform(range(1, len(words) - 1),
        |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh FROM w),
        |e AS (SELECT doc_id, is_eval, len(sh) AS n, unnest(sh) AS shingle FROM s2 WHERE len(sh) > 0),
        |f AS (SELECT * FROM e QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000),
        |p AS (SELECT ev.doc_id AS eval_id, tr.doc_id AS train_id, ev.n AS n_eval, COUNT(*) AS common
        |      FROM f ev JOIN f tr USING (shingle) WHERE ev.is_eval AND NOT tr.is_eval GROUP BY 1, 2, 3)
        |SELECT eval_id, train_id, common, round(common / CAST(n_eval AS DOUBLE), 6) AS overlap_frac
        |FROM p WHERE round(common / CAST(n_eval AS DOUBLE), 6) >= 0.1
        |ORDER BY eval_id, train_id""".stripMargin,

    "emb_l2norm" ->
      """WITH n AS (SELECT vec_id, embedding,
        |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |    (a, b) -> a + b)) AS nrm
        |  FROM embeddings)
        |SELECT vec_id, CAST(u.i - 1 AS INT) AS idx,
        |  round(CASE WHEN nrm = 0 THEN 0.0 ELSE CAST(embedding[u.i] AS DOUBLE) / nrm END, 6) AS nval
        |FROM n, LATERAL (SELECT unnest(generate_series(1, len(n.embedding))) AS i) u
        |ORDER BY vec_id, idx""".stripMargin,

    "emb_quantize_trained" ->
      """WITH e AS (SELECT vec_id, CAST(u.i - 1 AS INT) AS idx,
        |  CAST(embedding[u.i] AS DOUBLE) AS x
        |  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u),
        |b AS (SELECT idx, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY idx)
        |SELECT e.vec_id, e.idx,
        |  CAST(CASE WHEN b.mx = b.mn THEN 0
        |    ELSE greatest(0, least(255, CAST(floor((e.x - b.mn) / (b.mx - b.mn) * 256.0) AS BIGINT)))
        |  END AS INT) AS qcode
        |FROM e JOIN b USING (idx)
        |ORDER BY e.vec_id, e.idx""".stripMargin,

    "emb_quantize" ->
      """WITH m AS (SELECT vec_id, embedding,
        |  list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
        |  FROM embeddings),
        |s AS (SELECT vec_id, embedding,
        |  CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END AS sc FROM m)
        |SELECT vec_id, round(sc, 6) AS scale, CAST(u.i - 1 AS INT) AS idx,
        |  CAST(greatest(-127.0, least(127.0,
        |    sign(CAST(embedding[u.i] AS DOUBLE)) * floor(abs(CAST(embedding[u.i] AS DOUBLE)) * sc + 0.5))) AS INT) AS qval
        |FROM s, LATERAL (SELECT unnest(generate_series(1, len(s.embedding))) AS i) u
        |ORDER BY vec_id, idx""".stripMargin,

    "mm_features" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 200)),
        |p AS (SELECT id,
        |  array_to_string(list_transform(range(0, 512 + id % 512),
        |    j -> chr(CAST((id * 31 + j) % 95 + 32 AS INT))), '') AS s
        |  FROM ids)
        |SELECT id AS media_id,
        |  CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(length(s) AS BIGINT) AS n_bytes, sha256(s) AS sha
        |FROM p ORDER BY media_id""".stripMargin,

    // the oracle CONSTRUCTS the normalized form from the template
    // integer — green means every RFC 3986 rule (case, default port,
    // dot-segments, unreserved decode, hex uppercasing, tracking strip,
    // fragment drop) and the PSL families (wildcard *.ck, exception
    // !city.kawasaki.jp, 3-label private suffix) agree cross-engine
    "url_normalize" ->
      """WITH t AS (SELECT i, i % 8 AS m, CAST(i AS VARCHAR) AS si,
        |    CAST(i % 20 AS VARCHAR) AS s20 FROM range(240) r(i))
        |SELECT i AS id,
        |  CASE m
        |    WHEN 0 THEN 'http://www.site' || s20 || '.com/a/p' || si || '.html?id=' || si
        |    WHEN 1 THEN 'https://host' || si || '.example.org/x//y/~user/'
        |    WHEN 2 THEN 'http://sub' || si || '.shop.co.uk/A%2F/p?a=1&b=2'
        |    WHEN 3 THEN 'https://u' || si || '.github.io:8443/index.html'
        |    WHEN 4 THEN 'http://api' || si || '.example.com/v1/res/' || si || '?x=~'
        |    WHEN 5 THEN 'https://cdn' || si || '.example.com/img/%2F/p' || si || '.png'
        |    WHEN 6 THEN 'http://www' || si || '.test.ck/a/c'
        |    ELSE 'http://city.kawasaki.jp/p' || si || '/?q=' || si END AS url_norm,
        |  CASE m
        |    WHEN 0 THEN 'www.site' || s20 || '.com'
        |    WHEN 1 THEN 'host' || si || '.example.org'
        |    WHEN 2 THEN 'sub' || si || '.shop.co.uk'
        |    WHEN 3 THEN 'u' || si || '.github.io'
        |    WHEN 4 THEN 'api' || si || '.example.com'
        |    WHEN 5 THEN 'cdn' || si || '.example.com'
        |    WHEN 6 THEN 'www' || si || '.test.ck'
        |    ELSE 'city.kawasaki.jp' END AS host,
        |  CASE m
        |    WHEN 0 THEN 'site' || s20 || '.com'
        |    WHEN 1 THEN 'example.org'
        |    WHEN 2 THEN 'shop.co.uk'
        |    WHEN 3 THEN 'u' || si || '.github.io'
        |    WHEN 4 THEN 'example.com'
        |    WHEN 5 THEN 'example.com'
        |    WHEN 6 THEN 'www' || si || '.test.ck'
        |    ELSE 'city.kawasaki.jp' END AS domain
        |FROM t ORDER BY id""".stripMargin,

    "url_domain_stats" ->
      """WITH t AS (SELECT i, i % 10 AS m, CAST(i AS VARCHAR) AS si FROM range(400) r(i)),
        |h AS (SELECT i, m,
        |  CASE m
        |    WHEN 0 THEN 'a' || si || '.example.com'
        |    WHEN 1 THEN 'b' || si || '.site' || CAST(i % 5 AS VARCHAR) || '.co.uk'
        |    WHEN 2 THEN 'u' || CAST(i % 9 AS VARCHAR) || '.github.io'
        |    WHEN 3 THEN 'x' || si || '.y.z.kawasaki.jp'
        |    WHEN 4 THEN 'city.kawasaki.jp'
        |    WHEN 5 THEN 'm' || si || '.city.kawasaki.jp'
        |    WHEN 6 THEN 'shop' || CAST(i % 6 AS VARCHAR) || '.example.ck'
        |    WHEN 7 THEN 'www.ck'
        |    WHEN 8 THEN 'cdn' || CAST(i % 3 AS VARCHAR) || '.s3.amazonaws.com'
        |    ELSE '192.168.' || CAST(i % 4 AS VARCHAR) || '.1' END AS host,
        |  CASE m
        |    WHEN 0 THEN 'example.com'
        |    WHEN 1 THEN 'site' || CAST(i % 5 AS VARCHAR) || '.co.uk'
        |    WHEN 2 THEN 'u' || CAST(i % 9 AS VARCHAR) || '.github.io'
        |    WHEN 3 THEN 'y.z.kawasaki.jp'
        |    WHEN 4 THEN 'city.kawasaki.jp'
        |    WHEN 5 THEN 'city.kawasaki.jp'
        |    WHEN 6 THEN 'shop' || CAST(i % 6 AS VARCHAR) || '.example.ck'
        |    WHEN 7 THEN 'www.ck'
        |    WHEN 8 THEN 'cdn' || CAST(i % 3 AS VARCHAR) || '.s3.amazonaws.com'
        |    ELSE '192.168.' || CAST(i % 4 AS VARCHAR) || '.1' END AS domain
        |  FROM t)
        |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
        |FROM h GROUP BY domain ORDER BY domain""".stripMargin,

    // escape→decode is the identity and block indices are fixed by the
    // scaffold, so the expected blocks derive from the raw text alone:
    // the HTML-space set is exactly [ \t\n\f\r] (NOT \v — both engines
    // keep U+000B), and length() counts code points in both
    "text_html_blocks" ->
      """WITH nrm AS (SELECT doc_id,
        |    trim(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g')) AS nt
        |  FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id,
        |    'Document ' || CAST(doc_id AS VARCHAR) || ' primary heading content' AS ht
        |  FROM nrm)
        |SELECT doc_id, CAST(3 AS INT) AS block_ix, 'h1' AS tag, ht AS text,
        |  CAST(length(ht) AS INT) AS n_chars, CAST(0 AS INT) AS link_chars FROM h
        |UNION ALL
        |SELECT doc_id, CAST(4 AS INT), 'p', nt, CAST(length(nt) AS INT), CAST(0 AS INT)
        |FROM nrm WHERE length(nt) >= 25
        |ORDER BY doc_id, block_ix""".stripMargin,

    "text_html_links" ->
      """WITH t AS (SELECT i, CAST(i AS VARCHAR) AS si,
        |    CAST(i % 7 AS VARCHAR) AS s7 FROM range(120) r(i)),
        |l AS (
        |  SELECT i, 0 AS link_ix, 'http://tracker.com/t?k=' || si AS href_norm,
        |    'track ' || si AS anchor FROM t
        |  UNION ALL SELECT i, 1, '/rel/' || si, 'relative link' FROM t
        |  UNION ALL SELECT i, 2, 'https://u' || s7 || '.github.io/page', 'GH Page ' || si FROM t)
        |SELECT i AS doc_id, CAST(link_ix AS INT) AS link_ix, href_norm, anchor
        |FROM l ORDER BY doc_id, link_ix""".stripMargin,

    // the oracle never sees a WARC byte: the whole container/HTTP/HTML/
    // URL chain must reproduce text + uri formulas exactly
    "pipeline_crawl" ->
      """WITH d AS (SELECT doc_id,
        |    trim(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g')) AS nt
        |  FROM documents WHERE text IS NOT NULL),
        |e AS (SELECT doc_id,
        |    'site' || CAST(doc_id % 13 AS VARCHAR) || '.' ||
        |      CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
        |        WHEN 2 THEN 'github.io' ELSE 'org' END AS domain,
        |    'Shared section heading for crawl docs' ||
        |      CASE WHEN length(nt) >= 25 THEN chr(10) || nt ELSE '' END AS etext
        |  FROM d)
        |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_pages,
        |  CAST(COUNT(DISTINCT md5(etext)) AS BIGINT) AS n_unique,
        |  CAST(SUM(length(etext)) AS BIGINT) AS total_chars
        |FROM e GROUP BY domain ORDER BY domain""".stripMargin,

    // HRW score = top 60 bits of md5(domain || '|' || fetcher) — the
    // same ('0x' || substr(md5, 1, 15))::BIGINT chain all portable
    // sketches use; arg_max picks the winner, the window the slot
    "crawl_schedule" ->
      """WITH t AS (SELECT i, i % 20 AS d FROM range(300) r(i)),
        |u AS (SELECT 'site' || CAST(d AS VARCHAR) || '.example.com' AS domain,
        |    'http://site' || CAST(d AS VARCHAR) || '.example.com/p/' || CAST(i AS VARCHAR) AS url,
        |    500 + d * 100 AS delay_ms FROM t),
        |fa AS (SELECT domain,
        |    arg_max(f, ('0x' || substr(md5(domain || '|' || CAST(f AS VARCHAR)), 1, 15))::BIGINT) AS fetcher
        |  FROM (SELECT DISTINCT domain FROM u) CROSS JOIN range(4) r(f)
        |  GROUP BY domain)
        |SELECT u.url, u.domain, CAST(fa.fetcher AS INT) AS fetcher,
        |  CAST((ROW_NUMBER() OVER (PARTITION BY u.domain ORDER BY u.url) - 1)
        |    * u.delay_ms AS BIGINT) AS slot_ms
        |FROM u JOIN fa USING (domain)
        |ORDER BY url""".stripMargin,

    // designed outcomes per arm: clean (recall 1), too-short content
    // (fn=1), link-drowned content (fn=1), footer boilerplate dropped
    // correctly (fp stays 0) — measured, not assumed
    "text_html_extract_eval" ->
      """WITH t AS (SELECT i, i % 4 AS arm FROM range(200) r(i)),
        |c AS (SELECT arm, COUNT(*) AS n_docs,
        |    SUM(CASE WHEN arm IN (0, 3) THEN 2 ELSE 1 END) AS tp,
        |    SUM(CASE WHEN arm IN (1, 2) THEN 1 ELSE 0 END) AS fn
        |  FROM t GROUP BY arm)
        |SELECT CAST(arm AS INT) AS arm, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(tp AS BIGINT) AS tp, CAST(fn AS BIGINT) AS fn,
        |  CAST(0 AS BIGINT) AS fp,
        |  CAST(tp * 1000000 // tp AS BIGINT) AS precision_micros,
        |  CAST(tp * 1000000 // (tp + fn) AS BIGINT) AS recall_micros
        |FROM c ORDER BY arm""".stripMargin,

    "text_html_charset" ->
      """WITH t AS (SELECT i, i % 6 AS m, CAST(i AS VARCHAR) AS si FROM range(120) r(i)),
        |e AS (SELECT i,
        |  CASE m
        |    WHEN 0 THEN 'Café onza £' || si || ' - déjà vu résumé naïveté ordinal nº' || si
        |    WHEN 1 THEN 'Señor ñandú ' || si || ' piñata jalapeño año'
        |    WHEN 2 THEN 'UTF-8 snowman ☃ and emoji 😀 doc ' || si
        |    WHEN 3 THEN 'Windows euro €' || si || ' quote ’curly’ dash–' || si
        |    WHEN 4 THEN 'Chunked emoji 🚀🚀 payload ' || si || ' across splits'
        |    ELSE 'Gzip body naïve café ' || si || ' decompressed in flight' END AS text
        |  FROM t)
        |SELECT i AS id, text, CAST(length(text) AS INT) AS n_chars
        |FROM e ORDER BY id""".stripMargin,

    // expected punycode per arm (bcher-kva / mnchen-3ya / wgv71a119e)
    // is pinned — PunycodeSpec independently cross-verifies the encoder
    // against java.net.IDN, so a drifting arm means a real encode bug
    "url_idn_normalize" ->
      """WITH t AS (SELECT i, i % 5 AS m, CAST(i AS VARCHAR) AS si FROM range(150) r(i))
        |SELECT i AS id,
        |  CASE m
        |    WHEN 0 THEN 'http://xn--bcher-kva.example/p' || si
        |    WHEN 1 THEN 'https://xn--mnchen-3ya.de/s/' || si || '?id=' || si
        |    WHEN 2 THEN 'http://xn--wgv71a119e.jp/x' || si
        |    WHEN 3 THEN 'http://plain' || si || '.example.com/y'
        |    ELSE 'http://xn--mnchen-3ya.de/z' || si END AS url_norm,
        |  CASE m
        |    WHEN 0 THEN 'xn--bcher-kva.example'
        |    WHEN 1 THEN 'xn--mnchen-3ya.de'
        |    WHEN 2 THEN 'xn--wgv71a119e.jp'
        |    WHEN 3 THEN 'plain' || si || '.example.com'
        |    ELSE 'xn--mnchen-3ya.de' END AS host
        |FROM t ORDER BY id""".stripMargin,

    "text_html_meta" ->
      """WITH t AS (SELECT i, CAST(i AS VARCHAR) AS si,
        |    CAST(i % 6 AS VARCHAR) AS s6 FROM range(100) r(i))
        |SELECT i AS id,
        |  CASE i % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr'
        |    ELSE 'zh' END AS lang,
        |  'Page ' || si AS title,
        |  'Summary ' || si || ' & more' AS description,
        |  'Site' || s6 AS site,
        |  'http://www.ex' || s6 || '.com/page/' || CAST(i % 20 AS VARCHAR)
        |    || '?v=' || CAST(i % 10 AS VARCHAR) AS canon_norm
        |FROM t ORDER BY id""".stripMargin,

    "url_sitemap_parse" ->
      """WITH t AS (SELECT i, i % 4 AS m, CAST(i % 5 AS VARCHAR) AS h,
        |    CAST(i AS VARCHAR) AS si, 3 + i % 3 AS nu FROM range(60) r(i)),
        |us AS (SELECT i, 'urlset' AS kind, j AS url_ix,
        |    'https://ex' || h || '.org/p/' || si || '/' || CAST(j AS VARCHAR)
        |      || '?a=1&b=' || CAST(j AS VARCHAR) AS loc,
        |    '2026-0' || CAST(1 + j % 9 AS VARCHAR) || '-01' AS lastmod,
        |    CAST(j AS INT) AS pri_tenths
        |  FROM t CROSS JOIN range(5) rr(j) WHERE m <> 3 AND j < nu),
        |si AS (SELECT i, 'sitemapindex' AS kind, j AS url_ix,
        |    'https://ex' || h || '.org/sm/' || si || '/' || CAST(j AS VARCHAR)
        |      || '.xml.gz' AS loc,
        |    '2026-03-01' AS lastmod, CAST(-1 AS INT) AS pri_tenths
        |  FROM t CROSS JOIN range(2) rr(j) WHERE m = 3)
        |SELECT i AS sm_id, kind, CAST(url_ix AS INT) AS url_ix, loc, lastmod, pri_tenths
        |FROM (SELECT * FROM us UNION ALL SELECT * FROM si)
        |ORDER BY sm_id, url_ix""".stripMargin,

    // normalization collapses the 250 shop variants to 50 canonical
    // URLs (query is utm-only → dropped; case/port normalized); robots
    // kills the .pdf arm; the seen set removes items 0-19; github
    // posts are all distinct — every stage's effect is visible in the
    // per-domain counts
    "pipeline_frontier" ->
      """WITH shop AS (SELECT DISTINCT i % 50 AS k FROM range(250) r(i)),
        |u AS (
        |  SELECT 'shop' || CAST(k % 10 AS VARCHAR) || '.com' AS domain
        |  FROM shop WHERE k >= 20
        |  UNION ALL
        |  SELECT 'u' || CAST(i % 7 AS VARCHAR) || '.github.io' FROM range(250) r(i))
        |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls
        |FROM u GROUP BY domain ORDER BY domain""".stripMargin,

    // each arm's eTLD+1 is pinned by the published list: normal ccTLD
    // registries keep site+suffix, *.ck makes b<i>.test.ck the
    // registrable domain, !city.kawasaki.jp collapses to the exception
    "url_psl_full" ->
      """WITH t AS (SELECT i, i % 14 AS m, CAST(i AS VARCHAR) AS si FROM range(280) r(i)),
        |s AS (SELECT i, m, si,
        |  CASE m WHEN 0 THEN 'com.sg' WHEN 1 THEN 'co.th' WHEN 2 THEN 'com.tr'
        |         WHEN 3 THEN 'com.ua' WHEN 4 THEN 'org.nz' WHEN 5 THEN 'com.ar'
        |         WHEN 6 THEN 'co.il' WHEN 7 THEN 'com.my' WHEN 8 THEN 'com.eg'
        |         WHEN 9 THEN 'k12.ak.us' WHEN 10 THEN 'fly.dev'
        |         ELSE 'myshopify.com' END AS sfx FROM t)
        |SELECT i AS id,
        |  CASE WHEN m = 12 THEN 'a' || si || '.b' || si || '.test.ck'
        |       WHEN m = 13 THEN 'x' || si || '.city.kawasaki.jp'
        |       ELSE 'w' || si || '.site' || si || '.' || sfx END AS host,
        |  CASE WHEN m = 12 THEN 'b' || si || '.test.ck'
        |       WHEN m = 13 THEN 'city.kawasaki.jp'
        |       ELSE 'site' || si || '.' || sfx END AS domain
        |FROM s ORDER BY id""".stripMargin,

    // the scale path (Bloom prefilter + pruned-shard md5 verify) is
    // result-identical to these two plain anti-joins — batch 2 also
    // anti-joins batch 1's accepted set because it was appended to the
    // index between the probes
    "pipeline_frontier_incremental" ->
      """WITH hist AS (SELECT 'http://h' || CAST(i % 13 AS VARCHAR) || '.example.com/p/' || CAST(i AS VARCHAR) AS url
        |  FROM range(400) r(i)),
        |b1 AS (SELECT CASE WHEN i % 3 = 0
        |    THEN 'http://h' || CAST(i % 13 AS VARCHAR) || '.example.com/p/' || CAST(i AS VARCHAR)
        |    ELSE 'http://n' || CAST(i % 9 AS VARCHAR) || '.org/q/' || CAST(i AS VARCHAR) END AS url
        |  FROM range(300) r(i)),
        |acc1 AS (SELECT url FROM b1 WHERE url NOT IN (SELECT url FROM hist)),
        |b2 AS (SELECT CASE i % 4
        |    WHEN 0 THEN 'http://h' || CAST(i % 13 AS VARCHAR) || '.example.com/p/' || CAST(i AS VARCHAR)
        |    WHEN 1 THEN 'http://n' || CAST(i % 9 AS VARCHAR) || '.org/q/' || CAST(i AS VARCHAR)
        |    WHEN 2 THEN 'http://fresh' || CAST(i % 6 AS VARCHAR) || '.net/z/' || CAST(i AS VARCHAR)
        |    ELSE 'http://h' || CAST(i % 13 AS VARCHAR) || '.example.com/p/' || CAST(i + 1000 AS VARCHAR) END AS url
        |  FROM range(300) r(i)),
        |acc2 AS (SELECT url FROM b2 WHERE url NOT IN (SELECT url FROM hist)
        |  AND url NOT IN (SELECT url FROM acc1))
        |SELECT CAST(1 AS INT) AS batch, url FROM acc1
        |UNION ALL SELECT CAST(2 AS INT), url FROM acc2
        |ORDER BY batch, url""".stripMargin,

    // due = crawled AND lastmod strictly after the stored last_crawl:
    // only the i%3=0 arm (+4 days) qualifies; equal (+0) and older
    // (-2) do not, and never-crawled urls belong to the discovery
    // feed, not this one
    "frontier_recrawl" ->
      """WITH h AS (SELECT i, 'http://r' || CAST(i % 7 AS VARCHAR) || '.com/p/' || CAST(i AS VARCHAR) AS url,
        |    100 + i % 10 AS day FROM range(200) r(i))
        |SELECT url, CAST(day AS BIGINT) AS last_crawl,
        |  CAST(day + 4 AS BIGINT) AS signal
        |FROM h WHERE i % 3 = 0 ORDER BY url""".stripMargin,

    // three power iterations unrolled: contributions are truncating
    // integer divisions (DuckDB // == Spark div on positives), sums
    // are BIGINT — bit-exact replay of the integer PageRank
    "crawl_pagerank" ->
      """WITH raw AS (SELECT DISTINCT 'h' || CAST(i % 20 AS VARCHAR) AS src,
        |    'h' || CAST((i * 7 + 3) % 20 AS VARCHAR) AS dst FROM range(200) r(i)),
        |edges AS (SELECT src, dst FROM raw
        |  UNION ALL SELECT 'h3', 'sink.example.org'),
        |outd AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        |nodes AS (SELECT src AS n FROM edges UNION SELECT dst FROM edges),
        |r0 AS (SELECT n, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (SELECT e.dst AS n, SUM(((r0.r * 850000) // 1000000) // outd.d) AS c
        |  FROM edges e JOIN r0 ON r0.n = e.src JOIN outd ON outd.src = e.src GROUP BY e.dst),
        |r1 AS (SELECT nodes.n, CAST(150000 + COALESCE(c1.c, 0) AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c1 ON c1.n = nodes.n),
        |c2 AS (SELECT e.dst AS n, SUM(((r1.r * 850000) // 1000000) // outd.d) AS c
        |  FROM edges e JOIN r1 ON r1.n = e.src JOIN outd ON outd.src = e.src GROUP BY e.dst),
        |r2 AS (SELECT nodes.n, CAST(150000 + COALESCE(c2.c, 0) AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c2 ON c2.n = nodes.n),
        |c3 AS (SELECT e.dst AS n, SUM(((r2.r * 850000) // 1000000) // outd.d) AS c
        |  FROM edges e JOIN r2 ON r2.n = e.src JOIN outd ON outd.src = e.src GROUP BY e.dst),
        |r3 AS (SELECT nodes.n, CAST(150000 + COALESCE(c3.c, 0) AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c3 ON c3.n = nodes.n)
        |SELECT n AS host, r AS rank_micros FROM r3 ORDER BY host""".stripMargin,

    // the conversion record's text is heading + newline + normalized
    // doc text (the extractor's length gate keeps short bodies out) —
    // all reconstructible from the raw documents via the
    // escape→decode identity; length() counts code points both engines
    "pipeline_wet" ->
      """WITH d AS (SELECT doc_id,
        |    trim(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g')) AS nt
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, 'conversion' AS rec_type, 'text/plain' AS content_type,
        |  CAST(length('WET extraction heading for conversion records' ||
        |    CASE WHEN length(nt) >= 25 THEN chr(10) || nt ELSE '' END) AS BIGINT)
        |    AS n_chars
        |FROM d ORDER BY doc_id""".stripMargin,

    // sitemap membership (two sitemaps for even domains), the
    // seen-set as IN/NOT IN over the history formula, due = signal
    // beats the stored clock 110, cap by staleness then url, HRW +
    // slots replayed
    "pipeline_crawl_bootstrap" ->
      """WITH doms AS (SELECT k, 'bs' || CAST(k AS VARCHAR) || '.org' AS domain
        |  FROM range(8) t(k)),
        |e AS (
        |  SELECT k, domain,
        |    'https://' || domain || '/p/' || CAST(j AS VARCHAR) AS url,
        |    CASE WHEN j % 2 = 0 THEN 115 ELSE 105 END AS signal
        |  FROM doms CROSS JOIN range(10) r(j)
        |  UNION ALL
        |  SELECT k, domain,
        |    'https://' || domain || '/q/' || CAST(j AS VARCHAR),
        |    CASE WHEN j % 2 = 0 THEN 115 ELSE 105 END
        |  FROM doms CROSS JOIN range(5) r(j) WHERE k % 2 = 0),
        |hist AS (SELECT 'https://bs' || CAST(k AS VARCHAR) || '.org/p/' || CAST(j AS VARCHAR) AS url
        |  FROM range(8) t(k) CROSS JOIN range(6) r(j)),
        |feed AS (
        |  SELECT domain, url, CAST(signal AS BIGINT) AS priority FROM e
        |  WHERE url NOT IN (SELECT url FROM hist)
        |  UNION ALL
        |  SELECT domain, url, CAST(signal AS BIGINT) FROM e
        |  WHERE url IN (SELECT url FROM hist) AND signal > 110),
        |capped AS (SELECT domain, url, priority FROM (
        |    SELECT domain, url, priority,
        |      ROW_NUMBER() OVER (PARTITION BY domain ORDER BY priority DESC, url) AS rn
        |    FROM feed) WHERE rn <= 6),
        |fa AS (SELECT domain,
        |    arg_max(fch, ('0x' || substr(md5(domain || '|' || CAST(fch AS VARCHAR)), 1, 15))::BIGINT) AS fetcher
        |  FROM (SELECT DISTINCT domain FROM capped) CROSS JOIN range(4) r(fch)
        |  GROUP BY domain)
        |SELECT c.url, c.domain, c.priority, CAST(fa.fetcher AS INT) AS fetcher,
        |  CAST((ROW_NUMBER() OVER (PARTITION BY c.domain ORDER BY c.url) - 1) * 1000 AS BIGINT) AS slot_ms
        |FROM capped c JOIN fa USING (domain)
        |ORDER BY url""".stripMargin,

    // every WAT field reconstructs from the raw documents: the title
    // and links come from the fixture scaffold, entity_length is the
    // BYTE length of the page (strlen) with the html-escape chain
    // replayed exactly, and the JSON layer cancels out because Spark
    // re-parses the envelope with its own JSON parser
    "pipeline_wat" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title></head><body>' ||
        |  '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li></ul></nav>' ||
        |  '<h1>WAT extraction heading</h1><p>' ||
        |  replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
        |  '</p><footer>(c) graft corpus</footer></body></html>' AS html
        |  FROM d)
        |SELECT doc_id, 'metadata' AS rec_type, 'application/json' AS content_type,
        |  'Doc ' || CAST(doc_id AS VARCHAR) AS title,
        |  CAST(200 AS INT) AS status,
        |  CAST(strlen(html) AS BIGINT) AS entity_length,
        |  CAST(2 AS INT) AS n_links,
        |  '/' AS link0, '/about' AS link1,
        |  'response' AS src_type
        |FROM h ORDER BY doc_id""".stripMargin,

    // every SURT canonicalization rule restated as string construction
    "cdx_surt" ->
      """WITH t AS (SELECT i, i % 10 AS m, CAST(i AS VARCHAR) AS si,
        |    CAST(i % 9 AS VARCHAR) AS s9, CAST(i % 4 AS VARCHAR) AS s4 FROM range(240) r(i))
        |SELECT i AS id,
        |  CASE m
        |    WHEN 0 THEN 'com,example' || s9 || ')/a/page' || si || '.html?a=1&b=2'
        |    WHEN 1 THEN 'org,example,blog' || si || ')/'
        |    WHEN 2 THEN '192.168.' || s4 || '.1:8080)/x'
        |    WHEN 3 THEN 'uk,co,shop,sub' || si || ')/items//list/?y=a&z=9'
        |    WHEN 4 THEN 'ck,www)/p' || si
        |    WHEN 5 THEN 'com,example' || si || ')/d'
        |    WHEN 6 THEN 'com,example,host' || si || ':8443)/p?q=' || si
        |    WHEN 7 THEN 'io,a' || si || ')/'
        |    WHEN 8 THEN 'com,example,auth)/s'
        |    ELSE 'org,sp' || si || ')/my%20doc?a=' || si || '&b=1' END AS surt
        |FROM t ORDER BY id""".stripMargin,

    // key/timestamp/mime/status reconstructed from the raw documents;
    // the pointer fields' presence is stated (their values are
    // compression output — CdxSpec proves them by ranged read)
    "pipeline_cdx" ->
      """SELECT doc_id,
        |  'org,example,c' || CAST(doc_id % 13 AS VARCHAR) || ')/d/' ||
        |    CAST(doc_id AS VARCHAR) AS surt,
        |  '20260101000000' AS ts, 'text/html' AS mime,
        |  CAST(200 AS INT) AS status, TRUE AS has_pointer
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,

    // the build→prune→filter loop replayed as a plain filter over the
    // formula corpus: the pruned shard scan must be invisible in the
    // ANSWER (only in the plan/IO), so green pins bit-equality
    "cdx_lookup" ->
      """WITH t AS (SELECT i FROM range(4000) r(i) WHERE i % 40 = 17 AND i % 7 = 3)
        |SELECT 'org,site3,h17)/p/' || CAST(i AS VARCHAR) AS surt,
        |  lpad(CAST(i % 97 AS VARCHAR), 14, '0') AS ts,
        |  'https://h17.site3.org/p/' || CAST(i AS VARCHAR) AS url,
        |  i AS "offset", 100 + i % 9 AS "length"
        |FROM t ORDER BY surt""".stripMargin,

    // compaction + vacuum must not change a single answer bit: the
    // same replay as cdx_lookup
    "cdx_compact_lookup" ->
      """WITH t AS (SELECT i FROM range(4000) r(i) WHERE i % 40 = 17 AND i % 7 = 3)
        |SELECT 'org,site3,h17)/p/' || CAST(i AS VARCHAR) AS surt,
        |  lpad(CAST(i % 97 AS VARCHAR), 14, '0') AS ts,
        |  'https://h17.site3.org/p/' || CAST(i AS VARCHAR) AS url,
        |  i AS "offset", 100 + i % 9 AS "length"
        |FROM t ORDER BY surt""".stripMargin,

    // the request-set intersection replayed: ids ≡ 0 (mod 9) below
    // 4000 hit; 4000-4099 were never captured and match nothing
    "cdx_batch_lookup" ->
      """WITH t AS (SELECT i FROM range(4000) r(i) WHERE i % 9 = 0)
        |SELECT 'org,site' || CAST(i % 7 AS VARCHAR) || ',h' || CAST(i % 40 AS VARCHAR)
        |    || ')/p/' || CAST(i AS VARCHAR) AS surt,
        |  lpad(CAST(i % 97 AS VARCHAR), 14, '0') AS ts,
        |  'https://h' || CAST(i % 40 AS VARCHAR) || '.site' || CAST(i % 7 AS VARCHAR)
        |    || '.org/p/' || CAST(i AS VARCHAR) AS url,
        |  i AS "offset"
        |FROM t ORDER BY surt""".stripMargin,

    // one planted content's capture set replayed from the
    // digest-planting formula
    "cdx_digest_lookup" ->
      """WITH t AS (SELECT i FROM range(4000) r(i) WHERE i % 500 = 137)
        |SELECT 'd137' AS digest,
        |  'org,site' || CAST(i % 7 AS VARCHAR) || ',h' || CAST(i % 40 AS VARCHAR)
        |    || ')/p/' || CAST(i AS VARCHAR) AS surt,
        |  lpad(CAST(i % 97 AS VARCHAR), 14, '0') AS ts,
        |  'https://h' || CAST(i % 40 AS VARCHAR) || '.site' || CAST(i % 7 AS VARCHAR)
        |    || '.org/p/' || CAST(i AS VARCHAR) AS url,
        |  i AS "offset"
        |FROM t ORDER BY surt, ts""".stripMargin,

    // the exactly-once streamed-master surface replayed: host captures
    // from the primary master (each exactly once despite the doubled
    // epoch-1 delivery and the tiered fold) UNION one content's
    // capture set from the digest master
    "pipeline_crawl_stream_index" ->
      """WITH a AS (
        |  SELECT 'host' AS kind,
        |    'org,site3,h17)/p/' || CAST(i AS VARCHAR) AS surt,
        |    lpad(CAST(i % 97 AS VARCHAR), 14, '0') AS ts,
        |    'https://h17.site3.org/p/' || CAST(i AS VARCHAR) AS url,
        |    i AS "offset"
        |  FROM range(4000) r(i) WHERE i % 40 = 17 AND i % 7 = 3
        |  UNION ALL
        |  SELECT 'digest',
        |    'org,site' || CAST(i % 7 AS VARCHAR) || ',h' || CAST(i % 40 AS VARCHAR)
        |      || ')/p/' || CAST(i AS VARCHAR),
        |    lpad(CAST(i % 97 AS VARCHAR), 14, '0'),
        |    'https://h' || CAST(i % 40 AS VARCHAR) || '.site' || CAST(i % 7 AS VARCHAR)
        |      || '.org/p/' || CAST(i AS VARCHAR),
        |    i
        |  FROM range(4000) r(i) WHERE i % 500 = 137)
        |SELECT kind, surt, ts, url, "offset" FROM a ORDER BY kind, surt, ts""".stripMargin,

    // the digest-set intersection replayed: captures whose planted
    // digest index is ≡ 0 (mod 37) hit; requested hashes d500–d599
    // were never planted and match nothing; doubled requests do not
    // duplicate rows
    "cdx_digest_batch" ->
      """WITH t AS (SELECT i FROM range(4000) r(i) WHERE (i % 500) % 37 = 0)
        |SELECT 'd' || CAST(i % 500 AS VARCHAR) AS digest,
        |  'org,site' || CAST(i % 7 AS VARCHAR) || ',h' || CAST(i % 40 AS VARCHAR)
        |    || ')/p/' || CAST(i AS VARCHAR) AS surt,
        |  lpad(CAST(i % 97 AS VARCHAR), 14, '0') AS ts,
        |  'https://h' || CAST(i % 40 AS VARCHAR) || '.site' || CAST(i % 7 AS VARCHAR)
        |    || '.org/p/' || CAST(i AS VARCHAR) AS url,
        |  i AS "offset"
        |FROM t ORDER BY digest, surt""".stripMargin,

    // each request arm's nearest capture replayed from the planting
    // formulas: before-first → forward to crawl 1; 6 h after crawl 1 →
    // crawl 1; the exact 12 h midpoint ties to the EARLIER crawl 1;
    // 20 h after crawl 2 (4 h before crawl 3) → crawl 3
    "cdx_nearest_lookup" ->
      """WITH b AS (SELECT i AS base, CAST(i % 20 AS VARCHAR) AS h,
        |    CAST(i AS VARCHAR) AS sb FROM range(1000) r(i))
        |SELECT 'org,ex,h' || h || ')/p/' || sb AS surt,
        |  CASE CAST(base % 4 AS INT)
        |    WHEN 0 THEN '20251230000000'
        |    WHEN 1 THEN '20260101060000'
        |    WHEN 2 THEN '20260101120000'
        |    ELSE '20260102200000' END AS want_ts,
        |  CASE WHEN base % 4 = 3 THEN '20260103000000'
        |       ELSE '20260101000000' END AS ts,
        |  CASE WHEN base % 4 = 3 THEN 'f2.warc.gz'
        |       ELSE 'f0.warc.gz' END AS filename,
        |  base AS "offset"
        |FROM b ORDER BY surt""".stripMargin,

    // the same nearest arms, resolved through the engine-composed
    // prune-then-resolve path against the stored 3-generation master —
    // the answer must be identical to the raw spine's
    "cdx_nearest_at" ->
      """WITH b AS (SELECT i AS base, CAST(i % 20 AS VARCHAR) AS h,
        |    CAST(i AS VARCHAR) AS sb FROM range(1000) r(i))
        |SELECT 'org,ex,h' || h || ')/p/' || sb AS surt,
        |  CASE CAST(base % 4 AS INT)
        |    WHEN 0 THEN '20251230000000'
        |    WHEN 1 THEN '20260101060000'
        |    WHEN 2 THEN '20260101120000'
        |    ELSE '20260102200000' END AS want_ts,
        |  CASE WHEN base % 4 = 3 THEN '20260103000000'
        |       ELSE '20260101000000' END AS ts,
        |  CASE WHEN base % 4 = 3 THEN 'f2.warc.gz'
        |       ELSE 'f0.warc.gz' END AS filename,
        |  base AS "offset"
        |FROM b ORDER BY surt""".stripMargin,

    // one URI's timeline replayed: captures with i % 40 = 7, ordered
    // (ts, filename, offset) — duplicate instants fall to the pointer
    // tiebreak — then seq/page arithmetic at pageSize 3
    "cdx_timemap" ->
      """WITH t AS (SELECT i, 1 + (i // 40) % 5 AS day
        |    FROM range(400) r(i) WHERE i % 40 = 7),
        |  o AS (SELECT
        |    '202601' || lpad(CAST(day AS VARCHAR), 2, '0') || '000000' AS ts,
        |    'https://h7.ex.org/p/7' AS url,
        |    'd' || CAST(i % 5 AS VARCHAR) AS digest,
        |    'f' || CAST(i % 3 AS VARCHAR) || '.warc.gz' AS filename,
        |    i AS "offset", CAST(100 + i % 9 AS BIGINT) AS length
        |  FROM t)
        |SELECT CAST((ROW_NUMBER() OVER w - 1) // 3 AS BIGINT) AS page,
        |  CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS seq,
        |  ts, url, digest, filename, "offset", length
        |FROM o WINDOW w AS (ORDER BY ts, filename, "offset")
        |ORDER BY seq""".stripMargin,

    // the maintenance ledger stated outright: rows per epoch, the
    // generation counts around the size-tiered fold at maxGens = 2,
    // and NO row for the replayed delivery of epoch 1
    "cdx_epoch_metrics" ->
      """SELECT * FROM (VALUES
        |  ('epoch-0', CAST(20 AS BIGINT), CAST(1 AS INTEGER), CAST(1 AS INTEGER),
        |    CAST(0 AS INTEGER)),
        |  ('epoch-1', CAST(30 AS BIGINT), CAST(2 AS INTEGER), CAST(2 AS INTEGER),
        |    CAST(0 AS INTEGER)),
        |  ('epoch-2', CAST(40 AS BIGINT), CAST(3 AS INTEGER), CAST(2 AS INTEGER),
        |    CAST(2 AS INTEGER)))
        |  t(epoch, "rows", gens_before, gens_after, gens_folded)
        |ORDER BY epoch""".stripMargin,

    // the era-bound listing replayed: host h7's middle-crawl captures
    // only (base % 20 = 7, crawl 1 → year 2027)
    "cdx_lookup_timebound" ->
      """WITH b AS (SELECT i AS base FROM range(1000) r(i) WHERE i % 20 = 7)
        |SELECT 'org,ex,h7)/p/' || CAST(base AS VARCHAR) AS surt,
        |  '20270101000000' AS ts,
        |  'https://h7.ex.org/p/' || CAST(base AS VARCHAR) AS url,
        |  'f1.warc.gz' AS filename,
        |  base AS "offset"
        |FROM b ORDER BY surt""".stripMargin,

    // the era-bound domain sweep replayed: every host's middle-crawl
    // captures (crawl 1 → year 2027), all 1000 URLs
    "cdx_domain_timebound" ->
      """SELECT 'org,ex,h' || CAST(i % 20 AS VARCHAR) || ')/p/' || CAST(i AS VARCHAR) AS surt,
        |  '20270101000000' AS ts,
        |  'https://h' || CAST(i % 20 AS VARCHAR) || '.ex.org/p/' || CAST(i AS VARCHAR) AS url,
        |  i AS "offset"
        |FROM range(1000) r(i) ORDER BY surt""".stripMargin,

    // the collapse thinning replayed: per URL of host h3, the ts:6
    // collapse keeps the first capture of each month (c ∈ {0,2,4});
    // the digest collapse keeps the version CHANGES (c ∈ {0,3})
    "cdx_collapse" ->
      """WITH b AS (SELECT i AS base FROM range(100) r(i) WHERE i % 5 = 3),
        |c AS (SELECT base, j AS c FROM b, range(6) r2(j)),
        |rows_ts AS (
        |  SELECT 'org,ex,h3)/p/' || CAST(base AS VARCHAR) AS surt,
        |    '2026' || lpad(CAST(1 + c // 2 AS VARCHAR), 2, '0')
        |      || lpad(CAST(1 + c AS VARCHAR), 2, '0') || '000000' AS ts,
        |    'd' || CAST(base AS VARCHAR) || '_' || CAST(c // 3 AS VARCHAR) AS digest
        |  FROM c WHERE c IN (0, 2, 4)),
        |rows_chg AS (
        |  SELECT 'org,ex,h3)/p/' || CAST(base AS VARCHAR) AS surt,
        |    '2026' || lpad(CAST(1 + c // 2 AS VARCHAR), 2, '0')
        |      || lpad(CAST(1 + c AS VARCHAR), 2, '0') || '000000' AS ts,
        |    'chg:d' || CAST(base AS VARCHAR) || '_' || CAST(c // 3 AS VARCHAR) AS digest
        |  FROM c WHERE c IN (0, 3))
        |SELECT * FROM rows_ts UNION ALL SELECT * FROM rows_chg
        |ORDER BY surt, ts, digest""".stripMargin,

    // the latest-per-URL banner replayed: every h7 key re-captured in
    // crawl 1, so the winner set is exactly the 2027 rows
    "cdx_latest" ->
      """WITH b AS (SELECT i AS base FROM range(200) r(i) WHERE i % 10 = 7)
        |SELECT 'org,ex,h7)/p/' || CAST(base AS VARCHAR) AS surt,
        |  '202701' || lpad(CAST(1 + base % 28 AS VARCHAR), 2, '0') || '000000' AS ts,
        |  'https://h7.ex.org/p/' || CAST(base AS VARCHAR) AS url,
        |  'd' || CAST(base AS VARCHAR) || '_1' AS digest,
        |  base AS "offset"
        |FROM b ORDER BY surt""".stripMargin,

    // the resume-key page walk replayed: the host's captures in
    // (surt, ts, filename, offset) order, row_number split into pages
    // of 4 — any boundary skip/repeat diverges
    "cdx_resume_page" ->
      """WITH t AS (SELECT i FROM range(4000) r(i) WHERE i % 40 = 17 AND i % 7 = 3),
        |  o AS (SELECT
        |    'org,site3,h17)/p/' || CAST(i AS VARCHAR) AS surt,
        |    lpad(CAST(i % 97 AS VARCHAR), 14, '0') AS ts,
        |    'https://h17.site3.org/p/' || CAST(i AS VARCHAR) AS url,
        |    'f' || CAST(i % 16 AS VARCHAR) || '.warc.gz' AS filename,
        |    i AS "offset"
        |  FROM t)
        |SELECT CAST((ROW_NUMBER() OVER w - 1) // 4 AS INTEGER) AS page,
        |  surt, ts, url, "offset"
        |FROM o WINDOW w AS (ORDER BY surt, ts, filename, "offset")
        |ORDER BY page, surt, ts, "offset"""".stripMargin,

    // host/TLD/eTLD+1 derivation + per-domain rollup replayed from the
    // same formulas
    "cdx_columnar" ->
      """WITH t AS (SELECT i, i % 7 AS k, i % 40 AS h FROM range(4000) r(i))
        |SELECT 'org' AS url_host_tld,
        |  'site' || CAST(k AS VARCHAR) || '.org' AS url_host_registered_domain,
        |  COUNT(*) AS n_captures,
        |  CAST(COUNT(DISTINCT h) AS BIGINT) AS n_hosts,
        |  MIN('org,site' || CAST(k AS VARCHAR) || ',h' || CAST(h AS VARCHAR)
        |      || ')/p/' || CAST(i AS VARCHAR)) AS first_key,
        |  CAST(SUM(100 + i % 9) AS BIGINT) AS total_bytes
        |FROM t GROUP BY k ORDER BY url_host_registered_domain""".stripMargin,

    // capture/version counts, fetch-time span and the rate replayed
    // from the same three-crawl digest formulas
    "cdx_change_rate" ->
      """WITH b AS (SELECT i AS base, CAST(i % 20 AS VARCHAR) AS h,
        |    CAST(i AS VARCHAR) AS sb FROM range(1000) r(i))
        |SELECT 'org,ex,h' || h || ')/p/' || sb AS surt,
        |  CAST(3 AS BIGINT) AS n_captures,
        |  CAST(CASE WHEN base % 4 = 0 THEN 3
        |            WHEN base % 4 = 1 THEN 2 ELSE 1 END AS BIGINT) AS n_versions,
        |  '20260101000000' AS first_ts, '20260103000000' AS last_ts,
        |  CAST(CASE WHEN base % 4 = 0 THEN 1.0
        |            WHEN base % 4 = 1 THEN 0.5 ELSE 0.0 END AS DOUBLE) AS change_rate
        |FROM b ORDER BY surt""".stripMargin,

    // the drifted quarter + the changed-once quarter survive the
    // init → append → append → merge-on-read → aggregate loop
    "cdx_merge_stats" ->
      """WITH b AS (SELECT i AS base, CAST(i % 20 AS VARCHAR) AS h,
        |    CAST(i AS VARCHAR) AS sb FROM range(1000) r(i) WHERE i % 4 < 2)
        |SELECT 'org,ex,h' || h || ')/p/' || sb AS surt,
        |  CAST(3 AS BIGINT) AS n_captures,
        |  CAST(CASE WHEN base % 4 = 0 THEN 3 ELSE 2 END AS BIGINT) AS n_versions,
        |  CAST(CASE WHEN base % 4 = 0 THEN 1.0 ELSE 0.5 END AS DOUBLE) AS change_rate
        |FROM b ORDER BY surt""".stripMargin,

    // one host's entities reconstructed from the raw documents via the
    // escape→byte-length identity (the pipeline_wat convention); the
    // seek/gunzip mechanics are pinned byte-level in CdxSpec
    "pipeline_cdx_fetch" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |    WHERE text IS NOT NULL AND doc_id % 13 = 5),
        |h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title></head><body>' ||
        |  '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li></ul></nav>' ||
        |  '<h1>CDX fetch heading</h1><p>' ||
        |  replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
        |  '</p><footer>(c) graft corpus</footer></body></html>' AS html
        |  FROM d)
        |SELECT doc_id, CAST(200 AS INT) AS status,
        |  CAST(strlen(html) AS BIGINT) AS entity_length
        |FROM h ORDER BY doc_id""".stripMargin,

    // compaction must be invisible in the answer: one host's entities
    // reconstructed from the raw documents via the escape→byte-length
    // identity, fetched through REWRITTEN pointers
    "pipeline_archive_compact" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |    WHERE text IS NOT NULL AND doc_id % 13 = 5),
        |h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title></head><body>' ||
        |  '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li></ul></nav>' ||
        |  '<h1>Compacted archive</h1><p>' ||
        |  replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
        |  '</p><footer>(c) graft corpus</footer></body></html>' AS html
        |  FROM d)
        |SELECT doc_id, CAST(200 AS INT) AS status,
        |  CAST(strlen(html) AS BIGINT) AS entity_length
        |FROM h ORDER BY doc_id""".stripMargin,

    // record types, the replay flag and the exact served byte length
    // per doc, replayed from the raw documents: revisits (doc_id%3=0)
    // serve the V1 body, changed pages the longer V2 body
    "pipeline_wayback" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title></head><body>' ||
        |  '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li></ul></nav>' ||
        |  '<h1>' || CASE WHEN doc_id % 3 = 0 THEN 'Wayback v1' ELSE 'Wayback v2 changed' END ||
        |  '</h1><p>' ||
        |  replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
        |  '</p><footer>(c) graft corpus</footer></body></html>' AS html
        |  FROM d)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'revisit' ELSE 'response' END AS rec_type,
        |  doc_id % 3 = 0 AS replayed,
        |  CAST(strlen(html) AS BIGINT) AS entity_length
        |FROM h ORDER BY doc_id""".stripMargin,

    // the chain arms replayed from the planting formulas: direct 0
    // hops, single-301 1 hop, 2-chain 2 hops, cycles unresolved (-1)
    // serving the 5-byte redirect body; resolved arms serve the
    // terminal page's exact byte length
    "pipeline_wayback_redirects" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title></head><body>' ||
        |  '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li></ul></nav>' ||
        |  '<h1>Redirect target</h1><p>' ||
        |  replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
        |  '</p><footer>(c) graft corpus</footer></body></html>' AS html
        |  FROM d)
        |SELECT doc_id,
        |  doc_id % 4 <> 3 AS resolved,
        |  CAST(CASE WHEN doc_id % 4 = 3 THEN -1 ELSE doc_id % 4 END AS BIGINT) AS hops,
        |  CAST(CASE WHEN doc_id % 4 = 3 THEN 5 ELSE strlen(html) END AS BIGINT) AS entity_length
        |FROM h ORDER BY doc_id""".stripMargin,

    // Crawl-delay is fixed per domain arm (absent → the 1s default),
    // so the oracle states the delay and replays fetchers + slots
    "crawl_schedule_robots" ->
      """WITH doms AS (SELECT k,
        |    'cd' || CAST(k AS VARCHAR) || '.org' AS domain,
        |    CASE WHEN k % 3 = 0 THEN 1000 ELSE (1 + k % 5) * 1000 END AS delay_ms
        |  FROM range(12) r(k)),
        |u AS (SELECT d.domain, d.delay_ms,
        |    'http://' || d.domain || '/p/' || lpad(CAST(i // 12 AS VARCHAR), 3, '0') AS url
        |  FROM range(240) r(i) JOIN doms d ON d.k = i % 12),
        |fa AS (SELECT domain,
        |    arg_max(f, ('0x' || substr(md5(domain || '|' || CAST(f AS VARCHAR)), 1, 15))::BIGINT) AS fetcher
        |  FROM (SELECT DISTINCT domain FROM u) CROSS JOIN range(4) r(f)
        |  GROUP BY domain)
        |SELECT u.url, u.domain, CAST(u.delay_ms AS BIGINT) AS delay_ms,
        |  CAST(fa.fetcher AS INT) AS fetcher,
        |  CAST((ROW_NUMBER() OVER (PARTITION BY u.domain ORDER BY u.url) - 1)
        |    * u.delay_ms AS BIGINT) AS slot_ms
        |FROM u JOIN fa USING (domain)
        |ORDER BY url""".stripMargin,

    // the whole loop turn from formulas: normalization + redirect
    // finals by construction, the persisted seen-set as NOT IN over
    // the history formula, the bounded-heap cap as its window twin,
    // HRW fetchers via the md5 arg_max chain, slots via row_number
    "pipeline_crawl_loop" ->
      """WITH d AS (SELECT i, i % 3 AS a, CAST(i AS VARCHAR) AS si FROM range(240) r(i)),
        |f AS (
        |  SELECT i, 'http://d' || CAST(i % 8 AS VARCHAR) || '.shop.com/p/' || si AS url,
        |         'shop.com' AS domain FROM d WHERE a = 0
        |  UNION ALL
        |  SELECT i, 'http://r' || CAST(i % 5 AS VARCHAR) || '.news.org/new/' || si,
        |         'news.org' FROM d WHERE a = 1
        |  UNION ALL
        |  SELECT i, 'http://u' || CAST(i % 7 AS VARCHAR) || '.github.io/post/' || si,
        |         'u' || CAST(i % 7 AS VARCHAR) || '.github.io' FROM d WHERE a = 2),
        |hist AS (SELECT 'http://d' || CAST(i % 8 AS VARCHAR) || '.shop.com/p/' || CAST(i AS VARCHAR) AS url
        |  FROM range(200) r(i)),
        |newu AS (SELECT url, domain, CAST(i AS DOUBLE) AS pr FROM f
        |  WHERE url NOT IN (SELECT url FROM hist)),
        |capped AS (SELECT url, domain FROM (
        |    SELECT url, domain,
        |      ROW_NUMBER() OVER (PARTITION BY domain ORDER BY pr DESC, url) AS rn
        |    FROM newu) WHERE rn <= 10),
        |fa AS (SELECT domain,
        |    arg_max(fch, ('0x' || substr(md5(domain || '|' || CAST(fch AS VARCHAR)), 1, 15))::BIGINT) AS fetcher
        |  FROM (SELECT DISTINCT domain FROM capped) CROSS JOIN range(4) r(fch)
        |  GROUP BY domain)
        |SELECT c.url, c.domain, CAST(fa.fetcher AS INT) AS fetcher,
        |  CAST((ROW_NUMBER() OVER (PARTITION BY c.domain ORDER BY c.url) - 1) * 500 AS BIGINT) AS slot_ms
        |FROM capped c JOIN fa USING (domain)
        |ORDER BY url""".stripMargin,

    // the ranked loop: three integer PageRank iterations unrolled over
    // the 20-host quadratic link graph (same truncating-division replay
    // as crawl_pagerank), the seen-set as NOT IN, the cap as its window
    // twin ordered by rank DESC, fetchers via the md5 arg_max chain
    "pipeline_crawl_loop_ranked" ->
      """WITH hosts AS (SELECT j,
        |    CASE WHEN j < 8 THEN 'd' || CAST(j AS VARCHAR) || '.shop.com'
        |         WHEN j < 13 THEN 'r' || CAST(j - 8 AS VARCHAR) || '.news.org'
        |         ELSE 'u' || CAST(j - 13 AS VARCHAR) || '.github.io' END AS h
        |  FROM range(20) t(j)),
        |edges AS (SELECT DISTINCT hs.h AS src, hd.h AS dst
        |  FROM range(200) r(i)
        |  JOIN hosts hs ON hs.j = i % 20
        |  JOIN hosts hd ON hd.j = (i * i + i * 3 + 7) % 20),
        |outd AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        |nodes AS (SELECT src AS n FROM edges UNION SELECT dst FROM edges),
        |r0 AS (SELECT n, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (SELECT e.dst AS n, SUM(((r0.r * 850000) // 1000000) // outd.d) AS c
        |  FROM edges e JOIN r0 ON r0.n = e.src JOIN outd ON outd.src = e.src GROUP BY e.dst),
        |r1 AS (SELECT nodes.n, CAST(150000 + COALESCE(c1.c, 0) AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c1 ON c1.n = nodes.n),
        |c2 AS (SELECT e.dst AS n, SUM(((r1.r * 850000) // 1000000) // outd.d) AS c
        |  FROM edges e JOIN r1 ON r1.n = e.src JOIN outd ON outd.src = e.src GROUP BY e.dst),
        |r2 AS (SELECT nodes.n, CAST(150000 + COALESCE(c2.c, 0) AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c2 ON c2.n = nodes.n),
        |c3 AS (SELECT e.dst AS n, SUM(((r2.r * 850000) // 1000000) // outd.d) AS c
        |  FROM edges e JOIN r2 ON r2.n = e.src JOIN outd ON outd.src = e.src GROUP BY e.dst),
        |r3 AS (SELECT nodes.n, CAST(150000 + COALESCE(c3.c, 0) AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c3 ON c3.n = nodes.n),
        |f AS (
        |  SELECT i, 'http://d' || CAST(i % 8 AS VARCHAR) || '.shop.com/p/' || CAST(i AS VARCHAR) AS url,
        |         'd' || CAST(i % 8 AS VARCHAR) || '.shop.com' AS host, 'shop.com' AS domain
        |  FROM range(240) r(i) WHERE i % 3 = 0
        |  UNION ALL
        |  SELECT i, 'http://r' || CAST(i % 5 AS VARCHAR) || '.news.org/new/' || CAST(i AS VARCHAR),
        |         'r' || CAST(i % 5 AS VARCHAR) || '.news.org', 'news.org'
        |  FROM range(240) r(i) WHERE i % 3 = 1
        |  UNION ALL
        |  SELECT i, 'http://u' || CAST(i % 7 AS VARCHAR) || '.github.io/post/' || CAST(i AS VARCHAR),
        |         'u' || CAST(i % 7 AS VARCHAR) || '.github.io',
        |         'u' || CAST(i % 7 AS VARCHAR) || '.github.io'
        |  FROM range(240) r(i) WHERE i % 3 = 2
        |  UNION ALL
        |  SELECT i, 'http://x' || CAST(i % 3 AS VARCHAR) || '.fresh.net/post/' || CAST(i AS VARCHAR),
        |         'x' || CAST(i % 3 AS VARCHAR) || '.fresh.net', 'fresh.net'
        |  FROM range(240, 252) r(i)),
        |hist AS (SELECT 'http://d' || CAST(i % 8 AS VARCHAR) || '.shop.com/p/' || CAST(i AS VARCHAR) AS url
        |  FROM range(200) r(i)),
        |newu AS (SELECT f.url, f.domain, COALESCE(r3.r, 0) AS pr
        |  FROM f LEFT JOIN r3 ON r3.n = f.host
        |  WHERE f.url NOT IN (SELECT url FROM hist)),
        |capped AS (SELECT url, domain, pr FROM (
        |    SELECT url, domain, pr,
        |      ROW_NUMBER() OVER (PARTITION BY domain ORDER BY pr DESC, url) AS rn
        |    FROM newu) WHERE rn <= 10),
        |fa AS (SELECT domain,
        |    arg_max(fch, ('0x' || substr(md5(domain || '|' || CAST(fch AS VARCHAR)), 1, 15))::BIGINT) AS fetcher
        |  FROM (SELECT DISTINCT domain FROM capped) CROSS JOIN range(4) r(fch)
        |  GROUP BY domain)
        |SELECT c.url, c.domain, c.pr AS rank_micros, CAST(fa.fetcher AS INT) AS fetcher,
        |  CAST((ROW_NUMBER() OVER (PARTITION BY c.domain ORDER BY c.url) - 1) * 500 AS BIGINT) AS slot_ms
        |FROM capped c JOIN fa USING (domain)
        |ORDER BY url""".stripMargin,

    // every arm's terminal and hop count is fixed by construction; the
    // 2-cycle's hops pin the pointer-doubling arithmetic (1→2→4→8→16→32
    // over the five ⌈log₂(16+1)⌉ rounds that guarantee 16-hop chains)
    // and resolved=false
    "frontier_redirects" ->
      """WITH t AS (SELECT i, i % 4 AS m,
        |    's' || CAST(i % 10 AS VARCHAR) || '.com' AS d,
        |    CAST(i AS VARCHAR) AS si FROM range(120) r(i)),
        |rows AS (
        |  SELECT 'http://' || d || '/start/' || si AS url,
        |    'http://' || d || '/final/' || si AS f, 2 AS hops, true AS res FROM t WHERE m = 0
        |  UNION ALL SELECT 'http://' || d || '/mid/' || si,
        |    'http://' || d || '/final/' || si, 1, true FROM t WHERE m = 0
        |  UNION ALL SELECT 'http://' || d || '/final/' || si,
        |    'http://' || d || '/final/' || si, 0, true FROM t WHERE m = 0
        |  UNION ALL SELECT 'http://' || d || '/solo/' || si,
        |    'http://' || d || '/solo/' || si, 0, true FROM t WHERE m = 1
        |  UNION ALL SELECT 'http://' || d || '/one/' || si,
        |    'http://' || d || '/fin/' || si, 1, true FROM t WHERE m = 2
        |  UNION ALL SELECT 'http://' || d || '/fin/' || si,
        |    'http://' || d || '/fin/' || si, 0, true FROM t WHERE m = 2
        |  UNION ALL SELECT 'http://' || d || '/loopa/' || si,
        |    'http://' || d || '/loopa/' || si, 32, false FROM t WHERE m = 3
        |  UNION ALL SELECT 'http://' || d || '/loopb/' || si,
        |    'http://' || d || '/loopb/' || si, 32, false FROM t WHERE m = 3)
        |SELECT url, f AS final_url, CAST(hops AS BIGINT) AS hops, res AS resolved
        |FROM rows ORDER BY url""".stripMargin,

    // unchanged payloads (i%3=0) become 0-byte revisit records, the
    // rest stay responses at their exact ASCII byte length; every
    // record carries a WARC-Payload-Digest after the marking pass
    "crawl_revisits" ->
      """WITH t AS (SELECT i, CAST(i AS VARCHAR) AS si FROM range(120) r(i))
        |SELECT i AS id,
        |  CASE WHEN i % 3 = 0 THEN 'revisit' ELSE 'response' END AS rec_type,
        |  CAST(CASE WHEN i % 3 = 0 THEN 0
        |       ELSE length('doc ' || si || ' body v2') END AS BIGINT) AS n_bytes,
        |  true AS digested
        |FROM t ORDER BY id""".stripMargin,

    // the at-or-before resolution and the resolved crawl's digest,
    // replayed from the day formulas
    "cdx_asof_lookup" ->
      """WITH b AS (SELECT i AS base, CAST(i AS VARCHAR) AS si,
        |    CAST(i % 20 AS VARCHAR) AS h,
        |    least(1 + i % 4, 3) AS cd FROM range(1000) r(i))
        |SELECT 'org,ex,h' || h || ')/p/' || si AS surt,
        |  '2026010' || CAST(1 + base % 4 AS VARCHAR) || '120000' AS want_ts,
        |  '2026010' || CAST(cd AS VARCHAR) || '000000' AS capture_ts,
        |  'd' || si || '-' || CAST(cd - 1 AS VARCHAR) AS digest
        |FROM b ORDER BY surt, want_ts""".stripMargin,

    // field order, '-' null mapping, digest prefixing and the casts
    // restated from the same line formulas
    "cdx_classic_ingest" ->
      """WITH t AS (SELECT i, CAST(i AS VARCHAR) AS si,
        |    CAST(i % 9 AS VARCHAR) AS h FROM range(300) r(i))
        |SELECT 'org,cl' || h || ')/p/' || si AS surt,
        |  '202601' || lpad(CAST(1 + i % 28 AS VARCHAR), 2, '0') || '000000' AS ts,
        |  'http://cl' || h || '.org/p/' || si AS url,
        |  CASE WHEN i % 5 = 0 THEN NULL ELSE 'text/html' END AS mime,
        |  CAST(CASE WHEN i % 5 = 0 THEN NULL ELSE 200 END AS INT) AS status,
        |  CASE WHEN i % 7 = 0 THEN NULL ELSE 'sha1:DIGEST' || si END AS digest,
        |  CAST(400 + i % 13 AS BIGINT) AS "length",
        |  CAST(i * 512 AS BIGINT) AS "offset",
        |  'f' || CAST(i % 4 AS VARCHAR) || '.warc.gz' AS filename
        |FROM t ORDER BY surt""".stripMargin,

    // index-sourced digests mark the same revisits byte-for-byte
    "crawl_revisits_cdx" ->
      """WITH t AS (SELECT i, CAST(i AS VARCHAR) AS si FROM range(120) r(i))
        |SELECT i AS id,
        |  CASE WHEN i % 3 = 0 THEN 'revisit' ELSE 'response' END AS rec_type,
        |  CAST(CASE WHEN i % 3 = 0 THEN 0
        |       ELSE length('doc ' || si || ' body v2') END AS BIGINT) AS n_bytes,
        |  true AS digested
        |FROM t ORDER BY id""".stripMargin,

    // version counts → integer priority formula → the cap's window twin
    "pipeline_recrawl_adaptive" ->
      """WITH b AS (SELECT i AS base, i % 20 AS h, (i // 20) % 4 AS arm
        |    FROM range(1000) r(i)),
        |p AS (SELECT 'org,ex,h' || CAST(h AS VARCHAR) AS rhost,
        |    'org,ex,h' || CAST(h AS VARCHAR) || ')/p/' || CAST(base AS VARCHAR) AS surt,
        |    CAST(7 * (1 + CASE WHEN arm = 0 THEN 100
        |                      WHEN arm = 1 THEN 50 ELSE 0 END) AS DOUBLE) AS priority
        |  FROM b),
        |c AS (SELECT rhost, surt, priority,
        |    ROW_NUMBER() OVER (PARTITION BY rhost ORDER BY priority DESC, surt) AS rn
        |  FROM p)
        |SELECT rhost, surt, priority FROM c WHERE rn <= 30
        |ORDER BY rhost, surt""".stripMargin,

    // the bounded-heap cap == the window formulation on the same total
    // order (priority DESC, url ASC); fetchers and slots then follow
    // the crawl_schedule chain over the capped set
    "crawl_schedule_capped" ->
      """WITH t AS (SELECT i,
        |    CASE WHEN i < 600 THEN 'mega.com' ELSE 'd' || CAST(i % 25 AS VARCHAR) || '.org' END AS domain
        |  FROM range(1000) r(i)),
        |u AS (SELECT domain,
        |    'http://' || domain || '/p/' || lpad(CAST(i AS VARCHAR), 4, '0') AS url,
        |    CAST((i * 7) % 101 AS DOUBLE) AS priority FROM t),
        |capped AS (SELECT domain, url FROM (
        |    SELECT domain, url,
        |      ROW_NUMBER() OVER (PARTITION BY domain ORDER BY priority DESC, url) AS rn
        |    FROM u) WHERE rn <= 20),
        |fa AS (SELECT domain,
        |    arg_max(f, ('0x' || substr(md5(domain || '|' || CAST(f AS VARCHAR)), 1, 15))::BIGINT) AS fetcher
        |  FROM (SELECT DISTINCT domain FROM capped) CROSS JOIN range(4) r(f)
        |  GROUP BY domain)
        |SELECT c.url, c.domain, CAST(fa.fetcher AS INT) AS fetcher,
        |  CAST((ROW_NUMBER() OVER (PARTITION BY c.domain ORDER BY c.url) - 1)
        |    * 1000 AS BIGINT) AS slot_ms
        |FROM capped c JOIN fa USING (domain)
        |ORDER BY url""".stripMargin,

    // the decisions are pinned per template arm: graftbot's own group
    // governs it (so /secret is allowed), otherbot falls to * (so only
    // /secret is denied) — any drift in group selection, longest-match
    // precedence, wildcard or anchor semantics flips an arm
    "url_robots_filter" ->
      """WITH t AS (SELECT i, i % 8 AS m, CAST(i AS VARCHAR) AS si FROM range(200) r(i)),
        |p AS (SELECT i, m,
        |  CASE m WHEN 0 THEN '/public/page' || si || '.html'
        |         WHEN 1 THEN '/private/doc' || si || '.html'
        |         WHEN 2 THEN '/private/pub/x' || si
        |         WHEN 3 THEN '/docs/file' || si || '.pdf'
        |         WHEN 4 THEN '/docs/file' || si || '.pdfx'
        |         WHEN 5 THEN '/tmp/cache' || si
        |         WHEN 6 THEN '/tmp/keep'
        |         ELSE '/secret/x' || si END AS path FROM t),
        |a AS (SELECT i, path, 'graftbot' AS agent, m NOT IN (1, 3, 5) AS allowed FROM p
        |      UNION ALL
        |      SELECT i, path, 'otherbot', m <> 7 FROM p)
        |SELECT i AS id, agent, path, allowed FROM a ORDER BY id, agent""".stripMargin,

    // all container fields are integer arithmetic over the track
    // formulas: durations floor-divide via // (positive operands, so
    // DuckDB // == Spark/JVM truncating division)
    "mm_mp4_info" ->
      """WITH ids AS (SELECT i AS media_id, 600 + (i % 5) * 200 AS vts,
        |    4 + i % 4 AS nv, 3 + i % 3 AS na FROM range(12) t(i)),
        |vd AS (SELECT media_id, vts, nv, na,
        |    SUM(40 + (media_id * 3 + j * 7) % 60) AS vsum,
        |    SUM(3 + (media_id + j) % 5) AS vbytes,
        |    MAX(CASE WHEN j = nv - 1 THEN 40 + (media_id * 3 + j * 7) % 60 END) AS vlast
        |  FROM ids CROSS JOIN range(7) r(j) WHERE j < nv
        |  GROUP BY media_id, vts, nv, na),
        |tr AS (
        |  SELECT media_id, 1 AS track_id, 'vide' AS handler, 'avc1' AS codec,
        |    vts AS timescale, vsum * 1000 // vts AS track_dur_ms,
        |    nv AS n_samples, (nv + 2) // 3 AS n_sync, vbytes AS total_bytes,
        |    (vsum - vlast) * 1000 // vts AS last_ts_ms,
        |    GREATEST(vsum * 1000 // vts, na * 80) AS movie_dur_ms
        |  FROM vd
        |  UNION ALL
        |  SELECT media_id, 2, 'soun', 'mp4a', 8000,
        |    na * 80, na, na, 10 * na + na * (na - 1) // 2,
        |    (na - 1) * 80, GREATEST(vsum * 1000 // vts, na * 80)
        |  FROM vd)
        |SELECT CAST(media_id AS INT) AS media_id, CAST(track_id AS INT) AS track_id,
        |  handler, codec, CAST(timescale AS INT) AS timescale,
        |  CAST(track_dur_ms AS BIGINT) AS track_dur_ms,
        |  CAST(n_samples AS INT) AS n_samples, CAST(n_sync AS INT) AS n_sync,
        |  CAST(total_bytes AS BIGINT) AS total_bytes,
        |  CAST(last_ts_ms AS BIGINT) AS last_ts_ms,
        |  CAST(movie_dur_ms AS BIGINT) AS movie_dur_ms
        |FROM tr ORDER BY media_id, track_id""".stripMargin
  ).pipe(m =>
    // curateTo is curate with a different pin lifecycle and a
    // write-through output — the RESULT contract is identical, so the
    // same oracle gates both (any divergence between the two forms
    // fails exactly one of them)
    m + ("pipeline_curate_to" -> m("pipeline_curate")))
}
