package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Round-17 optimization probe: times each expensive bench arm's
  * sub-phases in isolation (noop-sink actions, min of 3) so the
  * optimization targets the measured cost, and dumps
  * `.explain("formatted")` for every headline arm into `plans/r17/`.
  */
object Profile17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    val sections = if (args.isEmpty) Set("wayback", "cdx", "crawl", "plans") else args.toSet

    def noop(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    // job/task accounting: how many Spark jobs an operation launches and
    // how much executor task time they burn — separates fixed job
    // overhead from real work
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          taskMs.addAndGet(te.taskMetrics.executorRunTime); ()
        }
    })
    def time(label: String, rounds: Int = 3)(f: => Any): Unit = {
      val stats = (1 to rounds).map { _ =>
        val (j0, t0, n0) = (jobs.get(), System.nanoTime(), taskMs.get())
        f
        Thread.sleep(250) // let the listener bus drain
        ((System.nanoTime() - t0) / 1e9 - 0.25, jobs.get() - j0, taskMs.get() - n0)
      }
      val best = stats.minBy(_._1)
      println(f"PROBE17 $label%-36s min=${best._1}%7.3f med=${stats.map(_._1).sorted.apply(stats.length / 2)}%7.3f s jobs=${best._2}%3d taskSec=${best._3 / 1000.0}%7.2f")
    }

    val docsRaw = graft.Tables.load(spark, sfDir, "documents")

    if (sections("wayback")) {
      import spark.implicits._
      val docs = docsRaw.where(col("text").isNotNull).select(col("doc_id"), col("text"))
      println(s"docs rows = ${docs.count()}")
      def escHtml(c: org.apache.spark.sql.Column) =
        regexp_replace(regexp_replace(regexp_replace(c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
      val crawlHtml = (id: org.apache.spark.sql.Column, text: org.apache.spark.sql.Column,
                       tag: org.apache.spark.sql.Column) =>
        concat(
          lit("<html><head><title>Doc "), id.cast("string"), lit("</title></head><body>"),
          lit("<nav><ul><li><a href=\"/\">Home</a></li><li><a href=\"/about\">About</a></li></ul></nav>"),
          lit("<h1>"), tag, lit("</h1><p>"), escHtml(text),
          lit("</p><footer>(c) graft corpus</footer></body></html>"))
      def records(html: DataFrame, date: String, idp: String): DataFrame =
        html.repartition(8).as[(Long, String)].mapPartitions(_.map { case (id, h) =>
          val uri = s"http://c${id % 13}.example.org/d/$id"
          val payload = graft.sources.WarcIo.buildHttpResponse(200, "OK",
            Seq("Content-Type" -> "text/html; charset=utf-8"),
            h.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ("response", uri, date, graft.sources.WarcIo.recordIdFor(idp + id),
            "application/http; msgtype=response", payload)
        }).toDF("rec_type", "target_uri", "warc_date", "record_id",
          "content_type", "payload")
      val v1 = docs.select(col("doc_id"),
        crawlHtml(col("doc_id"), col("text"), lit("Wayback v1")).as("html"))
      // phase 1: write crawl1 with cdx
      var root: String = null
      time("wb_write_crawl1", 3) {
        root = graft.TempDirs.scratch("p17_wayback_")
        graft.sources.WarcIo.writeWarcWithCdx(records(v1, "2026-01-01T00:00:00Z", "wb1:"),
          root + "/crawl1", "crawl1/")
      }
      // phase 2: read sidecar + distinct digests
      time("wb_read_prior_digests") {
        noop(graft.sources.WarcIo.readCdxj(spark, root + "/crawl1/part-*.cdx.gz")
          .select(col("digest")).distinct())
      }
      val v2 = docs.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          crawlHtml(col("doc_id"), col("text"), lit("Wayback v1")))
          .otherwise(crawlHtml(col("doc_id"), col("text"), lit("Wayback v2 changed")))
          .as("html"))
      val prior = graft.sources.WarcIo.readCdxj(spark, root + "/crawl1/part-*.cdx.gz")
        .select(col("digest")).distinct()
      time("wb_mark_write_crawl2", 3) {
        graft.sources.WarcIo.writeWarcWithCdx(
          graft.sources.WarcIo.markRevisits(
            records(v2, "2026-01-02T00:00:00Z", "wb2:"), prior),
          root + "/crawl2", "crawl2/")
      }
      val index = graft.sources.WarcIo.readCdxj(spark, root + "/crawl*/part-*.cdx.gz")
      val wants = docs.select(
        call_function("graft_surt",
          concat(lit("http://c"), pmod(col("doc_id"), lit(13)).cast("string"),
            lit(".example.org/d/"), col("doc_id").cast("string"))).as("surt"),
        lit("20260102120000").as("want_ts"))
      val rIdx = index.select(col("surt").as("rsurt"), col("ts"),
        col("filename"), col("offset"), col("length"))
      val resolved = graft.operators.AsOfJoin.asOf(wants, rIdx, "surt", "rsurt",
        "want_ts", "ts", payload = Seq("filename", "offset", "length"))
      time("wb_asof_resolve") { noop(resolved) }
      time("wb_fetch1_only") {
        noop(graft.sources.WarcIo.fetchByCdx(
          resolved.select("filename", "offset", "length"), root))
      }
      time("wb_replay_full") {
        noop(graft.sources.WarcIo.replay(
            resolved.select("filename", "offset", "length"), index, root)
          .select(col("target_uri"), col("rec_type"), col("replayed"), col("payload")))
      }
      val arm = graft.SparkEntry.queries("pipeline_wayback")
      time("wb_arm_end_to_end") { noop(arm(spark, sfDir)) }
    }

    if (sections("cdx")) {
      val cdx = spark.range(4000).selectExpr(
        "concat('https://h', id % 40, '.site', id % 7, '.org/p/', id) AS url",
        "lpad(CAST(id % 97 AS STRING), 14, '0') AS ts",
        "concat('d', id) AS digest", "id AS offset", "100 + id % 9 AS length",
        "'text/html' AS mime", "CAST(200 AS INT) AS status",
        "concat('f', id % 16, '.warc.gz') AS filename")
        .withColumn("surt", call_function("graft_surt", col("url")))
        .select("surt", "ts", "url", "mime", "status", "digest",
          "length", "offset", "filename")
      var idxDir: String = null
      time("cdx_initMaster", 3) {
        idxDir = graft.TempDirs.scratch("p17_cdx_")
        graft.sources.CdxIndex.initMaster(cdx.filter(col("offset") < 1500), idxDir, nShards = 12)
      }
      time("cdx_appendCrawl", 3) {
        graft.sources.CdxIndex.appendCrawl(
          cdx.filter(col("offset") >= 1500 && col("offset") < 3000), idxDir, nShards = 12)
      }
      time("cdx_lookupPrefix", 3) {
        noop(graft.sources.CdxIndex.lookupPrefix(spark, idxDir, "org,site3,h17)")
          .select(col("surt"), col("ts"), col("url"), col("offset"), col("length"))
          .orderBy(col("surt")))
      }
      // the FooterCache done-criterion: 100 repeated lookups — the
      // per-lookup metadata cost must amortize to ~the pruned scan job
      // alone (generations are hit in the memo after lookup 1)
      time("cdx_lookupPrefix_x100", 1) {
        (1 to 100).foreach { i =>
          noop(graft.sources.CdxIndex.lookupPrefix(spark, idxDir, s"org,site${i % 7},h${i % 40})")
            .select(col("surt"), col("offset")))
        }
      }
    }

    if (sections("crawl")) {
      // pipeline_crawl_loop_ranked phases
      import spark.implicits._
      def hostOf(j: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(j < 8, concat(lit("d"), j, lit(".shop.com")))
          .when(j < 13, concat(lit("r"), j - 8, lit(".news.org")))
          .otherwise(concat(lit("u"), j - 13, lit(".github.io")))
      val edges = spark.range(200).select(
        hostOf(pmod(col("id"), lit(20L))).as("src"),
        hostOf(pmod(col("id") * col("id") + col("id") * 3L + 7L, lit(20L))).as("dst"))
      time("crawl_pagerank3") {
        noop(graft.operators.LinkGraph.pageRank(edges, "src", "dst", iterations = 3))
      }
      val history = spark.range(200).map(i => (s"http://d${i % 8}.shop.com/p/$i", 100L))
        .toDF("url", "day")
      var idxDir: String = null
      time("crawl_buildIndex", 3) {
        idxDir = graft.TempDirs.scratch("p17_crawl_idx_")
        graft.operators.CrawlFrontier.buildIndex(history, "url", col("day"), idxDir,
          nShards = 8, expectedItems = 10000L)
      }
      val discovered = spark.range(240).map { i =>
        (i, (i % 3).toInt, (i % 3) match {
          case 0 => s"HTTP://D${i % 8}.SHOP.COM:80/p/$i?utm_source=z"
          case 1 => s"http://r${i % 5}.news.org/old/$i"
          case _ => s"http://u${i % 7}.github.io/post/$i"
        })
      }.toDF("i", "arm", "raw")
        .withColumn("url", call_function("graft_url_normalize", col("raw")))
      val finals = discovered.filter(col("arm") =!= 1).select(col("url"))
      time("crawl_probeNew") {
        noop(graft.operators.CrawlFrontier.probeNew(spark, idxDir, finals, "url"))
      }
    }

    if (sections("minhash")) {
      // phase split of the heaviest CPU arm: signature kernel vs the
      // banding/bucket/join tail (decides whether banding is worth a
      // future round's attention)
      val docs = docsRaw
      time("mh_signatures_only") {
        noop(graft.operators.dedup.MinHashDedup.portableSignatures(
          docs, "doc_id", "text", n = 3, k = 64))
      }
      time("mh_full_arm") {
        noop(graft.SparkEntry.queries("dedup_minhash")(spark, sfDir))
      }
      // tail decomposition over a pre-materialized signature table
      val sig = graft.operators.Partitioning.materializeOnce(
        graft.operators.dedup.MinHashDedup.portableSignatures(
          docs, "doc_id", "text", n = 3, k = 64))
      time("mh_banding_only") {
        noop(graft.operators.dedup.MinHashDedup.portableBands(sig, 64, 16))
      }
      time("mh_buckets") {
        noop(graft.operators.dedup.MinHashDedup.portableBands(sig, 64, 16)
          .groupBy(org.apache.spark.sql.functions.col("band"),
            org.apache.spark.sql.functions.col("bkey"))
          .agg(graft.functions.BoundedCollectList.column(
            org.apache.spark.sql.functions.col("doc_id"), 500).as("members")))
      }
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      time("mh_buckets_hashagg") {
        noop(graft.operators.dedup.MinHashDedup.portableBands(sig, 64, 16)
          .groupBy(org.apache.spark.sql.functions.col("band"),
            org.apache.spark.sql.functions.col("bkey"))
          .agg(graft.functions.BoundedCollectList.column(
            org.apache.spark.sql.functions.col("doc_id"), 500).as("members")))
      }
      spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      locally {
        import org.apache.spark.sql.functions.{col, size => fsize}
        val buckets = graft.operators.Partitioning.materializeOnce(
          graft.operators.dedup.MinHashDedup.portableBands(sig, 64, 16)
            .groupBy(col("band"), col("bkey"))
            .agg(graft.functions.BoundedCollectList.column(col("doc_id"), 500).as("members"))
            .filter(fsize(col("members")).between(2, 500)))
        println(s"PROBE17 mh buckets rows=${buckets.count()} " +
          s"maxMembers=${buckets.select(org.apache.spark.sql.functions.max(fsize(col("members")))).head().getInt(0)}")
        time("mh_pairs_dedup") {
          noop(graft.operators.dedup.MinHashDedup.explodePairs(buckets, "members")
            .select(col("a").as("id_a"), col("b").as("id_b"))
            .dropDuplicates("id_a", "id_b"))
        }
        buckets.unpersist()
      }
      sig.unpersist()
    }
    if (sections("lazyplans")) {
      // the eager-checkpointing arms collapse their VISIBLE plan to an
      // RDD scan — dump the lazy inner plans (what the checkpoint jobs
      // execute) so the r18 kernel claims are checkable from files
      val outDir = java.nio.file.Paths.get(
        sys.env.getOrElse("P17_PLANS_DIR", "plans/r18"))
      java.nio.file.Files.createDirectories(outDir)
      val tag = sys.env.getOrElse("P17_PLAN_TAG", "after")
      val docs = graft.Tables.load(spark, sfDir, "documents")
      val (mh, mhPin) = graft.operators.dedup.MinHashDedup.portablePairsLazy(
        docs, "doc_id", "text", n = 3, k = 64, numBands = 16,
        threshold = 0.5, maxBucket = 500)
      java.nio.file.Files.writeString(
        outDir.resolve(s"dedup_minhash_lazy_$tag.txt"),
        mh.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      mhPin.unpersist()
      println(s"PLAN17 wrote dedup_minhash_lazy_$tag.txt")
    }
    if (sections("plans")) {
      val headline = Seq(
        "q1_agg", "q2_join_enrich", "q3_window_topn", "k2_cdc_apply",
        "s2_tx_assembly", "a5_gtid_set", "dedup_exact", "dedup_minhash",
        "dedup_ngram", "sim_topk", "text_profile", "c_type_matrix",
        "pack_sequences", "contamination", "emb_quantize",
        "pipeline_crawl_loop_ranked", "cdx_lookup", "text_bm25_topk",
        "sim_ivf_pq_topk", "pipeline_wayback")
      val outDir = java.nio.file.Paths.get(
        sys.env.getOrElse("P17_PLANS_DIR", "plans/r17"))
      java.nio.file.Files.createDirectories(outDir)
      val tag = sys.env.getOrElse("P17_PLAN_TAG", "before")
      headline.foreach { name =>
        try {
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
          println(s"PLAN17 wrote ${name}_$tag.txt")
        } catch { case e: Throwable =>
          println(s"PLAN17 $name FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
