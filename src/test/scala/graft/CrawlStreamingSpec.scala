package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.text.HtmlExtract
import graft.sources.WarcIo
import graft.streaming.StreamingDedup

/** The streaming form of the crawl path: WARC archives arrive as a
  * stream, records are parsed and main-content-extracted statelessly
  * inside the stream, survivors of the shared-index near-dup gate
  * (`StreamingDedup.indexedIngest`) are written back out as WET
  * conversion records — WARC in, deduped WET out, the continual-ingest
  * twin of the batch `pipeline_crawl` flagship.
  */
class CrawlStreamingSpec extends SparkSpec {

  private def page(body: String): String =
    s"<html><head><title>t</title></head><body><nav><a href='/'>Home</a></nav>" +
      s"<p>$body</p></body></html>"

  private def archive(docs: Seq[(Long, String)]): Array[Byte] =
    WarcIo.writeGz(docs.map { case (id, body) =>
      WarcIo.WarcRecord(
        recordType = "response",
        targetUri = s"http://ex.example.com/p/$id",
        date = "2026-01-01T00:00:00Z",
        recordId = WarcIo.recordIdFor(s"cs:$id"),
        contentType = "application/http; msgtype=response",
        extra = Map.empty,
        payload = WarcIo.buildHttpResponse(200, "OK",
          Seq("Content-Type" -> "text/html; charset=utf-8"),
          page(body).getBytes(UTF_8)))
    })

  test("WARC stream → extract → indexed near-dup gate → WET records out") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = TempDirs.scratch("crawl-stream")
    val wetDir = Paths.get(dir, "wet"); Files.createDirectories(wetDir)

    val textA = "the quick brown fox jumps over the lazy dog again and again in the yard"
    val textB = "completely different content about spark engines and columnar parquet files"
    val textC = "unrelated new text describing streaming state stores and watermark semantics"

    val accepted = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val input = MemoryStream[Array[Byte]]

    // stateless in-stream stage: archive bytes → records → extracted text
    val extracted = input.toDS().flatMap { bytes =>
      WarcIo.recordsFromRaw(new java.io.ByteArrayInputStream(bytes))
        .filter(_.recordType == "response")
        .map { r =>
          val http = WarcIo.parseHttpResponse(r.payload)
          val text = HtmlExtract
            .content(new String(http.body, UTF_8), minChars = 25, maxLinkDensity = 0.33)
            .map(_.text).mkString("\n")
          val id = r.targetUri.substring(r.targetUri.lastIndexOf('/') + 1).toLong
          (id, r.targetUri, r.date, r.recordId, text)
        }
    }.toDF("doc_id", "uri", "wdate", "rid", "text")

    val q = extracted.writeStream.foreachBatch(
      StreamingDedup.indexedIngest(s"$dir/idx", "doc_id", "text") { (df, epoch) =>
        val rows = df.select("doc_id", "uri", "wdate", "rid", "text").collect()
        accepted.synchronized {
          accepted ++= rows.map(r => (r.getLong(0), r.getString(4)))
        }
        if (rows.nonEmpty) {
          // survivors → WET conversion records, the crawl pipeline's output container
          val wet = rows.toSeq.map { r =>
            WarcIo.toWet(
              WarcIo.WarcRecord("response", r.getString(1), r.getString(2),
                r.getString(3), "", Map.empty, Array.emptyByteArray),
              r.getString(4))
          }
          Files.write(wetDir.resolve(f"wet-$epoch%05d.warc.gz"), WarcIo.writeGz(wet))
        }
      }).start()
    try {
      input.addData(archive(Seq(1L -> textA, 2L -> textB)))
      q.processAllAvailable()
      // batch 2: doc 3 is a near-copy of doc 1 (one word appended) and
      // must be dropped by the shared index; doc 4 is fresh
      input.addData(archive(Seq(3L -> (textA + " tonight"), 4L -> textC)))
      q.processAllAvailable()
    } finally q.stop()

    assert(accepted.map(_._1).toSet == Set(1L, 2L, 4L), s"got ${accepted.map(_._1).toSet}")
    // extraction really ran: boilerplate nav stripped, body text kept
    assert(accepted.toMap.apply(1L) == textA)

    // the WET side round-trips through the Spark reader: conversion
    // records whose payload IS the deduped text, linked to the source
    val wet = WarcIo.readWarc(spark, wetDir.toString + "/*.warc.gz")
    val rows = wet.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[String]("rec_type") == "conversion"))
    val texts = rows.map(r => new String(r.getAs[Array[Byte]]("payload"), UTF_8)).toSet
    assert(texts == Set(textA, textB, textC))
    // and the shared index holds exactly the accepted docs (batch parity)
    val indexed = spark.read.parquet(s"$dir/idx/sigs").select("doc_id").as[Long].collect().toSet
    assert(indexed == Set(1L, 2L, 4L))
  }

  test("FULL streaming crawl loop: ingest → cap → schedule → WARC sink, crash-replayed exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = TempDirs.scratch("crawl-loop-stream")
    val ckpt = s"$dir/ckpt"
    graft.operators.CrawlFrontier.buildIndex(
      (0 until 20).map(i => (s"http://seen.com/p/$i", 100L)).toDF("url", "day"),
      "url", col("day"), s"$dir/idx", nShards = 4, expectedItems = 10000L)

    // (epoch, url, slot_ms) as delivered to the schedule — the
    // exactly-once surface under test
    val scheduled = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    @volatile var crashOnce = true
    @volatile var crashTwice = true
    val loopBody = graft.operators.CrawlFrontier.ingest(s"$dir/idx", "url", lit(200L)) {
      (accepted, epoch) =>
        // planted crash BETWEEN appendBatch and delivery: the index now
        // contains the batch, the consumer never saw it — the shape
        // that silently loses data unless staging re-delivers
        if (epoch == 1L && crashOnce) {
          crashOnce = false
          sys.error("planted crash between appendBatch and accept")
        }
        val batch = accepted
          .withColumn("host", call_function("graft_url_host", col("url")))
          .withColumn("domain", call_function("graft_url_domain", col("host")))
          .withColumn("priority", regexp_extract(col("url"), "([0-9]+)$", 1).cast("double"))
        val sched = graft.operators.CrawlScheduler.schedule(
          graft.operators.CrawlScheduler.capPerDomain(batch, "domain", "url",
            col("priority"), 2),
          "domain", "url", 4, lit(1000L))
        val rows = sched.select("url", "slot_ms").as[(String, Long)].collect()
        // the epoch's fetch-request manifest lands as a REAL archive
        val recs = rows.toSeq.map { case (u, _) =>
          ("metadata", u, "2026-01-01T00:00:00Z", WarcIo.recordIdFor("req:" + u),
            "application/warc-fields", s"scheduled: $u".getBytes(UTF_8))
        }.toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
        // each epoch commits its archive WITH the CDXJ sidecar — the
        // streaming loop produces indexable containers, not just bytes.
        // The collection-relative filename prefix is what lets ONE
        // master index span every epoch dir (bare part basenames
        // collide across epochs).
        WarcIo.writeWarcWithCdx(recs, s"$dir/warc/epoch-$epoch", s"epoch-$epoch/")
        // LSM master maintenance IN the loop: the epoch's committed
        // sidecar rows (re-read from the archive, so a replay appends
        // byte-stable rows) append to the primary AND digest-reverse
        // masters — appendEpoch's manifest-tag ledger makes a replayed
        // epoch a no-op, so a crash anywhere in this body cannot
        // double-count captures
        val sp = accepted.sparkSession
        val epochCdx = WarcIo.readCdxjCommitted(sp, s"$dir/warc/epoch-$epoch")
        graft.sources.CdxIndex.appendEpoch(epochCdx, s"$dir/master", 2, s"epoch-$epoch")
        // planted crash BETWEEN the two master appends: the primary
        // holds the epoch, the digest master does not yet — the replay
        // must no-op the first and complete the second
        if (epoch == 2L && crashTwice) {
          crashTwice = false
          sys.error("planted crash between the primary and digest master appends")
        }
        graft.sources.CdxIndex.appendEpoch(epochCdx, s"$dir/digest", 2, s"epoch-$epoch",
          graft.sources.CdxIndex.DigestKey)
        scheduled.synchronized { scheduled ++= rows.map(r => (epoch, r._1, r._2)) }
        ()
    }
    val input = MemoryStream[String]
    def startQuery() = input.toDS().toDF("url").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(loopBody).start()

    var q = startQuery()
    try {
      // epoch 0: one seen url (index-dropped) + three new across two domains
      input.addData("http://seen.com/p/1", "http://a.org/u/5", "http://a.org/u/7",
        "http://b.org/u/3")
      q.processAllAvailable()
      // epoch 1: a re-discovery of epoch 0's url + a 3-url hot domain
      // (cap k=2 must drop the lowest-priority one from the SCHEDULE
      // while the index still records all three as crawled-frontier)
      input.addData("http://a.org/u/5", "http://c.net/u/9", "http://c.net/u/11",
        "http://c.net/u/2")
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
    } finally q.stop()
    // restart from the checkpoint: epoch 1 REPLAYS, its committed
    // staging re-delivers the same accepted set, the schedule sees it
    // exactly once
    q = startQuery()
    try {
      q.processAllAvailable()
      // epoch 2: re-discoveries of epoch 1's urls die on the index —
      // and the SECOND planted crash fires between the master appends
      input.addData("http://c.net/u/9", "http://d.io/u/1")
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
    } finally q.stop()
    // third start: epoch 2 replays — the WARC dir rewrites
    // byte-identically, the primary master append NO-OPS on its tag,
    // the digest append completes, the schedule sees the epoch once
    q = startQuery()
    try q.processAllAvailable() finally q.stop()

    val byEpoch = scheduled.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(byEpoch(0L) == Set(("http://a.org/u/5", 0L), ("http://a.org/u/7", 1000L),
      ("http://b.org/u/3", 0L)), s"epoch 0: ${byEpoch.get(0L)}")
    // exactly-once: the crashed epoch delivered ONCE, top-2 by priority
    // ("u/11" sorts before "u/9" lexically → slot 0)
    assert(byEpoch(1L) == Set(("http://c.net/u/11", 0L), ("http://c.net/u/9", 1000L)),
      s"epoch 1: ${byEpoch.get(1L)}")
    assert(byEpoch(2L) == Set(("http://d.io/u/1", 0L)), s"epoch 2: ${byEpoch.get(2L)}")
    assert(scheduled.size == 6, s"duplicate or lost deliveries: $scheduled")
    // the WARC sink holds each epoch's manifest exactly once
    val e1 = WarcIo.readWarc(spark, s"$dir/warc/epoch-1/*.warc.gz").collect()
    assert(e1.map(_.getAs[String]("target_uri")).toSet ==
      Set("http://c.net/u/11", "http://c.net/u/9"))
    // the index holds history + every ACCEPTED url exactly once logically
    // (the replayed appendBatch may add duplicate rows; membership dedups)
    val indexed = spark.read.parquet(s"$dir/idx/urls")
      .select("url").distinct().as[String].collect().toSet
    assert(indexed.size == 20 + 3 + 3 + 1, s"index size ${indexed.size}")
    assert(indexed.contains("http://c.net/u/2"), "capped-from-schedule urls still index")
    // the CDX sidecars ARE the exactly-once surface at the index level:
    // the epochs' sidecars hold exactly the 6 deliveries, and the
    // master index built from them resolves a host query to the right
    // epoch archives
    val cdx = WarcIo.readCdxj(spark, s"$dir/warc/epoch-*/part-*.cdx.gz")
    val cdxRows = cdx.collect()
    assert(cdxRows.length == 6, s"sidecar rows: ${cdxRows.length}")
    assert(cdxRows.map(_.getAs[String]("url")).toSet ==
      scheduled.map(_._2).toSet)
    graft.sources.CdxIndex.buildTable(cdx, s"$dir/cdxidx", nShards = 2)
    val cnet = graft.sources.CdxIndex.lookupDomain(spark, s"$dir/cdxidx", "net,c")
      .collect()
    assert(cnet.map(_.getAs[String]("url")).toSet ==
      Set("http://c.net/u/11", "http://c.net/u/9"))
    assert(cnet.forall(_.getAs[String]("filename").startsWith("epoch-")),
      "sidecar rows must carry collection-relative filenames")
    // and EVERY pointer dereferences across epoch dirs from the one
    // collection root — the merged index's whole point
    val fetched = WarcIo.fetchByCdx(cdx, s"$dir/warc").collect()
    assert(fetched.length == 6)
    fetched.foreach { r =>
      assert(new String(r.getAs[Array[Byte]]("payload"), UTF_8) ==
        "scheduled: " + r.getAs[String]("target_uri"))
    }
    // the STREAMED LSM master holds each capture EXACTLY ONCE across
    // both crash replays (epoch 1 replayed whole; epoch 2 replayed
    // after its primary append already committed)
    val master = graft.sources.CdxIndex.readMaster(spark, s"$dir/master")
    assert(master.count() == 6, s"master rows: ${master.count()}")
    assert(master.select("surt").distinct().count() == 6)
    val cnetM = graft.sources.CdxIndex.lookupDomain(spark, s"$dir/master", "net,c")
      .collect()
    assert(cnetM.map(_.getAs[String]("url")).toSet ==
      Set("http://c.net/u/11", "http://c.net/u/9"))
    // the digest-reverse master stayed in lockstep: exactly once each,
    // and provenance lookup resolves the LATEST epoch's capture
    val dm = graft.sources.CdxIndex.readMaster(spark, s"$dir/digest")
    assert(dm.count() == 6, s"digest master rows: ${dm.count()}")
    val dg = dm.filter(col("url") === "http://d.io/u/1")
      .select("digest").collect().map(_.getString(0))
    assert(dg.length == 1)
    val prov = graft.sources.CdxIndex.lookupDigest(spark, s"$dir/digest", dg.head)
      .collect()
    assert(prov.length == 1 && prov.head.getAs[String]("url") == "http://d.io/u/1")
    // every master pointer fetches from the collection root too
    assert(WarcIo.fetchByCdx(master, s"$dir/warc").count() == 6)
  }

  test("archiveEpochSink: one call archives each epoch and maintains both masters") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = TempDirs.scratch("epoch-sink")
    // self-maintaining: the tiered compaction + vacuum keep generation
    // count and disk bounded as epochs accumulate
    val sink = WarcIo.archiveEpochSink(s"$dir/warc", s"$dir/master", 2,
      digestDir = Some(s"$dir/digest"), maxGens = Some(2))
    val input = MemoryStream[String]
    val q = input.toDS().map { u =>
      ("metadata", u, "2026-01-01T00:00:00Z", WarcIo.recordIdFor("es:" + u),
        "application/warc-fields", ("fetched: " + u).getBytes(UTF_8))
    }.toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
      .writeStream.foreachBatch(sink).start()
    try {
      input.addData("http://a.one/x/1", "http://b.two/y/2")
      q.processAllAvailable()
      input.addData("http://c.three/z/3")
      q.processAllAvailable()
      input.addData("http://d.four/w/4")
      q.processAllAvailable()
    } finally q.stop()
    // both masters hold every capture exactly once, across three
    // epochs, and the in-sink maintenance bounded the generations
    val master = graft.sources.CdxIndex.readMaster(spark, s"$dir/master")
    assert(master.count() == 4)
    val dm = graft.sources.CdxIndex.readMaster(spark, s"$dir/digest")
    assert(dm.count() == 4)
    // LIVE generations (newest manifest) stay ≤ maxGens; on-disk dirs
    // additionally hold the PREVIOUS manifest's generations for pinned
    // readers (vacuum keep=2), so the disk bound is maxGens + the
    // just-folded generations — constant per epoch, never growing
    Seq("master", "digest").foreach { m =>
      val gens = new java.io.File(s"$dir/$m").list().count(_.matches("gen-\\d{8}"))
      assert(gens <= 4, s"$m generations unbounded: $gens")
      val lookupFan = graft.sources.CdxIndex
        .readMaster(spark, s"$dir/$m").inputFiles
        .map(_.replaceAll("/cdx/.*$", "")).distinct.length
      assert(lookupFan <= 2, s"$m live generations exceed maxGens: $lookupFan")
    }
    // a URL lookup resolves through the master and the pointer fetches
    // from the COLLECTION ROOT across epoch subdirectories
    val hit = graft.sources.CdxIndex.lookupUrl(spark, s"$dir/master",
      "http://c.three/z/3")
    assert(hit.count() == 1)
    assert(hit.select("filename").head.getString(0).startsWith("epoch-1/"))
    val fetched = WarcIo.fetchByCdx(
      graft.sources.CdxIndex.readMaster(spark, s"$dir/master"), s"$dir/warc")
      .collect()
    assert(fetched.length == 4)
    fetched.foreach { r =>
      assert(new String(r.getAs[Array[Byte]]("payload"), UTF_8) ==
        "fetched: " + r.getAs[String]("target_uri"))
    }
    // re-delivering an epoch out-of-band (the crash-replay shape the
    // sink promises to absorb) neither duplicates nor errors — even
    // though that epoch's generation was long folded by the tiered
    // compaction (its tag rode onto the folded generation)
    sink((0 until 1).map(_ => ("metadata", "http://c.three/z/3",
      "2026-01-01T00:00:00Z", WarcIo.recordIdFor("es:http://c.three/z/3"),
      "application/warc-fields", "fetched: http://c.three/z/3".getBytes(UTF_8)))
      .toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload"),
      1L)
    assert(graft.sources.CdxIndex.readMaster(spark, s"$dir/master").count() == 4)
    assert(graft.sources.CdxIndex.readMaster(spark, s"$dir/digest").count() == 4)
    // ...and EVERY master pointer still dereferences byte-exactly: the
    // re-delivery (here deliberately at a DIFFERENT partitioning — one
    // local row instead of the stream's layout) must not have rewritten
    // the epoch dir under the published pointers
    val refetched = WarcIo.fetchByCdx(
      graft.sources.CdxIndex.readMaster(spark, s"$dir/master"), s"$dir/warc").collect()
    assert(refetched.length == 4)
    refetched.foreach { r =>
      assert(new String(r.getAs[Array[Byte]]("payload"), UTF_8) ==
        "fetched: " + r.getAs[String]("target_uri"))
    }
    // the per-epoch metrics ledger: one row per APPLIED epoch, NONE for
    // the replay (it no-op'd on the tag ledger); counters match the
    // deliveries and stay inside the maintenance bounds
    val met = graft.sources.CdxIndex.epochMetrics(spark, s"$dir/master")
      .orderBy("epoch").collect()
    assert(met.map(_.getAs[String]("epoch")).toSeq ==
      Seq("epoch-0", "epoch-1", "epoch-2"), s"metrics ledger: ${met.toSeq}")
    assert(met.map(_.getAs[Long]("rows")).toSeq == Seq(2L, 1L, 1L))
    met.foreach { r =>
      assert(r.getAs[Long]("archive_bytes") > 0 && r.getAs[Long]("wall_ms") >= 0)
      assert(r.getAs[Int]("gens_before") >= 1 && r.getAs[Int]("gens_after") <= 2)
    }
  }

  test("URL stream → persisted frontier seen-set: two micro-batches, index-gated, replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = TempDirs.scratch("frontier-stream")

    // the crawl history the stream starts from
    val crawled = (0 until 40).map(i => (s"http://hist.example.com/p/$i", 100L)).toDF("url", "day")
    graft.operators.CrawlFrontier.buildIndex(crawled, "url", col("day"), dir,
      nShards = 8, expectedItems = 10000L)

    val accepted = scala.collection.mutable.ArrayBuffer.empty[String]
    val input = MemoryStream[String]
    val q = input.toDS().toDF("url").writeStream.foreachBatch(
      graft.operators.CrawlFrontier.ingest(dir, "url", lit(200L)) { (df, _) =>
        val urls = df.select("url").as[String].collect()
        accepted.synchronized { accepted ++= urls }
      }).start()
    try {
      // micro-batch 1: 10 already-crawled + 5 new
      input.addData((0 until 10).map(i => s"http://hist.example.com/p/$i") ++
        (0 until 5).map(i => s"http://newsite.org/a/$i"): _*)
      q.processAllAvailable()
      // micro-batch 2: re-discoveries of batch 1's accepted urls + 3 fresh —
      // the PERSISTED index (not stream state) must drop the re-discoveries
      input.addData((0 until 5).map(i => s"http://newsite.org/a/$i") ++
        (0 until 3).map(i => s"http://fresh.net/z/$i"): _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(accepted.toSet ==
      ((0 until 5).map(i => s"http://newsite.org/a/$i") ++
        (0 until 3).map(i => s"http://fresh.net/z/$i")).toSet, s"got ${accepted.toSet}")
    // the index grew by exactly the accepted urls (idempotence ledger)
    val indexed = spark.read.parquet(s"$dir/urls").select("url").as[String].collect().toSet
    assert(indexed.size == 48)
    assert(indexed.count(_.startsWith("http://newsite")) == 5)
    assert(indexed.count(_.startsWith("http://fresh")) == 3)
  }
}
