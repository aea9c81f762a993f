package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.{CdxIndex, WarcIo}

/** Randomized LSM-maintenance soak: a seeded-random schedule
  * interleaving every maintenance mutator the living archive uses —
  * appendEpoch (via the real archiveEpochSink body), size-tiered and
  * full compaction, vacuum, archive byte-compaction and
  * refreshFromArchives — with PLANTED CRASHES (an epoch delivered with
  * its digest append missing; a primary append whose manifest publish
  * is undone; replays of both), asserting after EVERY step that both
  * masters' pointer-free rows equal the brute accumulation of the
  * epochs actually recorded. CrawlStreamingSpec pins two specific
  * crash points; this generalizes them to arbitrary interleavings.
  *
  * The crash plants are exactly the windows the code documents:
  *   - "half delivery" stops after the PRIMARY append — the
  *     crash-between-the-two-master-appends window; a later sink
  *     replay must complete the digest side only.
  *   - "unpublished append" deletes the primary's newest manifest
  *     right after a full delivery — the build→publish window, leaving
  *     an orphan generation dir for vacuum; a later replay re-appends.
  *   - "metrics crash" plants the epoch-metrics fold's two crash
  *     states (compacted part moved in with the folded sources still
  *     present; the legacy live-parked-away state) — the ledger must
  *     read exactly one row per sink-applied epoch through both, and
  *     the next fold (random-threshold or the sink's own in-flow one)
  *     must converge the debris away.
  */
class LsmSoakSpec extends SparkSpec {

  test("randomized maintenance schedule: 205 steps, lookups equal brute accumulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val dir = TempDirs.scratch("lsm_soak_")
    val root = s"$dir/warc"
    val master = s"$dir/master"
    val digest = s"$dir/digest"
    val sink = WarcIo.archiveEpochSink(root, master, nShards = 2,
      digestDir = Some(digest), tagHorizon = Some(1000))

    def url(e: Int, i: Int) = s"http://s${(e + i) % 7}.soak.org/p/${e * 5 + i}"
    def records(e: Int) = (0 until 5).map { i =>
      ("response", url(e, i), "2026-01-01T00:00:00Z",
        WarcIo.recordIdFor(s"soak:$e:$i"),
        "application/http; msgtype=response",
        WarcIo.buildHttpResponse(200, "OK",
          Seq("Content-Type" -> "text/plain"), s"soak $e/$i".getBytes(UTF_8)))
    }.toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")

    var nextEpoch = 0
    val committed = scala.collection.mutable.ArrayBuffer.empty[Int] // epoch dir exists
    val inPrimary = scala.collection.mutable.Set.empty[Int]
    val inDigest = scala.collection.mutable.Set.empty[Int]
    // epochs whose SINK delivery appended to the primary — exactly the
    // rows the metrics ledger must hold (a halfDeliver bypasses the
    // sink so it never records; a replay records only when it actually
    // re-appends, i.e. the epoch's manifest publish had been undone)
    val inMetrics = scala.collection.mutable.Set.empty[Int]

    def expected(epochs: Set[Int]): Set[String] =
      epochs.flatMap(e => (0 until 5).map(i => url(e, i)))
    def actual(d: String): Seq[String] =
      CdxIndex.readMaster(spark, d).select("url").collect().map(_.getString(0)).toSeq
    def check(step: Int, op: String): Unit = {
      if (inPrimary.nonEmpty) {
        val a = actual(master)
        assert(a.size == inPrimary.size * 5 && a.toSet == expected(inPrimary.toSet),
          s"step $step ($op): primary diverged — ${a.size} rows vs ${inPrimary.size * 5}")
      }
      if (inDigest.nonEmpty) {
        val a = actual(digest)
        assert(a.size == inDigest.size * 5 && a.toSet == expected(inDigest.toSet),
          s"step $step ($op): digest diverged — ${a.size} rows vs ${inDigest.size * 5}")
      }
      if (inMetrics.nonEmpty) {
        // the ledger survives folds, fold crashes and parked trees:
        // one row per sink-applied epoch, deduplicated on read
        val m = CdxIndex.epochMetrics(spark, master)
          .select("epoch").collect().map(_.getString(0)).toSeq
        assert(m.size == inMetrics.size &&
          m.toSet == inMetrics.map(e => s"epoch-$e").toSet,
          s"step $step ($op): metrics ledger diverged — ${m.size} rows vs ${inMetrics.size}")
      }
    }

    def deliver(): String = {
      val e = nextEpoch; nextEpoch += 1
      sink(records(e), e.toLong)
      committed += e; inPrimary += e; inDigest += e; inMetrics += e
      s"deliver($e)"
    }
    def replay(): String = {
      val e = committed(rnd.nextInt(committed.size))
      val reappends = !inPrimary(e) // manifest publish was undone → the sink re-appends
      sink(records(e), e.toLong) // exactly-once: completes whatever a crash left undone
      inPrimary += e; inDigest += e
      if (reappends) inMetrics += e
      s"replay($e)"
    }
    def halfDeliver(): String = {
      // the crash BETWEEN the two master appends: dir commits, primary
      // records, the digest append never happens
      val e = nextEpoch; nextEpoch += 1
      WarcIo.writeWarcWithCdx(records(e), s"$root/epoch-$e", s"epoch-$e/")
      val cdx = WarcIo.readCdxjCommitted(spark, s"$root/epoch-$e")
      CdxIndex.appendEpoch(cdx, master, 2, s"epoch-$e")
      committed += e; inPrimary += e
      s"halfDeliver($e)"
    }
    def unpublishedAppend(): String = {
      // the crash in the build→publish window: undo the primary's
      // manifest publication right after a full delivery — the
      // generation dir stays as an orphan, the digest keeps its copy
      val e = nextEpoch; nextEpoch += 1
      sink(records(e), e.toLong)
      val newest = new java.io.File(master).listFiles()
        .filter(_.getName.matches("manifest-\\d{8}")).maxBy(_.getName)
      assert(newest.delete(), s"could not plant the crash at $newest")
      // the sink ran to completion before the plant, so its metrics row
      // IS on disk (and stays — the ledger records deliveries, and the
      // later replay's re-append dedupes against it on read)
      committed += e; inDigest += e; inMetrics += e
      s"unpublishedAppend($e)"
    }
    def tieredCompact(): String = {
      val m = 1 + rnd.nextInt(3)
      if (inPrimary.nonEmpty) CdxIndex.compact(spark, master, 2, m)
      if (inDigest.nonEmpty) CdxIndex.compact(spark, digest, 2, m)
      s"tieredCompact($m)"
    }
    def fullCompact(): String = {
      if (inPrimary.nonEmpty) CdxIndex.compact(spark, master, 2)
      if (inDigest.nonEmpty) CdxIndex.compact(spark, digest, 2)
      "fullCompact"
    }
    def vacuum(): String = {
      val keep = 1 + rnd.nextInt(2)
      if (inPrimary.nonEmpty) CdxIndex.vacuum(spark, master, keep)
      if (inDigest.nonEmpty) CdxIndex.vacuum(spark, digest, keep)
      s"vacuum($keep)"
    }
    def archiveCompact(): String = {
      // only epochs BOTH masters record: rewriting a dir a replay may
      // still rewrite is outside compactArchives' quiesced contract
      val full = committed.filter(e => inPrimary(e) && inDigest(e))
      if (full.isEmpty) deliver()
      else {
        val e = full(rnd.nextInt(full.size))
        WarcIo.compactArchives(spark, s"$root/epoch-$e", targetBytes = 1L << 20)
        s"archiveCompact($e)"
      }
    }
    def refresh(): String = {
      // the post-compaction master rebuild over EVERY committed dir;
      // dir-name tags close the unrecorded-epoch replay window
      val dirs = committed.map(e => s"$root/epoch-$e").toSeq
      CdxIndex.refreshFromArchives(spark, dirs, master, 2, tagFromDirNames = true)
      CdxIndex.refreshFromArchives(spark, dirs, digest, 2, tagFromDirNames = true)
      inPrimary ++= committed; inDigest ++= committed
      "refresh"
    }
    def metricsCrash(): String = {
      // the metrics fold's two crash states, planted mid-schedule: the
      // ledger must stay exact through either (and through the sink's
      // own in-flow fold that eventually folds the debris away)
      val live = new java.io.File(s"$master/_metrics")
      val parked = new java.io.File(s"$master/_metrics__parked")
      if (!live.exists()) deliver()
      else if (rnd.nextBoolean()) {
        // mid-fold crash: the compacted part moved in, sources not yet
        // deleted — every ledger row now exists twice on disk
        val staging = s"$master/_metrics__staging"
        CdxIndex.epochMetrics(spark, master).coalesce(1)
          .write.mode("overwrite").parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath, new java.io.File(live,
          s"part-folded-${java.util.UUID.randomUUID()}.parquet").toPath)
        "metricsCrash(midFold)"
      } else if (!parked.exists()) {
        // legacy parked crash: history parked, live gone — the next
        // sink delivery recreates a fresh live BESIDE it (the exact
        // state the old swap-based fold silently destroyed)
        assert(live.renameTo(parked), "could not plant the parked state")
        "metricsCrash(parked)"
      } else "metricsCrash(skip)"
    }
    def metricsFold(): String = {
      val m = 1 + rnd.nextInt(8)
      CdxIndex.compactEpochMetrics(spark, master, minFiles = m)
      s"metricsFold($m)"
    }

    deliver(); check(0, "deliver(0)")
    for (step <- 1 until 205) {
      val roll = rnd.nextInt(100)
      val op =
        if (roll < 26) deliver()
        else if (roll < 44) replay()
        else if (roll < 54) halfDeliver()
        else if (roll < 63) { if (inPrimary.nonEmpty) unpublishedAppend() else deliver() }
        else if (roll < 75) tieredCompact()
        else if (roll < 80) fullCompact()
        else if (roll < 85) vacuum()
        else if (roll < 88) archiveCompact()
        else if (roll < 91) refresh()
        else if (roll < 96) metricsCrash()
        else metricsFold()
      check(step, op)
    }
    // end state sanity: a final refresh reconciles everything ever
    // committed, and the masters agree with it
    refresh(); check(205, "refresh")
    assert(inPrimary == inDigest && inPrimary == committed.toSet)
    // the tag ledger never double-counted: row counts are exact
    assert(CdxIndex.readMaster(spark, master).count() == committed.size * 5L)
    assert(CdxIndex.readMaster(spark, digest).count() == committed.size * 5L)
  }
}
