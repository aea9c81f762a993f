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
    }

    def deliver(): String = {
      val e = nextEpoch; nextEpoch += 1
      sink(records(e), e.toLong)
      committed += e; inPrimary += e; inDigest += e
      s"deliver($e)"
    }
    def replay(): String = {
      val e = committed(rnd.nextInt(committed.size))
      sink(records(e), e.toLong) // exactly-once: completes whatever a crash left undone
      inPrimary += e; inDigest += e
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
      committed += e; inDigest += e
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

    deliver(); check(0, "deliver(0)")
    for (step <- 1 until 205) {
      val roll = rnd.nextInt(100)
      val op =
        if (roll < 30) deliver()
        else if (roll < 50) replay()
        else if (roll < 60) halfDeliver()
        else if (roll < 70) { if (inPrimary.nonEmpty) unpublishedAppend() else deliver() }
        else if (roll < 84) tieredCompact()
        else if (roll < 89) fullCompact()
        else if (roll < 94) vacuum()
        else if (roll < 97) archiveCompact()
        else refresh()
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
