package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.{col, concat, lit}

import graft.sources.WarcIo
import graft.sources.WarcIo.WarcRecord

/** WARC container: round-trips (plain + gzip members), header folding,
  * loud failures on every malformed shape, HTTP payload parse, WET
  * conversion, and the Spark file reader.
  */
class WarcIoSpec extends SparkSpec {

  private def rec(i: Int, body: String, rtype: String = "response"): WarcRecord =
    WarcRecord(
      recordType = rtype,
      targetUri = s"http://example.org/doc/$i",
      date = "2026-01-01T00:00:00Z",
      recordId = WarcIo.recordIdFor(s"spec:$i"),
      contentType = "text/plain",
      extra = Map("WARC-Block-Digest" -> s"sha1:fake$i"),
      payload = body.getBytes(UTF_8))

  test("plain round-trip preserves every field and the payload bytes") {
    val in = Seq(rec(1, "hello warc"), rec(2, "second récord ✓"), rec(3, ""))
    val out = WarcIo.readAll(WarcIo.writePlain(in))
    assert(out.length == 3)
    in.zip(out).foreach { case (a, b) =>
      assert(a.recordType == b.recordType && a.targetUri == b.targetUri &&
        a.date == b.date && a.recordId == b.recordId &&
        a.contentType == b.contentType && a.extra == b.extra)
      assert(a.payload.sameElements(b.payload))
    }
  }

  test("gzip member-per-record round-trip (concatenated members)") {
    val in = (0 until 20).map(i => rec(i, s"body $i " + ("x" * i)))
    val gz = WarcIo.writeGz(in)
    // really multiple members: count gzip magics at member boundaries
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b)
    val out = WarcIo.readAll(gz)
    assert(out.length == 20)
    assert(out.zipWithIndex.forall { case (r, i) => r.targetUri.endsWith(s"/doc/$i") })
  }

  test("header continuation folding and bare-LF lines are accepted") {
    val raw = ("WARC/1.0\r\n" +
      "WARC-Type: metadata\r\n" +
      "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "X-Long: first\r\n  folded tail\r\n" +
      "Content-Length: 2\n" + // bare LF tolerated
      "\r\nhi\r\n\r\n").getBytes(UTF_8)
    val r = WarcIo.readAll(raw).head
    assert(r.extra("X-Long") == "first folded tail")
    assert(new String(r.payload, UTF_8) == "hi")
  }

  test("malformed archives fail loudly") {
    val good = WarcIo.writeRecord(rec(1, "payload"))
    // truncated payload
    intercept[IllegalArgumentException](WarcIo.readAll(good.dropRight(6)))
    // corrupt trailer
    val badTrailer = good.clone(); badTrailer(badTrailer.length - 1) = 'X'
    intercept[IllegalArgumentException](WarcIo.readAll(badTrailer))
    // wrong version line
    intercept[IllegalArgumentException](
      WarcIo.readAll("WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes(UTF_8)))
    // missing Content-Length
    intercept[IllegalArgumentException](WarcIo.readAll(
      ("WARC/1.0\r\nWARC-Type: x\r\nWARC-Record-ID: <a>\r\n" +
        "WARC-Date: d\r\n\r\n\r\n\r\n").getBytes(UTF_8)))
    // payload over the guard
    intercept[IllegalArgumentException](WarcIo.readAll(good, maxPayloadBytes = 3))
  }

  test("HTTP response build/parse round-trip, content-length verified") {
    val body = "<html><body>ok</body></html>".getBytes(UTF_8)
    val payload = WarcIo.buildHttpResponse(200, "OK",
      Seq("Content-Type" -> "text/html; charset=utf-8", "Server" -> "graft"), body)
    val h = WarcIo.parseHttpResponse(payload)
    assert(h.status == 200 && h.reason == "OK")
    assert(h.header("content-type").contains("text/html; charset=utf-8"))
    assert(h.body.sameElements(body))
    // tampered content-length fails
    val tampered = new String(payload, UTF_8).replace("Content-Length: 28", "Content-Length: 5")
    intercept[IllegalArgumentException](WarcIo.parseHttpResponse(tampered.getBytes(UTF_8)))
  }

  test("WET conversion record points back at its source") {
    val src = rec(7, "ignored")
    val wet = WarcIo.toWet(src, "extracted text")
    assert(wet.recordType == "conversion" && wet.contentType == "text/plain")
    assert(wet.extra("WARC-Refers-To") == src.recordId)
    assert(wet.targetUri == src.targetUri)
    assert(new String(wet.payload, UTF_8) == "extracted text")
    // and it round-trips like any record
    val back = WarcIo.readAll(WarcIo.writeGz(Seq(wet))).head
    assert(back.extra("WARC-Refers-To") == src.recordId)
  }

  test("readWarc: one row per record across multiple archive files") {
    val dir = Files.createTempDirectory("warcio")
    val a = (0 until 5).map(i => rec(i, s"file-a $i"))
    val b = (5 until 12).map(i => rec(i, s"file-b $i"))
    Files.write(Paths.get(dir.toString, "a.warc.gz"), WarcIo.writeGz(a))
    Files.write(Paths.get(dir.toString, "b.warc.gz"), WarcIo.writeGz(b))
    val df = WarcIo.readWarc(spark, dir.toString + "/*.warc.gz")
    val rows = df.collect()
    assert(rows.length == 12)
    val uris = rows.map(_.getAs[String]("target_uri")).toSet
    assert(uris == (0 until 12).map(i => s"http://example.org/doc/$i").toSet)
    val lens = rows.map(r => (r.getAs[String]("target_uri"), r.getAs[Long]("content_length"))).toMap
    assert(lens("http://example.org/doc/3") == "file-a 3".length.toLong)
  }

  test("a 5 MiB payload streams through intact (bounded, not ballooning)") {
    val big = Array.tabulate[Byte](5 << 20)(j => (j * 31 % 251).toByte)
    val r = rec(99, "").copy(payload = big, contentType = "application/octet-stream")
    val out = WarcIo.readAll(WarcIo.writeGz(Seq(r))).head
    assert(out.payload.length == big.length)
    assert(java.util.Arrays.equals(out.payload, big))
  }

  test("writeWarc ↔ readWarc round-trip (distributed writer, file per partition)") {
    import spark.implicits._
    val dir = TempDirs.scratch("warcw")
    val rows = spark.range(40).mapPartitions(_.map { i =>
      ("response", s"http://example.org/w/$i", "2026-01-01T00:00:00Z",
        WarcIo.recordIdFor(s"w:$i"), "text/plain", s"payload $i".getBytes(UTF_8))
    }).toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
      .repartition(4)
    val committed = WarcIo.writeWarc(rows, dir)
    assert(committed.length == 4)
    // paths come back FileSystem-qualified (the sink speaks Hadoop FS
    // so it can commit to HDFS/S3A; local runs qualify as file:)
    assert(committed.forall(_.startsWith("file:")))
    assert(committed.forall(p =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(p.stripPrefix("file:")))))
    assert(committed.forall(_.endsWith(".warc.gz")))
    val back = WarcIo.readWarc(spark, dir + "/*.warc.gz").collect()
    assert(back.length == 40)
    val byUri = back.map(r => r.getAs[String]("target_uri") ->
      new String(r.getAs[Array[Byte]]("payload"), UTF_8)).toMap
    (0 until 40).foreach { i =>
      assert(byUri(s"http://example.org/w/$i") == s"payload $i")
    }
    assert(back.forall(_.getAs[String]("rec_type") == "response"))
  }

  test("writeWarc attempt safety: two attempts of one partition → one valid archive") {
    val dir = TempDirs.scratch("warcatt")
    def recsOf(tag: String) = (0 until 5).iterator.map(i =>
      WarcIo.WarcRecord("response", s"http://example.org/a/$i", "2026-01-01T00:00:00Z",
        WarcIo.recordIdFor(s"a:$tag:$i"), "text/plain", Map.empty,
        s"attempt $tag payload $i".getBytes(UTF_8)))
    // zombie attempt 7 and its retry 8 race the same partition; the
    // retry commits last — exactly one final file, fully readable,
    // holding ONE attempt's records (never interleaved bytes)
    val hconf = spark.sessionState.newHadoopConf()
    val p1 = WarcIo.commitPartitionFile(dir, 3, 7L, recsOf("first"), hconf)
    val p2 = WarcIo.commitPartitionFile(dir, 3, 8L, recsOf("second"), hconf)
    assert(p1 == p2)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val names = try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala.map(_.getFileName.toString).toList
    } finally files.close()
    assert(names == List("part-00003.warc.gz"), s"left on disk: $names") // no .tmp orphans
    val back = WarcIo.readAll(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p1.stripPrefix("file:"))))
    assert(back.length == 5)
    assert(back.forall(r => new String(r.payload, UTF_8).startsWith("attempt second")))
  }

  test("withCdx attempt race: the committed archive/sidecar pair is from ONE attempt") {
    val dir = TempDirs.scratch("warcattc")
    def recsOf(tag: String, bodyLen: Int) = (0 until 5).iterator.map { i =>
      val body = (s"attempt $tag payload $i ").padTo(bodyLen, 'x')
      WarcIo.WarcRecord("response", s"http://example.org/a/$i", "2026-01-01T00:00:00Z",
        WarcIo.recordIdFor(s"ac:$tag:$i"), "application/http; msgtype=response", Map.empty,
        WarcIo.buildHttpResponse(200, "OK", Seq("Content-Type" -> "text/plain"),
          body.getBytes(UTF_8)))
    }
    val hconf = spark.sessionState.newHadoopConf()
    // a zombie attempt and its retry commit back-to-back with DIFFERENT
    // record sizes — whatever ends live, the sidecar's offsets must
    // frame the live archive's bytes (a cross-attempt pair would break
    // every ranged fetch for the part)
    WarcIo.commitPartitionFiles(dir, 2, 11L, recsOf("first", 40), hconf, withCdx = true)
    WarcIo.commitPartitionFiles(dir, 2, 12L, recsOf("second", 90), hconf, withCdx = true)
    val cdx = WarcIo.readCdxj(spark, dir + "/part-*.cdx.gz")
    assert(cdx.count() == 5)
    val fetched = WarcIo.fetchByCdx(cdx, dir).collect()
    assert(fetched.length == 5)
    fetched.foreach { r =>
      val http = WarcIo.parseHttpResponse(r.getAs[Array[Byte]]("payload"))
      assert(new String(http.body, UTF_8).startsWith("attempt second"))
    }
    // no temp orphans; exactly the committed pair remains
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val names = try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala.map(_.getFileName.toString).toList.sorted
    } finally files.close()
    assert(names == List("part-00002.cdx.gz", "part-00002.warc.gz"), s"left: $names")
  }

  test("manifest gate: a half-committed dir (no manifest) is hidden from gated readers") {
    import spark.implicits._
    val dir = TempDirs.scratch("warcman")
    val rows = spark.range(24).mapPartitions(_.map { i =>
      ("response", s"http://example.org/m/$i", "2026-01-01T00:00:00Z",
        WarcIo.recordIdFor(s"m:$i"),
        "application/http; msgtype=response",
        WarcIo.buildHttpResponse(200, "OK", Seq("Content-Type" -> "text/plain"),
          s"manifest payload $i".getBytes(UTF_8)))
    }).toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
      .repartition(3)
    WarcIo.writeWarcWithCdx(rows, dir)
    // committed job: manifest present, gated readers resolve through it
    assert(new java.io.File(dir, "_manifest").exists())
    assert(WarcIo.readWarcCommitted(spark, dir).count() == 24)
    assert(WarcIo.readCdxjCommitted(spark, dir).count() == 24)
    // gated fetch: pointers verify against the committed sizes
    val cdx = WarcIo.readCdxjCommitted(spark, dir)
    assert(WarcIo.fetchByCdx(cdx, dir).count() == 24)
    // a pointer past the committed size fails with the manifest message,
    // not a generic decode error
    val past = cdx.limit(1).withColumn("offset", col("offset") + 100000000L)
    val e1 = intercept[org.apache.spark.SparkException] {
      WarcIo.fetchByCdx(past, dir).collect()
    }
    assert(e1.getMessage.contains("committed size") ||
      Option(e1.getCause).exists(_.getMessage.contains("committed size")))
    // a pointer at an uncommitted filename fails as foreign
    val foreign = cdx.limit(1).withColumn("filename", lit("part-99999.warc.gz"))
    val e2 = intercept[org.apache.spark.SparkException] {
      WarcIo.fetchByCdx(foreign, dir).collect()
    }
    assert(e2.getMessage.contains("commit manifest") ||
      Option(e2.getCause).exists(_.getMessage.contains("commit manifest")))
    // simulate the crash-before-publish window: parts on disk, no
    // manifest — the GATED readers refuse; the glob readers (documented
    // un-gated, for external/pre-manifest archives) still read
    assert(new java.io.File(dir, "_manifest").delete())
    intercept[IllegalStateException] { WarcIo.readWarcCommitted(spark, dir) }
    intercept[IllegalStateException] { WarcIo.readCdxjCommitted(spark, dir) }
    assert(WarcIo.readWarc(spark, dir + "/*.warc.gz").count() == 24)
    // size drift after commit (foreign attempt / tampering) is loud too
    WarcIo.writeWarcWithCdx(rows, dir) // re-commit to restore the manifest
    val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz")).head
    val outS = new java.io.FileOutputStream(part, true)
    try outS.write(Array[Byte](0x1f, 0x8b.toByte)) finally outS.close()
    intercept[IllegalArgumentException] {
      WarcIo.committedFiles(spark, dir, ".warc.gz")
    }
  }

  test("manifest gate resolves PER DIRECTORY for prefixed pointers; empty commit reads as zero") {
    import spark.implicits._
    val root = TempDirs.scratch("warcman2")
    def rows(n: Int, idp: String) = spark.range(n).mapPartitions(_.map { i =>
      ("response", s"http://example.org/pd/$i", "2026-01-01T00:00:00Z",
        WarcIo.recordIdFor(idp + i), "application/http; msgtype=response",
        WarcIo.buildHttpResponse(200, "OK", Seq("Content-Type" -> "text/plain"),
          s"pd payload $i".getBytes(UTF_8)))
    }).toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
      .repartition(2)
    // the merged-master layout: per-crawl subdirs, collection-relative
    // filenames; each subdir publishes its OWN manifest
    WarcIo.writeWarcWithCdx(rows(8, "pd1:"), root + "/c1", "c1/")
    WarcIo.writeWarcWithCdx(rows(8, "pd2:"), root + "/c2", "c2/")
    val merged = WarcIo.readCdxj(spark, root + "/c*/part-*.cdx.gz")
    // prefixed pointers gate against THEIR directory's manifest and fetch
    assert(WarcIo.fetchByCdx(merged, root).count() == 16)
    // corrupting one subdir's committed file makes ITS pointers loud
    val part = new java.io.File(root + "/c2").listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val outS = new java.io.FileOutputStream(part, true)
    try outS.write("xx".getBytes(UTF_8)) finally outS.close()
    // the appended junk shifts the committed size: any c2/ pointer now
    // fails the size gate... only offsets near the tail would exceed,
    // so corrupt the MANIFEST's recorded size instead (same gate)
    val mPath = java.nio.file.Paths.get(root + "/c2", "_manifest")
    val doctored = new String(java.nio.file.Files.readAllBytes(mPath), UTF_8)
      .linesIterator.map { l =>
        if (l.endsWith(".warc.gz\t" + (part.length - 2)) ||
            l.split('\t').head == part.getName)
          l.split('\t').head + "\t1"
        else l
      }.mkString("\n") + "\n"
    java.nio.file.Files.write(mPath, doctored.getBytes(UTF_8))
    val e = intercept[org.apache.spark.SparkException] {
      WarcIo.fetchByCdx(merged.filter(col("filename").startsWith("c2/")), root).collect()
    }
    assert(e.getMessage.contains("committed size") ||
      Option(e.getCause).exists(_.getMessage.contains("committed size")))
    // an all-empty crawl publishes an empty manifest that READS as empty
    val emptyDir = TempDirs.scratch("warcman3")
    WarcIo.writeWarcWithCdx(rows(8, "pd3:").filter(lit(false)), emptyDir)
    assert(new java.io.File(emptyDir, "_manifest").exists())
    assert(WarcIo.readWarcCommitted(spark, emptyDir).count() == 0)
    assert(WarcIo.readCdxjCommitted(spark, emptyDir).count() == 0)
  }

  test("compactArchives: byte-identical records, valid rewritten pointers, fewer parts") {
    import spark.implicits._
    val dir = TempDirs.scratch("warccmp")
    val rows = spark.range(40).map { i =>
      ("response", s"http://example.org/cc/$i", "2026-01-01T00:00:00Z",
        WarcIo.recordIdFor(s"cc:$i"), "application/http; msgtype=response",
        WarcIo.buildHttpResponse(200, "OK", Seq("Content-Type" -> "text/plain"),
          (s"compact payload $i " * (1 + (i % 5).toInt)).getBytes(UTF_8)))
    }.toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
      .repartition(8)
    WarcIo.writeWarcWithCdx(rows, dir)
    val before = WarcIo.readWarcCommitted(spark, dir).collect()
      .map(r => r.getAs[String]("record_id") ->
        r.getAs[Array[Byte]]("payload").toSeq).toMap
    assert(before.size == 40)
    val total = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).map(_.length).sum
    val (warcs, cdxs) = WarcIo.compactArchives(spark, dir, targetBytes = total / 2 + 1)
    assert(warcs.length < 8 && warcs.length >= 2 && cdxs.length == warcs.length,
      s"expected consolidation, got ${warcs.length} parts")
    // no stale residue; manifest republished over exactly the new parts
    val names = new java.io.File(dir).list().sorted.toSeq
    assert(!names.exists(_.endsWith(".stale")), s"stale residue: $names")
    assert(names.count(_.endsWith(".warc.gz")) == warcs.length)
    // every record survives byte-identically (gzip members were COPIED)
    val after = WarcIo.readWarcCommitted(spark, dir).collect()
      .map(r => r.getAs[String]("record_id") ->
        r.getAs[Array[Byte]]("payload").toSeq).toMap
    assert(after == before)
    // the rewritten sidecars point into the new parts exactly: every
    // record fetches by pointer through the manifest-gated path
    val cdx = WarcIo.readCdxjCommitted(spark, dir)
    assert(cdx.count() == 40)
    assert(cdx.select("filename").distinct().collect()
      .forall(r => warcs.exists(_.endsWith(r.getString(0)))))
    val fetched = WarcIo.fetchByCdx(cdx, dir).collect()
    assert(fetched.length == 40)
    fetched.foreach { r =>
      val id = r.getAs[String]("target_uri").split('/').last.toLong
      val body = new String(WarcIo.parseHttpResponse(
        r.getAs[Array[Byte]]("payload")).body, UTF_8)
      assert(body.startsWith(s"compact payload $id "))
    }
    // a second compaction at a huge target folds to ONE part, same records
    val (w2, _) = WarcIo.compactArchives(spark, dir, targetBytes = Long.MaxValue)
    assert(w2.length == 1)
    assert(WarcIo.readWarcCommitted(spark, dir).count() == 40)
    // a settled dir is a FREE no-op: every group rides alone, so no
    // byte is moved and the committed paths come back unchanged
    val manifestBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifest"))
    val (w3, c3) = WarcIo.compactArchives(spark, dir, targetBytes = Long.MaxValue)
    assert(w3 == w2 && c3.length == 1)
    assert(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "_manifest"))
      .sameElements(manifestBytes), "no-op compaction must not republish")
    // a crashed maintenance run (parked .stale sources present) REFUSES
    // to compact — re-running over the partial outputs would publish a
    // manifest that silently drops the parked records
    val anyPart = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    java.nio.file.Files.copy(anyPart.toPath,
      java.nio.file.Paths.get(dir, "part-99990.warc.gz.stale"))
    val eStale = intercept[IllegalArgumentException] {
      WarcIo.compactArchives(spark, dir, targetBytes = 1000L)
    }
    assert(eStale.getMessage.contains(".stale"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "part-99990.warc.gz.stale"))
    // a sidecar line we cannot rewrite fails loudly, never commits stale
    intercept[IllegalArgumentException] {
      WarcIo.shiftCdxjLine("""org,x)/a 20260101000000 {"url":"http://x/a"}""", 10L, "p.warc.gz")
    }
    assert(WarcIo.shiftCdxjLine(
      """org,x)/a 20260101000000 {"url":"http://x/a","offset":"5","filename":"old.warc.gz"}""",
      100L, "new.warc.gz").contains(""""offset":"105""""))
    // the collection-relative prefix is DERIVED from the line itself,
    // never caller-supplied — compacting a prefixed collection cannot
    // silently strip it
    assert(WarcIo.shiftCdxjLine(
      """org,x)/a 20260101000000 {"url":"http://x/a","offset":"5","filename":"crawl1/old.warc.gz"}""",
      100L, "new.warc.gz").contains(""""filename":"crawl1/new.warc.gz""""))
  }

  test("compactArchives: a prefixed collection keeps its prefix; the master refresh resolves it") {
    import spark.implicits._
    val root = TempDirs.scratch("warccmpp")
    val rows = spark.range(24).map { i =>
      ("response", s"http://pfx.example.org/p/$i", "2026-01-01T00:00:00Z",
        WarcIo.recordIdFor(s"pfx:$i"), "application/http; msgtype=response",
        WarcIo.buildHttpResponse(200, "OK", Seq("Content-Type" -> "text/plain"),
          s"prefixed payload $i".getBytes(UTF_8)))
    }.toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
      .repartition(6)
    WarcIo.writeWarcWithCdx(rows, s"$root/crawl1", "crawl1/")
    val total = WarcIo.committedFiles(spark, s"$root/crawl1", ".warc.gz")
      .map(p => new java.io.File(new java.net.URI(p)).length).sum
    WarcIo.compactArchives(spark, s"$root/crawl1", targetBytes = total / 2 + 1)
    val cdx = WarcIo.readCdxjCommitted(spark, s"$root/crawl1")
    assert(cdx.count() == 24)
    // every rewritten pointer still carries the collection prefix and
    // dereferences from the COLLECTION ROOT (the merged-master layout)
    assert(cdx.select("filename").collect()
      .forall(_.getString(0).startsWith("crawl1/part-")))
    val fetched = WarcIo.fetchByCdx(cdx, root).collect()
    assert(fetched.length == 24)
    fetched.foreach { r =>
      val id = r.getAs[String]("target_uri").split('/').last
      assert(new String(WarcIo.parseHttpResponse(
        r.getAs[Array[Byte]]("payload")).body, UTF_8) == s"prefixed payload $id")
    }
  }

  test("readCdxj: the classic '-' null placeholder nulls numeric fields, never aborts") {
    val dir = TempDirs.scratch("warcdash")
    // the revisit-row shape some external indexers emit: '-' status and
    // length, a real pointer — must ingest with nulls, like readCdxClassic
    val lines = Seq(
      """org,ex)/a 20260101000000 {"url":"http://ex.org/a","status":"-","length":"-","offset":"7","filename":"f.warc.gz"}""",
      """org,ex)/b 20260101000000 {"url":"http://ex.org/b","status":"200","length":"34","offset":"0","filename":"f.warc.gz"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "x.cdx"),
      (lines.mkString("\n") + "\n").getBytes(UTF_8))
    val got = WarcIo.readCdxj(spark, dir + "/*.cdx").orderBy("surt").collect()
    assert(got.length == 2)
    assert(got(0).isNullAt(got(0).fieldIndex("status")) &&
      got(0).isNullAt(got(0).fieldIndex("length")) &&
      got(0).getAs[Long]("offset") == 7L)
    assert(got(1).getAs[Int]("status") == 200 && got(1).getAs[Long]("length") == 34L)
  }

  test("toWat: deterministic JSON envelope, RFC 8259 escaping, refers back to the source") {
    val body = "<html><body>x</body></html>".getBytes(UTF_8)
    val payload = WarcIo.buildHttpResponse(200, "OK",
      Seq("Content-Type" -> "text/html", "Server" -> "graft/1"), body)
    val src = WarcIo.WarcRecord("response", "http://w.org/a", "2026-01-01T00:00:00Z",
      "<urn:uuid:src-1>", "application/http; msgtype=response", Map.empty, payload)
    val wat = WarcIo.toWat(src, WarcIo.parseHttpResponse(payload),
      Some("A \"quoted\"\ttitle\\path"), Seq("/x", "http://o.org/?a=1&b=2"))
    assert(wat.recordType == "metadata")
    assert(wat.contentType == "application/json")
    assert(wat.extra("WARC-Refers-To") == "<urn:uuid:src-1>")
    val j = new String(wat.payload, UTF_8)
    // the envelope is pinned byte-for-byte: fixed key order, no
    // whitespace, escapes for quote/backslash/tab — drift here breaks
    // cross-tool WAT consumers silently
    assert(j ==
      """{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"http://w.org/a",""" +
      """"WARC-Type":"response"},"Payload-Metadata":{"Actual-Content-Length":""" +
      payload.length +
      ""","HTTP-Response-Metadata":{"Entity-Length":""" + body.length +
      ""","Headers":{"Content-Type":"text/html","Server":"graft/1",""" +
      """"Content-Length":"""" + body.length + """"},""" +
      """"HTML-Metadata":{"Links":[{"url":"/x"},{"url":"http://o.org/?a=1&b=2"}],""" +
      """"Title":"A \"quoted\"\ttitle\\path"},"Response-Message":{"Status":200}}}}}""",
      s"envelope drift:\n$j")
    // no title, no links → Title omitted, Links empty — still valid JSON
    val bare = new String(WarcIo.toWat(src, WarcIo.parseHttpResponse(payload),
      None, Nil).payload, UTF_8)
    assert(bare.contains("\"Links\":[]") && !bare.contains("\"Title\""))
    // repeated HTTP field names must NOT become duplicate JSON keys.
    // Names are case-insensitive (first-seen spelling kept), ordinary
    // repeats comma-join (RFC 9110 §5.3) — but Set-Cookie is RFC
    // 9110's named exception (cookie values contain commas, RFC 6265
    // forbids folding), so its repeats become a lossless JSON array.
    val dup = WarcIo.buildHttpResponse(200, "OK",
      Seq("Set-Cookie" -> "a=1; Expires=Wed, 21 Oct 2026 07:28:00 GMT",
        "Content-Type" -> "text/html",
        "set-cookie" -> "b=2",
        "X-Trace" -> "t1", "x-trace" -> "t2"),
      body)
    val dupJ = new String(WarcIo.toWat(
      src.copy(payload = dup), WarcIo.parseHttpResponse(dup), None, Nil).payload, UTF_8)
    assert(dupJ.contains(
      """"Headers":{"Set-Cookie":["a=1; Expires=Wed, 21 Oct 2026 07:28:00 GMT","b=2"],""" +
        """"Content-Type":"text/html","X-Trace":"t1,t2","Content-Length":""""),
      s"duplicate header keys leaked into the envelope:\n$dupJ")
    // a single Set-Cookie stays a plain string member
    val one = WarcIo.buildHttpResponse(200, "OK",
      Seq("Set-Cookie" -> "a=1", "Content-Type" -> "text/html"), body)
    val oneJ = new String(WarcIo.toWat(
      src.copy(payload = one), WarcIo.parseHttpResponse(one), None, Nil).payload, UTF_8)
    assert(oneJ.contains(""""Headers":{"Set-Cookie":"a=1","""))
  }

  test("payloadDigest matches the published sha1/base32 spelling") {
    // vectors cross-checked against hashlib.sha1 + base64.b32encode
    assert(WarcIo.payloadDigest(Array.emptyByteArray) ==
      "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    assert(WarcIo.payloadDigest("abc".getBytes(UTF_8)) ==
      "sha1:VGMT4NSHA2AWVOR6EVYXQUGCNSONBWE5")
    assert(WarcIo.payloadDigest("Hello WARC revisit".getBytes(UTF_8)) ==
      "sha1:5Y3KQBBXLN7TJ567JFVDG6OTWQ7OEAOB")
  }

  test("response digests cover the HTTP entity body only — interoperable with carried digests") {
    import spark.implicits._
    val body = "<html><body>stable page</body></html>".getBytes(UTF_8)
    val msg = WarcIo.buildHttpResponse(200, "OK",
      Seq("Content-Type" -> "text/html", "Server" -> "variant-A"), body)
    // the spec's payload for application/http is the ENTITY BODY: the
    // digest must equal sha1 of the body bytes alone, regardless of
    // status line / header differences between captures
    assert(WarcIo.httpPayloadDigest(msg) == WarcIo.payloadDigest(body))
    val msgB = WarcIo.buildHttpResponse(200, "OK",
      Seq("Content-Type" -> "text/html", "Server" -> "variant-B", "X-Extra" -> "hdr"), body)
    assert(WarcIo.httpPayloadDigest(msgB) == WarcIo.httpPayloadDigest(msg),
      "header drift must not change the payload digest")
    // no header/body separator → whole-block fallback
    assert(WarcIo.httpPayloadDigest(body) == WarcIo.payloadDigest(body))

    // a PRIOR crawl that carries body-only digests (the Common Crawl
    // shape) matches today's re-fetch even when response headers moved
    val prior = Seq(WarcIo.payloadDigest(body)).toDF("digest")
    val today = Seq(("response", "http://iv.org/p", msgB)).toDF("rec_type", "target_uri", "payload")
      .withColumn("warc_date", lit("2026-01-01T00:00:00Z"))
      .withColumn("record_id", lit("<urn:uuid:iv-1>"))
      .withColumn("content_type", lit("application/http; msgtype=response"))
    val out = WarcIo.markRevisits(today, prior).collect().head
    assert(out.getAs[String]("rec_type") == "revisit",
      "a body-identical re-fetch must revisit against a real corpus's carried digest")
    assert(out.getAs[Map[String, String]]("extra")("WARC-Payload-Digest") ==
      WarcIo.payloadDigest(body))
  }

  test("markRevisits: prior-digest matches become payload-free revisit records, round-tripped") {
    import spark.implicits._
    val dir = TempDirs.scratch("warcrev")
    def rows(texts: Seq[(Int, String)]) = texts.toDF("id", "text")
      .selectExpr("'response' as rec_type",
        "concat('http://rv.org/p/', id) as target_uri",
        "'2026-01-01T00:00:00Z' as warc_date",
        "concat('<urn:uuid:r', id, '>') as record_id",
        "'application/http; msgtype=response' as content_type",
        "cast(text as binary) as payload")
    val yesterday = rows((0 until 10).map(i => i -> s"body $i v1"))
    val prior = WarcIo.payloadDigests(yesterday)
    // today: even ids unchanged (revisit), odd ids changed (response)
    val today = rows((0 until 10).map(i =>
      i -> (if (i % 2 == 0) s"body $i v1" else s"body $i v2")))
    val marked = WarcIo.markRevisits(today, prior)
    WarcIo.writeWarc(marked, dir)
    val back = WarcIo.readWarc(spark, dir + "/*.warc.gz").collect()
    assert(back.length == 10)
    back.foreach { r =>
      val id = r.getAs[String]("target_uri").split('/').last.toInt
      val digest = r.getAs[String]("payload_digest")
      assert(digest != null && digest.startsWith("sha1:"), s"row $id lost its digest")
      if (id % 2 == 0) {
        assert(r.getAs[String]("rec_type") == "revisit")
        assert(r.getAs[Array[Byte]]("payload").isEmpty)
        // the revisit's digest is the ORIGINAL payload's digest
        assert(digest == WarcIo.payloadDigest(s"body $id v1".getBytes(UTF_8)))
      } else {
        assert(r.getAs[String]("rec_type") == "response")
        assert(new String(r.getAs[Array[Byte]]("payload"), UTF_8) == s"body $id v2")
      }
    }
    // digest sets compose across crawls: revisits contribute their
    // carried digest, so today's digest set still covers the even ids
    val todayDigests = WarcIo.payloadDigests(
      WarcIo.readWarc(spark, dir + "/*.warc.gz")).as[String].collect().toSet
    assert(todayDigests.size == 10)
    assert(todayDigests.contains(WarcIo.payloadDigest("body 0 v1".getBytes(UTF_8))))
    assert(todayDigests.contains(WarcIo.payloadDigest("body 1 v2".getBytes(UTF_8))))
  }

  test("markRevisits preserves caller headers and never converts non-response records") {
    import spark.implicits._
    val payload = "shared body".getBytes(UTF_8)
    val rows = Seq(
      ("response", "http://a.org/1", Map("WARC-IP-Address" -> "10.0.0.1")),
      ("metadata", "http://a.org/1", Map.empty[String, String]))
      .toDF("rec_type", "target_uri", "extra")
      .withColumn("warc_date", lit("2026-01-01T00:00:00Z"))
      .withColumn("record_id", concat(lit("<urn:uuid:x-"), col("rec_type"), lit(">")))
      .withColumn("content_type", lit("application/http; msgtype=response"))
      .withColumn("payload", lit(payload))
    val prior = Seq(WarcIo.payloadDigest(payload)).toDF("digest")
    val out = WarcIo.markRevisits(rows, prior).collect()
      .map(r => r.getAs[String]("rec_type") ->
        (r.getAs[Map[String, String]]("extra"), r.getAs[Array[Byte]]("payload"))).toMap
    // the response became a revisit AND kept its caller header
    val (revExtra, revPayload) = out("revisit")
    assert(revExtra("WARC-IP-Address") == "10.0.0.1")
    assert(revExtra("WARC-Profile") == WarcIo.RevisitProfile)
    assert(revExtra("WARC-Payload-Digest") == WarcIo.payloadDigest(payload))
    assert(revPayload.isEmpty)
    // the metadata record with a matching digest passes through intact
    val (metaExtra, metaPayload) = out("metadata")
    assert(java.util.Arrays.equals(metaPayload, payload))
    assert(metaExtra("WARC-Payload-Digest") == WarcIo.payloadDigest(payload))
    assert(!metaExtra.contains("WARC-Profile"))
  }

  test("writeWarc cleans stale parts from a previous wider job") {
    import spark.implicits._
    val dir = TempDirs.scratch("warcstale")
    def job(n: Int, parts: Int) = spark.range(n).mapPartitions(_.map { i =>
      ("response", s"http://example.org/s/$i", "2026-01-01T00:00:00Z",
        WarcIo.recordIdFor(s"s:$i"), "text/plain", s"p$i".getBytes(UTF_8))
    }).toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
      .repartition(parts)
    assert(WarcIo.writeWarc(job(40, 8), dir).length == 8)
    // second, narrower job into the same dir: the 6 stale wide parts
    // must not survive to inflate the committed output
    val committed = WarcIo.writeWarc(job(10, 2), dir)
    assert(committed.length == 2)
    assert(WarcIo.readWarc(spark, dir + "/*.warc.gz").count() == 10)
  }

  test("charset chain: header > meta prescan > UTF-8; replacement never throws") {
    import java.nio.charset.Charset
    // header wins
    val latin = "café ñ".getBytes(Charset.forName("ISO-8859-1"))
    val h1 = WarcIo.parseHttpResponse(WarcIo.buildHttpResponse(200, "OK",
      Seq("Content-Type" -> "text/html; charset=ISO-8859-1"), latin))
    assert(WarcIo.decodeBody(h1) == "café ñ")
    // no header charset → meta prescan
    val metaDoc = "<html><head><meta charset='windows-1252'></head><body>€</body></html>"
    val h2 = WarcIo.parseHttpResponse(WarcIo.buildHttpResponse(200, "OK",
      Seq("Content-Type" -> "text/html"), metaDoc.getBytes(Charset.forName("windows-1252"))))
    assert(WarcIo.decodeBody(h2).contains("€"))
    // unknown charset name → fall through to UTF-8
    assert(WarcIo.charsetOf("text/html; charset=not-a-charset").isEmpty)
    assert(WarcIo.charsetOf("text/html").isEmpty)
    assert(WarcIo.charsetOf("TEXT/HTML; CHARSET=\"UTF-8\"").map(_.name).contains("UTF-8"))
    // malformed UTF-8 bytes decode to U+FFFD, never throw
    val bad = WarcIo.parseHttpResponse(WarcIo.buildHttpResponse(200, "OK",
      Seq("Content-Type" -> "text/plain; charset=utf-8"),
      Array[Byte]('o', 'k', 0xC3.toByte, 0x28)))
    assert(WarcIo.decodeBody(bad) == "ok�(")
    // review catch: a bare "charset=" OUTSIDE a <meta> tag (link hrefs,
    // visible text) must not select the decode charset
    val lure = ("<html><body><a href=\"/conv?charset=koi8-r\">x</a>" +
      "<p>café</p></body></html>").getBytes("UTF-8")
    assert(WarcIo.sniffMetaCharset(lure).isEmpty)
    val h3 = WarcIo.parseHttpResponse(WarcIo.buildHttpResponse(200, "OK",
      Seq("Content-Type" -> "text/html"), lure))
    assert(WarcIo.decodeBody(h3).contains("café"))
    // and non-markup bodies skip the prescan entirely
    val json = "{\"u\": \"/x?charset=koi8-r\", \"t\": \"café\"}".getBytes("UTF-8")
    val h4 = WarcIo.parseHttpResponse(WarcIo.buildHttpResponse(200, "OK",
      Seq("Content-Type" -> "application/json"), json))
    assert(WarcIo.decodeBody(h4).contains("café"))
  }

  test("chunked transfer-encoding: dechunk reassembles; malformed framing fails loudly") {
    val body = "Hello 🚀 chunked world with a multi-byte split".getBytes(UTF_8)
    def chunked(cuts: Seq[Int]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      (Seq(0) ++ cuts ++ Seq(body.length)).sliding(2).foreach { case Seq(a, b) =>
        bos.write(Integer.toHexString(b - a).getBytes("US-ASCII"))
        bos.write("\r\n".getBytes("US-ASCII"))
        bos.write(body, a, b - a)
        bos.write("\r\n".getBytes("US-ASCII"))
      }
      bos.write("0\r\n\r\n".getBytes("US-ASCII"))
      bos.toByteArray
    }
    // split inside the rocket's 4-byte UTF-8 sequence
    assert(java.util.Arrays.equals(WarcIo.dechunk(chunked(Seq(7, 8))), body))
    assert(java.util.Arrays.equals(WarcIo.dechunk(chunked(Seq(20))), body))
    // chunk extension is ignored
    val withExt = ("5;ext=v\r\nhello\r\n0\r\n\r\n").getBytes("US-ASCII")
    assert(new String(WarcIo.dechunk(withExt), UTF_8) == "hello")
    // bodyBytes routes on the Transfer-Encoding header
    val raw = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5\r\nhello\r\n0\r\n\r\n").getBytes("US-ASCII")
    val http = WarcIo.parseHttpResponse(raw)
    assert(new String(WarcIo.bodyBytes(http), UTF_8) == "hello")
    assert(WarcIo.decodeBody(http) == "hello")
    // malformed shapes fail with the WARC: contract
    intercept[IllegalArgumentException](WarcIo.dechunk("zz\r\nxx\r\n0\r\n\r\n".getBytes(UTF_8)))
    intercept[IllegalArgumentException](WarcIo.dechunk("a\r\nshort\r\n0\r\n\r\n".getBytes(UTF_8)))
    intercept[IllegalArgumentException](WarcIo.dechunk("5\r\nhelloXX0\r\n\r\n".getBytes(UTF_8)))
    intercept[IllegalArgumentException](WarcIo.dechunk("5\r\nhello\r\n".getBytes(UTF_8)))
    // the chunked HEADER over an ALREADY-DECHUNKED body (capture
    // proxies dechunk on the wire but keep the header — common in real
    // WARC corpora): bodyBytes must pass the body through raw, not
    // kill the task on "bad chunk size '<html>'"
    val pre = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "<html><body>already dechunked</body></html>").getBytes("US-ASCII")
    assert(WarcIo.decodeBody(WarcIo.parseHttpResponse(pre)) ==
      "<html><body>already dechunked</body></html>")
    // looksChunked boundary cases
    assert(WarcIo.looksChunked("5\r\nhello\r\n0\r\n\r\n".getBytes(UTF_8)))
    assert(WarcIo.looksChunked("5;ext=v\r\nhello\r\n0\r\n\r\n".getBytes(UTF_8)))
    assert(!WarcIo.looksChunked("<html>".getBytes(UTF_8)))
    // zero-padded sizes are legal framing (9+ digits via leading zeros)
    assert(WarcIo.looksChunked("000000005\r\nhello\r\n0\r\n\r\n".getBytes(UTF_8)))
    assert(new String(
      WarcIo.dechunk("000000005\r\nhello\r\n0\r\n\r\n".getBytes(UTF_8)), UTF_8) == "hello")
    // leading hex chars but no CRLF framing → raw body, not framing
    assert(!WarcIo.looksChunked("deadline extended to Friday".getBytes(UTF_8)))
    assert(!WarcIo.looksChunked(Array.empty[Byte]))
    // genuinely framed bodies still fail loudly when corrupt mid-way
    val torn = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5\r\nhello\r\n").getBytes("US-ASCII")
    intercept[IllegalArgumentException](WarcIo.bodyBytes(WarcIo.parseHttpResponse(torn)))
  }

  test("charsetOf accepts single-quoted charset tokens") {
    assert(WarcIo.charsetOf("text/html; charset='utf-8'").map(_.name).contains("UTF-8"))
    assert(WarcIo.charsetOf("text/html; charset='windows-1252'")
      .map(_.name).contains("windows-1252"))
  }

  test("gzipMember == GZIPOutputStream modulo the OS header byte; pinned OS=0") {
    // pin the thread-local-Deflater writer against the real
    // GZIPOutputStream across shapes (review catch). The deflate
    // payload, CRC32 and ISIZE must be byte-identical; the one LEGAL
    // divergence is header byte 9 (OS): JDK-8244706 moved the JDK from
    // OS=0 to OS=255 ("unknown") in JDK 16, while gzipMember pins the
    // deterministic OS=0 — stable across JDK upgrades, ignored by
    // every decompressor. NB the pooled Deflater retains native zlib
    // buffers for the thread's lifetime by design — bounded (one per
    // pool thread), documented at the declaration.
    val rnd = new scala.util.Random(4242)
    val shapes = Seq(
      Array.emptyByteArray,
      "x".getBytes(UTF_8),
      ("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody " * 40).getBytes(UTF_8),
      Array.fill(1 << 16)(rnd.nextInt().toByte),
      new Array[Byte](1 << 16)) // all zeros: max-compression shape
    shapes.foreach { raw =>
      val viaJdk = {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(raw); g.finish(); g.close()
        bos.toByteArray
      }
      val mine = WarcIo.gzipMember(raw)
      assert(mine.length == viaJdk.length,
        s"gzipMember length diverged from GZIPOutputStream on ${raw.length}-byte input")
      assert(mine(9) == 0, "gzipMember must pin OS=0 (JDK-independent header)")
      val normalized = viaJdk.clone(); normalized(9) = 0
      assert(java.util.Arrays.equals(mine, normalized),
        s"gzipMember diverged from GZIPOutputStream beyond the OS byte on ${raw.length}-byte input")
      // and twice through the same thread's reset Deflater stays identical
      assert(java.util.Arrays.equals(WarcIo.gzipMember(raw), mine))
    }
  }

  test("Content-Encoding gzip/deflate bodies decompress; zip bombs hit the guard") {
    val text = "compressed body with café and 🚀 content " * 4
    val plain = text.getBytes(UTF_8)
    val gz = WarcIo.gzipMember(plain) // any gzip stream works here
    def resp(headers: Seq[(String, String)], body: Array[Byte]): WarcIo.HttpResponse =
      WarcIo.parseHttpResponse(WarcIo.buildHttpResponse(200, "OK", headers, body))
    val g = resp(Seq("Content-Type" -> "text/html; charset=utf-8",
      "Content-Encoding" -> "gzip"), gz)
    assert(WarcIo.decodeBody(g) == text)
    // zlib deflate
    val zlib = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bos)
      d.write(plain); d.close(); bos.toByteArray
    }
    assert(WarcIo.decodeBody(resp(Seq("Content-Type" -> "text/plain; charset=utf-8",
      "Content-Encoding" -> "deflate"), zlib)) == text)
    // raw deflate (no zlib header) — the other in-the-wild form
    val rawDef = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bos,
        new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true))
      d.write(plain); d.close(); bos.toByteArray
    }
    assert(WarcIo.decodeBody(resp(Seq("Content-Type" -> "text/plain; charset=utf-8",
      "Content-Encoding" -> "deflate"), rawDef)) == text)
    // chunked + gzip composed: framing removed first, then decompressed
    val chunkedGz = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(("HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n" +
        "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n\r\n").getBytes("US-ASCII"))
      val cut = gz.length / 2
      Seq((0, cut), (cut, gz.length)).foreach { case (a, b) =>
        bos.write(Integer.toHexString(b - a).getBytes("US-ASCII"))
        bos.write("\r\n".getBytes("US-ASCII")); bos.write(gz, a, b - a)
        bos.write("\r\n".getBytes("US-ASCII"))
      }
      bos.write("0\r\n\r\n".getBytes("US-ASCII"))
      bos.toByteArray
    }
    assert(WarcIo.decodeBody(WarcIo.parseHttpResponse(chunkedGz)) == text)
    // inflation past the guard fails loudly instead of ballooning heap
    val bomb = WarcIo.gzipMember(new Array[Byte](4 << 20)) // 4 MiB of zeros
    val b = resp(Seq("Content-Encoding" -> "gzip"), bomb)
    intercept[IllegalArgumentException](WarcIo.bodyBytes(b, maxBytes = 1 << 20))
    // corrupt gzip fails loudly
    val corrupt = gz.clone(); corrupt(corrupt.length / 2) = 0x55
    intercept[IllegalArgumentException](
      WarcIo.bodyBytes(resp(Seq("Content-Encoding" -> "gzip"), corrupt)))
  }

  test("negative / non-numeric Content-Length fail with the WARC: contract") {
    def raw(len: String) = ("WARC/1.0\r\nWARC-Type: x\r\nWARC-Record-ID: <a>\r\n" +
      s"WARC-Date: d\r\nContent-Length: $len\r\n\r\nhi\r\n\r\n").getBytes(UTF_8)
    val neg = intercept[IllegalArgumentException](WarcIo.readAll(raw("-2")))
    assert(neg.getMessage.startsWith("WARC: "))
    val nan = intercept[IllegalArgumentException](WarcIo.readAll(raw("twelve")))
    assert(nan.getMessage.startsWith("WARC: "))
  }

  /** An InputStream that synthesizes an endless WARC stream record by
    * record and counts bytes actually served — direct proof that the
    * parse path has one-record residency: pulling k records reads only
    * ~k records' worth of bytes, never the archive.
    */
  private final class GeneratedWarcStream(recordBytes: Int => Array[Byte])
      extends java.io.InputStream {
    private var ix = 0
    private var cur: Array[Byte] = recordBytes(0)
    private var off = 0
    var served = 0L
    override def read(): Int = {
      if (off == cur.length) { ix += 1; cur = recordBytes(ix); off = 0 }
      val b = cur(off) & 0xff
      off += 1; served += 1
      b
    }
  }

  test("recordsFromRaw is lazy: k records pulled = ~k records read (not the archive)") {
    val perRec = WarcIo.writeRecord(rec(0, "p" * 1000)).length // all records same size
    val gen = new GeneratedWarcStream(i => WarcIo.writeRecord(rec(i, "p" * 1000)))
    val it = WarcIo.recordsFromRaw(gen)
    val first5 = it.take(5).toVector
    assert(first5.map(_.targetUri) == (0 until 5).map(i => s"http://example.org/doc/$i"))
    // BufferedInputStream reads ahead at most its 64 KiB buffer beyond
    // the 5 records consumed; the whole "archive" is unbounded
    assert(gen.served <= 5L * perRec + (64 << 10) + perRec)
  }

  test("readWarc parses a multi-hundred-MiB decoded archive (streaming Spark path)") {
    // 128 records x 2 MiB of zeros = 256 MiB decoded; the .gz on disk is
    // tiny. The old readAll-based path held every record in one Vector;
    // the PortableDataStream path keeps one record live at a time.
    val dir = Files.createTempDirectory("warcbig")
    val f = Paths.get(dir.toString, "big.warc.gz")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.BufferedOutputStream(Files.newOutputStream(f), 1 << 20))
    val payload = new Array[Byte](2 << 20)
    (0 until 128).foreach { i =>
      out.write(WarcIo.writeRecord(rec(i, "").copy(payload = payload,
        contentType = "application/octet-stream")))
    }
    out.close()
    import org.apache.spark.sql.functions.{count, max, sum}
    val agg = WarcIo.readWarc(spark, f.toString)
      .agg(count("*").as("n"), sum("content_length").as("bytes"),
        max("rec_ix").as("last")).head()
    assert(agg.getAs[Long]("n") == 128L)
    assert(agg.getAs[Long]("bytes") == 128L * (2 << 20))
    assert(agg.getAs[Int]("last") == 127)
  }
}
