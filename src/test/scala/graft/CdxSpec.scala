package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.functions.UrlOps
import graft.sources.{CdxIndex, WarcIo}
import graft.sources.WarcIo.WarcRecord

/** CDX: the archive URL index. SURT key rules, the CDXJ sidecar that
  * [[WarcIo.writeWarcWithCdx]] commits next to each archive part, the
  * ranged-read property those offsets promise (ONE seek + gunzip
  * fetches ONE record), and the sorted master index with cluster-pruned
  * lookup.
  */
private object CdxSpecFixtures extends Serializable {
  def httpRec(i: Long, body: String): WarcRecord = {
    val payload = WarcIo.buildHttpResponse(200, "OK",
      Seq("Content-Type" -> "text/html; charset=utf-8"), body.getBytes(UTF_8))
    WarcRecord("response", s"http://h${i % 5}.example.org/d/$i",
      "2026-02-03T04:05:06Z", WarcIo.recordIdFor(s"cdx:$i"),
      "application/http; msgtype=response", Map.empty, payload)
  }
}

class CdxSpec extends SparkSpec {

  // ------------------------------------------------------------- SURT key

  test("surtKey: host reversal, www strip, case fold, query sort") {
    assert(UrlOps.surtKey("http://www.Example.COM/Path/Page?b=2&a=1") ==
      "com,example)/path/page?a=1&b=2")
    // www strip only when >= 2 labels remain; numbered www strips too
    assert(UrlOps.surtKey("https://www2.blog.example.org/") == "org,example,blog)/")
    assert(UrlOps.surtKey("http://www.ck/p") == "ck,www)/p")
    // scheme never distinguishes
    assert(UrlOps.surtKey("https://example.com/x") == UrlOps.surtKey("http://example.com/x"))
  }

  test("surtKey: IPv4 keeps octet order; non-default port kept") {
    assert(UrlOps.surtKey("http://192.168.3.1:8080/x") == "192.168.3.1:8080)/x")
    assert(UrlOps.surtKey("http://192.168.3.1/x") == "192.168.3.1)/x")
    assert(UrlOps.surtKey("https://host.example.com:8443/p?q=1") ==
      "com,example,host:8443)/p?q=1")
    // default ports drop
    assert(UrlOps.surtKey("http://a.org:80/") == "org,a)/")
    assert(UrlOps.surtKey("https://a.org:443/") == "org,a)/")
  }

  test("surtKey: normalization feeds the key — dots, escapes, tracking, fragment") {
    assert(UrlOps.surtKey("http://a.org/x/./y/../z?utm_source=t&id=7#frag") ==
      "org,a)/x/z?id=7")
    // kept escapes case-fold with the whole key; unreserved decode first
    assert(UrlOps.surtKey("http://a.org/%41%2Fb") == "org,a)/a%2fb")
    // empty path becomes "/", trailing host dot strips
    assert(UrlOps.surtKey("https://sub.example.com.") == "com,example,sub)/")
  }

  test("surtKey: userinfo drops, params fold before sorting, whitespace encodes") {
    // userinfo is not resource identity — with it the key would leave
    // the host's contiguous range
    assert(UrlOps.surtKey("http://user@example.com/x") == "com,example)/x")
    assert(UrlOps.surtKey("http://u:pw@example.com/x") == "com,example)/x")
    // params lowercase BEFORE the byte-wise sort: case variants of the
    // same canonical query must collide ('B' < 'a' would otherwise
    // order them differently)
    assert(UrlOps.surtKey("http://a.org/p?B=1&a=2") ==
      UrlOps.surtKey("http://a.org/p?b=1&a=2"))
    assert(UrlOps.surtKey("http://a.org/p?B=1&a=2") == "org,a)/p?a=2&b=1")
    // raw space/control bytes percent-encode — the key must survive
    // space-delimited CDXJ lines as one token
    assert(UrlOps.surtKey("http://a.org/my doc.html") == "org,a)/my%20doc.html")
    assert(UrlOps.surtKey("http://a.org/p?q=a b") == "org,a)/p?q=a%20b")
  }

  test("surtKey: spelling-variant invariance holds across the corpus shapes") {
    // the key exists so that EVERY spelling of one resource collides;
    // check the full variant battery against a spread of base URLs
    val bases = Seq(
      "http://example.com/", "http://a.b.example.co.uk/path/page.html",
      "http://192.168.0.1/x", "http://h9.site3.org/p/7?a=1",
      "https://x.io/d/e/f?k=v&a=b")
    for (base <- bases) {
      val key = UrlOps.surtKey(base)
      def same(variant: String): Unit =
        assert(UrlOps.surtKey(variant) == key, s"'$variant' diverged from '$base'")
      val u = UrlOps.parse(base)
      val hostUp = u.host.toUpperCase
      val rest = base.substring(base.indexOf(u.host) + u.host.length)
      same(s"${u.scheme.toUpperCase}://$hostUp$rest")          // case
      same(s"https://${u.host}:443$rest")                      // scheme+default port
      same(s"http://user:pw@${u.host}$rest")                   // userinfo
      same(base + "#fragment")                                 // fragment
      same(base + (if (u.query.isEmpty) "?utm_source=t" else "&utm_campaign=c"))
    }
  }

  test("surtKey: one domain's hosts are a contiguous key range") {
    val keys = Seq(
      UrlOps.surtKey("http://example.com/z"),
      UrlOps.surtKey("http://a.example.com/a"),
      UrlOps.surtKey("http://b.example.com/"),
      UrlOps.surtKey("http://examplf.com/"), // lexicographic neighbor domain
      UrlOps.surtKey("http://example.org/"))
    val sorted = keys.sorted
    val domainRun = sorted.filter(_.startsWith("com,example"))
    // the three example.com keys are adjacent in the sorted order
    val i = sorted.indexOf(domainRun.head)
    assert(domainRun == sorted.slice(i, i + 3))
  }

  test("graft_surt native expression matches the JVM function; null on garbage") {
    val df = spark.createDataFrame(Seq(
      (1, "https://WWW.News.example.co.uk:443/A//B?z=2&y=1"),
      (2, "relative/path"), (3, "http://192.168.0.9/q?b&a"))
      .map(t => (t._1, t._2))).toDF("id", "url")
      .select(col("id"), call_function("graft_surt", col("url")).as("k"))
      .orderBy(col("id"))
    val got = df.collect().map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(got(0) == UrlOps.surtKey("https://WWW.News.example.co.uk:443/A//B?z=2&y=1"))
    assert(got(1) == null)
    assert(got(2) == UrlOps.surtKey("http://192.168.0.9/q?b&a"))
  }

  // --------------------------------------------------- CDXJ sidecar + seek

  private def httpRec(i: Long, body: String): WarcRecord = CdxSpecFixtures.httpRec(i, body)

  private def writeArchiveWithCdx(n: Int, parts: Int): (String, Seq[String], Seq[String]) = {
    import spark.implicits._
    val dir = TempDirs.scratch("cdx_arch_")
    val rows = spark.range(n).repartition(parts).map { i =>
      val r = CdxSpecFixtures.httpRec(i,
        s"<html><body>doc $i ${"pad " * (i % 7).toInt}</body></html>")
      (r.recordType, r.targetUri, r.date, r.recordId, r.contentType, r.payload)
    }.toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
    val (warcs, cdxs) = WarcIo.writeWarcWithCdx(rows, dir)
    (dir, warcs, cdxs)
  }

  test("writeWarcWithCdx: a cdx sidecar commits per part and parses back") {
    val (dir, warcs, cdxs) = writeArchiveWithCdx(40, 3)
    assert(warcs.nonEmpty && warcs.size == cdxs.size)
    val cdx = WarcIo.readCdxj(spark, dir + "/part-*.cdx.gz")
    val rows = cdx.collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      assert(r.getAs[String]("surt") == UrlOps.surtKey(r.getAs[String]("url")))
      assert(r.getAs[String]("ts") == "20260203040506")
      assert(r.getAs[String]("mime") == "text/html")
      assert(r.getAs[Int]("status") == 200)
      assert(r.getAs[String]("digest").startsWith("sha1:"))
      assert(r.getAs[Long]("length") > 0 && r.getAs[Long]("offset") >= 0)
      assert(r.getAs[String]("filename").endsWith(".warc.gz"))
    }
  }

  test("cdx offsets are exact: one ranged read + gunzip fetches exactly that record") {
    val (dir, _, _) = writeArchiveWithCdx(25, 2)
    val cdx = WarcIo.readCdxj(spark, dir + "/part-*.cdx.gz").collect()
    // every record, via its own pointer — no archive scan
    cdx.foreach { r =>
      val path = java.nio.file.Paths.get(dir, r.getAs[String]("filename"))
      val ch = java.nio.channels.FileChannel.open(path)
      try {
        val buf = java.nio.ByteBuffer.allocate(r.getAs[Long]("length").toInt)
        ch.position(r.getAs[Long]("offset"))
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        assert(!buf.hasRemaining, "short read — offset/length do not frame a member")
        val recs = WarcIo.readAll(buf.array())
        assert(recs.length == 1)
        assert(recs.head.targetUri == r.getAs[String]("url"))
      } finally ch.close()
    }
  }

  test("cdx digest matches payloadDigests (body-only for responses); warcinfo skipped") {
    import spark.implicits._
    val dir = TempDirs.scratch("cdx_dig_")
    val resp = httpRec(1, "digest me")
    val info = WarcRecord("warcinfo", "", "2026-02-03T04:05:06Z",
      WarcIo.recordIdFor("cdx:info"), "application/warc-fields", Map.empty,
      "software: graft\r\n".getBytes(UTF_8))
    val rows = Seq(resp, info).map(r =>
      (r.recordType, r.targetUri, r.date, r.recordId, r.contentType, r.payload))
      .toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
    WarcIo.writeWarcWithCdx(rows, dir)
    val cdx = WarcIo.readCdxj(spark, dir + "/part-*.cdx.gz").collect()
    assert(cdx.length == 1, "warcinfo (no target URI) must not be indexed")
    assert(cdx.head.getAs[String]("digest") == WarcIo.httpPayloadDigest(resp.payload))
  }

  test("a capture whose date yields no 14-digit timestamp fails the cdx write loudly") {
    import spark.implicits._
    val dir = TempDirs.scratch("cdx_baddate_")
    val r = httpRec(1, "x")
    val rows = Seq((r.recordType, r.targetUri, "2026", r.recordId, r.contentType, r.payload))
      .toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      WarcIo.writeWarcWithCdx(rows, dir)
    }
    assert(e.getMessage.contains("14-digit") || e.getCause != null)
  }

  test("readCdxClassic: the 11-field legacy layout lands in the CDXJ schema") {
    val dir = TempDirs.scratch("cdx_classic_")
    val lines = Seq(
      " CDX N b a m s k r M S V g", // header — dropped
      "org,example)/p/1 20260101000000 http://example.org/p/1 text/html 200 " +
        "VGMT4NSHA2AWVOR6EVYXQUGCNSONBWE5 - - 451 0 part-00000.warc.gz",
      "org,example)/p/2 20260101000001 http://example.org/p/2 - - - - - - 451 part-00000.warc.gz",
      "")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "idx.cdx"),
      lines.mkString("\n").getBytes(UTF_8))
    val rows = WarcIo.readCdxClassic(spark, dir + "/*.cdx")
      .orderBy("surt").collect()
    assert(rows.length == 2)
    val r1 = rows(0)
    assert(r1.getAs[String]("surt") == "org,example)/p/1")
    assert(r1.getAs[String]("ts") == "20260101000000")
    assert(r1.getAs[String]("digest") == "sha1:VGMT4NSHA2AWVOR6EVYXQUGCNSONBWE5",
      "classic bare-Base32 digests gain the sha1: prefix")
    assert(r1.getAs[Int]("status") == 200 && r1.getAs[Long]("length") == 451L)
    val r2 = rows(1)
    assert(r2.isNullAt(r2.fieldIndex("mime")) && r2.isNullAt(r2.fieldIndex("status")) &&
      r2.isNullAt(r2.fieldIndex("digest")) && r2.isNullAt(r2.fieldIndex("length")))
    assert(r2.getAs[Long]("offset") == 451L)
    // same schema as readCdxj -> legacy files feed the same master index
    val (adir, _, _) = writeArchiveWithCdx(5, 1)
    val modern = WarcIo.readCdxj(spark, adir + "/part-*.cdx.gz")
    assert(modern.columns.sameElements(
      WarcIo.readCdxClassic(spark, dir + "/*.cdx").columns))
    val merged = modern.unionByName(WarcIo.readCdxClassic(spark, dir + "/*.cdx"))
    val idxDir = TempDirs.scratch("cdx_classic_idx_")
    CdxIndex.buildTable(merged, idxDir, 2)
    assert(CdxIndex.lookupPrefix(spark, idxDir, "org,example)").count() == 2)
  }

  test("readCdxClassic: other layouts fail loudly, never misparse silently") {
    // a 9-field layout would silently drop every line; a 15-field one
    // would read the wrong columns into the ranged-read triple — both
    // must abort, not degrade
    val dir = TempDirs.scratch("cdx_classic_bad_")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "nine.cdx"),
      (" CDX N b a m s k r V g\n" +
        "org,x)/p 20260101000000 http://x.org/p text/html 200 ABC 451 0 f.warc.gz\n")
        .getBytes(UTF_8))
    val e1 = intercept[Exception] {
      WarcIo.readCdxClassic(spark, dir + "/nine.cdx").collect()
    }
    assert(e1.toString.contains("unsupported CDX layout") || e1.getCause != null)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "short.cdx"),
      "org,x)/p 20260101000000 http://x.org/p text/html 200 ABC 451 0 f.warc.gz\n"
        .getBytes(UTF_8))
    val e2 = intercept[Exception] {
      WarcIo.readCdxClassic(spark, dir + "/short.cdx").collect()
    }
    assert(e2.toString.contains("11 fields") || e2.getCause != null)
  }

  test("surtKey: IPv6 literals stay bracketed and unreversed") {
    // not an IPv4 literal, single bracketed label — no reversal or www
    // logic applies; the key stays one token with its port
    assert(UrlOps.surtKey("http://[2001:db8::1]/x") == "[2001:db8::1])/x")
    assert(UrlOps.surtKey("http://[::1]:8080/x") == "[::1]:8080)/x")
  }

  // --------------------------------------------------------- master index

  private def corpus(n: Int) = {
    spark.range(n).selectExpr(
      "concat('https://h', id % 40, '.site', id % 7, '.org/p/', id) AS url",
      "lpad(CAST(id % 97 AS STRING), 14, '0') AS ts",
      "concat('d', id) AS digest", "id AS offset", "100 + id % 9 AS length",
      "'text/html' AS mime", "CAST(200 AS INT) AS status",
      "concat('f', id % 16, '.warc.gz') AS filename")
      .withColumn("surt", call_function("graft_surt", col("url")))
      .select("surt", "ts", "url", "mime", "status", "digest", "length", "offset", "filename")
  }

  test("buildTable + lookupPrefix: pruned scan, identical to brute filter") {
    val dir = TempDirs.scratch("cdx_idx_")
    val cdx = corpus(4000)
    CdxIndex.buildTable(cdx, dir, nShards = 12)
    val prefix = "org,site3,h17)"
    val got = CdxIndex.lookupPrefix(spark, dir, prefix)
    // pruning: the lookup's scan touches a strict subset of the shards
    val allFiles = spark.read.parquet(dir + "/cdx").inputFiles.toSet
    val scanned = got.inputFiles.toSet
    assert(scanned.nonEmpty && scanned.subsetOf(allFiles) && scanned.size < allFiles.size,
      s"expected a pruned scan, got ${scanned.size} of ${allFiles.size} shards")
    // identical answer to the unpruned filter
    val brute = cdx.filter(col("surt").startsWith(prefix))
      .orderBy("surt", "ts").collect().map(_.toSeq)
    assert(got.orderBy("surt", "ts").collect().map(_.toSeq).toSeq == brute.toSeq)
    assert(brute.nonEmpty)
  }

  test("footer-derived cluster rows equal the distributed aggregation bit-for-bit") {
    // buildTable derives (lo, hi, n, ts_lo, ts_hi) per shard file from
    // the parquet footers instead of a second scan over the data; this
    // pins the equivalence against the brute groupBy it replaced —
    // including a non-ASCII key (UTF-8 byte order, where UTF-16
    // String order diverges) and an all-null-ts shard
    val dir = TempDirs.scratch("cdx_fstats_")
    val cdx = corpus(2000)
      // one supplementary-plane key: footer stats order must match
      // Spark's UTF8String order for it
      .unionByName(spark.range(1).selectExpr(
        "'zz,😀surt)/x' AS surt", "CAST(NULL AS STRING) AS ts",
        "'https://zz.example/x' AS url", "'text/html' AS mime",
        "CAST(200 AS INT) AS status", "'dZ' AS digest",
        "CAST(7 AS BIGINT) AS length", "CAST(0 AS BIGINT) AS offset",
        "'fz.warc.gz' AS filename"))
    CdxIndex.buildTable(cdx, dir, nShards = 6)
    val got = spark.read.parquet(dir + "/cluster")
      .orderBy("file").collect().map(_.toSeq).toSeq
    val brute = spark.read.parquet(dir + "/cdx")
      .groupBy(substring_index(input_file_name(), "/", -1).as("file"))
      .agg(min(col("surt")).as("lo"), max(col("surt")).as("hi"),
        count(lit(1)).as("n"),
        min(col("ts").cast("string")).as("ts_lo"),
        max(col("ts").cast("string")).as("ts_hi"))
      .orderBy("file").collect().map(_.toSeq).toSeq
    assert(got == brute, s"footer cluster drifted from the scan aggregation:\n$got\nvs\n$brute")
    assert(got.nonEmpty && got.map(_(3).asInstanceOf[Long]).sum == 2001L)
  }

  test("lookupRange half-open; lookupDomain spans hosts but NOT sibling domains") {
    val dir = TempDirs.scratch("cdx_idx2_")
    CdxIndex.buildTable(corpus(2000), dir, nShards = 8)
    // whole registrable domain: every host of site5.org
    val dom = CdxIndex.lookupDomain(spark, dir, "org,site5")
    assert(dom.count() == 2000 / 7 + (if (2000 % 7 > 5) 1 else 0))
    assert(dom.select("url").collect().forall(_.getString(0).contains(".site5.org/")))
    // miss: no shard intersects -> empty, same schema
    val miss = CdxIndex.lookupPrefix(spark, dir, "zz,nowhere)")
    assert(miss.count() == 0)
    assert(miss.columns.sameElements(dom.columns))
  }

  test("lookupUrl: exact key, canonicalization folds spelling variants, no prefix bleed") {
    val dir = TempDirs.scratch("cdx_url_")
    CdxIndex.buildTable(corpus(500), dir, nShards = 4)
    // /p/1 must not return /p/10..19, /p/100.. (they share the string prefix)
    val one = CdxIndex.lookupUrl(spark, dir, "https://h1.site1.org/p/1")
    assert(one.count() == 1)
    assert(one.collect().head.getAs[String]("url") == "https://h1.site1.org/p/1")
    // spelling variants resolve to the SAME capture, not merely some capture
    val variant = CdxIndex.lookupUrl(spark, dir,
      "HTTPS://H1.Site1.ORG:443/p/1?utm_source=x").collect()
    assert(variant.length == 1 &&
      variant.head.getAs[String]("url") == "https://h1.site1.org/p/1")
  }

  test("lookupDomain excludes string-prefix sibling domains, includes apex/port/subs") {
    import spark.implicits._
    val dir = TempDirs.scratch("cdx_idx3_")
    // adversarial keyspace: example.com apex, apex:8080, subdomain —
    // plus the SIBLINGS examples.com and example2.com whose keys are
    // string-extensions of "com,example" (digits sort between ',' and
    // ':', so a naive wide range would swallow example2.com)
    val urls = Seq(
      "https://example.com/a", "https://example.com:8080/b",
      "https://sub.example.com/c", "https://examples.com/x",
      "https://example2.com/y", "https://deep.sub.example.com/d")
    val cdx = urls.zipWithIndex.toDF("url", "i").selectExpr(
      "graft_surt(url) AS surt", "lpad(CAST(i AS STRING), 14, '0') AS ts",
      "url", "'text/html' AS mime", "CAST(200 AS INT) AS status",
      "concat('d', i) AS digest", "CAST(100 AS BIGINT) AS length",
      "CAST(i AS BIGINT) AS offset", "'f.warc.gz' AS filename")
    CdxIndex.buildTable(cdx, dir, nShards = 2)
    val got = CdxIndex.lookupDomain(spark, dir, "com,example")
      .select("url").collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("https://deep.sub.example.com/d", "https://example.com/a",
      "https://example.com:8080/b", "https://sub.example.com/c"))
  }

  test("fetchByCdx: ranged reads return exactly the looked-up records") {
    val (dir, _, _) = writeArchiveWithCdx(60, 4)
    val cdx = WarcIo.readCdxj(spark, dir + "/part-*.cdx.gz")
    val idxDir = TempDirs.scratch("cdx_fetch_idx_")
    CdxIndex.buildTable(cdx, idxDir, nShards = 6)
    // one host of five → a fifth of the records, by pointer
    val hit = CdxIndex.lookupPrefix(spark, idxDir, "org,example,h2)")
    val fetched = WarcIo.fetchByCdx(hit, dir)
    val rows = fetched.collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      assert(r.getAs[String]("rec_type") == "response")
      assert(r.getAs[String]("target_uri").startsWith("http://h2.example.org/d/"))
      val http = WarcIo.parseHttpResponse(r.getAs[Array[Byte]]("payload"))
      assert(http.status == 200)
      val id = r.getAs[String]("target_uri").split('/').last.toLong
      assert(new String(http.body, UTF_8).contains(s"doc $id "))
    }
    // ids are exactly the i % 5 == 2 cohort
    assert(rows.map(_.getAs[String]("target_uri").split('/').last.toLong).sorted.toSeq ==
      (0L until 60L).filter(_ % 5 == 2))
    // the cc-index-table column spelling resolves to the same records
    val viaColumnar = WarcIo.fetchByCdx(CdxIndex.toColumnar(hit), dir).collect()
    assert(viaColumnar.map(_.getAs[String]("target_uri")).sorted.toSeq ==
      rows.map(_.getAs[String]("target_uri")).sorted.toSeq)
  }

  test("fetchByCdx: a corrupt pointer fails loudly, not with a silent wrong record") {
    val (dir, _, _) = writeArchiveWithCdx(10, 1)
    val cdx = WarcIo.readCdxj(spark, dir + "/part-*.cdx.gz")
    // shift every offset by one byte — gzip magic breaks
    val bad = cdx.withColumn("offset", col("offset") + 1)
    val e = intercept[org.apache.spark.SparkException] {
      WarcIo.fetchByCdx(bad, dir).collect()
    }
    assert(e.getMessage != null)
  }

  test("replay: a revisit capture serves the ORIGINAL's bytes; no original is loud") {
    import spark.implicits._
    val root = TempDirs.scratch("cdx_replay_")
    def recs(date: String, idp: String, body: Long => String) =
      spark.range(6).map { i =>
        val payload = WarcIo.buildHttpResponse(200, "OK",
          Seq("Content-Type" -> "text/plain"), body(i).getBytes(UTF_8))
        ("response", s"http://w${i % 2}.example.org/p/$i", date,
          WarcIo.recordIdFor(idp + i), "application/http; msgtype=response", payload)
      }.toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
    WarcIo.writeWarcWithCdx(recs("2026-01-01T00:00:00Z", "rp1:", i => s"original body $i"),
      root + "/c1", "c1/")
    val prior = WarcIo.readCdxj(spark, root + "/c1/part-*.cdx.gz")
      .select(col("digest")).distinct()
    // day 2: even ids unchanged (→ revisit), odd ids changed
    WarcIo.writeWarcWithCdx(WarcIo.markRevisits(
      recs("2026-01-02T00:00:00Z", "rp2:",
        i => if (i % 2 == 0) s"original body $i" else s"changed body $i"), prior),
      root + "/c2", "c2/")
    val index = WarcIo.readCdxj(spark, root + "/c*/part-*.cdx.gz")
    // revisit rows carry the warc/revisit mime convention in the sidecar
    assert(index.filter(col("mime") === "warc/revisit").count() == 3)
    val day2 = index.filter(col("filename").startsWith("c2/"))
    val out = WarcIo.replay(day2.select("filename", "offset", "length"), index, root)
      .collect().map { r =>
        val id = r.getAs[String]("target_uri").split('/').last.toLong
        val body = new String(WarcIo.parseHttpResponse(
          r.getAs[Array[Byte]]("payload")).body, UTF_8)
        id -> ((r.getAs[String]("rec_type"), r.getAs[Boolean]("replayed"), body))
      }.toMap
    assert(out.size == 6)
    (0L until 6L).foreach { i =>
      if (i % 2 == 0) // the revisit replays the ORIGINAL payload bytes
        assert(out(i) == (("revisit", true, s"original body $i")), s"id $i: ${out(i)}")
      else
        assert(out(i) == (("response", false, s"changed body $i")), s"id $i: ${out(i)}")
    }
    // an index with the originals missing fails LOUDLY (a wayback that
    // serves a revisit's empty payload is the silent-corruption case)
    val e = intercept[Exception] {
      WarcIo.replay(day2.select("filename", "offset", "length"), day2, root).collect()
    }
    assert(e.toString.contains("no original capture") ||
      Option(e.getCause).exists(_.toString.contains("no original capture")))
    // an index that does NOT mark revisits (null mimes — external CDX,
    // pre-convention sidecars) lets the as-of land on a revisit row —
    // possibly the request itself; the fetched-record check catches it
    val blind = index.withColumn("mime", lit(null).cast("string"))
    val e2 = intercept[Exception] {
      WarcIo.replay(day2.select("filename", "offset", "length"), blind, root).collect()
    }
    assert(e2.toString.contains("is itself a revisit") ||
      Option(e2.getCause).exists(_.toString.contains("is itself a revisit")))
  }

  test("replayRedirects: chains resolve to terminal bytes; cycles unresolved; missing loud") {
    import spark.implicits._
    val root = TempDirs.scratch("cdx_redir_")
    def http200(body: String) = WarcIo.buildHttpResponse(200, "OK",
      Seq("Content-Type" -> "text/plain"), body.getBytes(UTF_8))
    def http301(loc: Option[String]) = WarcIo.buildHttpResponse(301, "Moved",
      Seq("Content-Type" -> "text/html") ++ loc.map("Location" -> _),
      "moved".getBytes(UTF_8))
    val rows = Seq(
      "/d/1" -> http200("terminal one"),
      "/r/1" -> http301(Some("/d/1")), // RELATIVE Location
      "/q/5" -> http301(Some("http://rd.example.org/r/1")), // 2-hop entry
      "/r/2" -> http301(Some("/m/2")), // target NEVER captured
      "/a/3" -> http301(Some("/b/3")), // 2-cycle
      "/b/3" -> http301(Some("/a/3")),
      "/n/4" -> http301(None) // a 3xx with no Location is terminal
    ).map { case (p, payload) =>
      ("response", s"http://rd.example.org$p", "2026-01-01T00:00:00Z",
        WarcIo.recordIdFor("rr:" + p), "application/http; msgtype=response", payload)
    }.toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
    WarcIo.writeWarcWithCdx(rows, root)
    val index = WarcIo.readCdxjCommitted(spark, root)
    def req(paths: String*) = index
      .filter(col("url").isin(paths.map(p => s"http://rd.example.org$p"): _*))
      .select(col("filename"), col("offset"))
    def run(paths: String*) = WarcIo.replayRedirects(req(paths: _*), index, root)
      .collect().map { r =>
        val body = new String(WarcIo.parseHttpResponse(
          r.getAs[Array[Byte]]("payload")).body, UTF_8)
        (r.getAs[Long]("hops"), r.getAs[Boolean]("resolved"), body,
          r.getAs[String]("target_uri"))
      }.toSeq
    // direct (0 hops), one RELATIVE hop, a 2-hop chain — all serve the
    // terminal page's bytes and report their hop counts
    assert(run("/d/1") == Seq((0L, true, "terminal one", "http://rd.example.org/d/1")))
    assert(run("/r/1") == Seq((1L, true, "terminal one", "http://rd.example.org/d/1")))
    assert(run("/q/5") == Seq((2L, true, "terminal one", "http://rd.example.org/d/1")))
    // a Location-less 3xx terminates at its own bytes
    assert(run("/n/4") == Seq((0L, true, "moved", "http://rd.example.org/n/4")))
    // cycles come back resolved=false with a redirect capture's bytes
    val cyc = run("/a/3", "/b/3")
    assert(cyc.length == 2 && cyc.forall(t => !t._2 && t._3 == "moved"), s"got $cyc")
    // a requested chain into an UNCAPTURED target is loud — and the
    // loudness is per-request: the healthy chains above already ran
    // against the same index (which contains the dangling edge)
    val e = intercept[Exception] { run("/r/2") }
    assert(e.toString.contains("no capture of redirect target") ||
      Option(e.getCause).exists(_.toString.contains("no capture of redirect target")))
    // a request whose pointer is NOT in the supplied index must fail
    // loudly too (the stale-snapshot shape) — never silently drop
    val eStale = intercept[Exception] {
      WarcIo.replayRedirects(
        Seq(("zzz-not-there.warc.gz", 0L)).toDF("filename", "offset"),
        index, root).collect()
    }
    assert(eStale.toString.contains("not in the supplied index") ||
      Option(eStale.getCause).exists(_.toString.contains("not in the supplied index")))
  }

  test("replayRedirects: a REVISIT of a 3xx inherits the original's Location") {
    import spark.implicits._
    val root = TempDirs.scratch("cdx_redirrev_")
    def recs(date: String, idp: String) = Seq(
      ("d", WarcIo.buildHttpResponse(200, "OK",
        Seq("Content-Type" -> "text/plain"), "terminal nine".getBytes(UTF_8))),
      ("r", WarcIo.buildHttpResponse(301, "Moved",
        Seq("Content-Type" -> "text/html", "Location" -> "/d/9"),
        "moved".getBytes(UTF_8)))
    ).map { case (p, payload) =>
      ("response", s"http://rv.example.org/$p/9", date,
        WarcIo.recordIdFor(idp + p), "application/http; msgtype=response", payload)
    }.toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
    WarcIo.writeWarcWithCdx(recs("2026-01-01T00:00:00Z", "rv1:"), s"$root/c1", "c1/")
    val prior = WarcIo.readCdxj(spark, s"$root/c1/part-*.cdx.gz")
      .select(col("digest")).distinct()
    // day 2 re-captures BOTH pages unchanged → both land as revisits
    WarcIo.writeWarcWithCdx(
      WarcIo.markRevisits(recs("2026-01-02T00:00:00Z", "rv2:"), prior),
      s"$root/c2", "c2/")
    val index = WarcIo.readCdxj(spark, s"$root/c*/part-*.cdx.gz")
    assert(index.filter(col("mime") === "warc/revisit").count() == 2)
    // request the day-2 REVISIT of the 301: it must follow the
    // original's Location (at the revisit's instant, which resolves to
    // the day-2 /d/9 revisit, whose bytes replay() stitches from day
    // 1) — never dead-end serving the 5-byte redirect body
    val req = index.filter(col("filename").startsWith("c2/") &&
      col("url") === "http://rv.example.org/r/9").select("filename", "offset")
    assert(req.count() == 1)
    val out = WarcIo.replayRedirects(req, index, root).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Boolean]("resolved") && r.getAs[Long]("hops") == 1L,
      s"hops=${r.getAs[Long]("hops")} resolved=${r.getAs[Boolean]("resolved")}")
    assert(new String(WarcIo.parseHttpResponse(
      r.getAs[Array[Byte]]("payload")).body, UTF_8) == "terminal nine")
    assert(r.getAs[Boolean]("replayed"), "the terminal was itself a revisit — " +
      "its bytes must come from the day-1 original via replay()")
  }

  test("resolveNearest: memento semantics — either side, epoch distance, tie to earlier") {
    import spark.implicits._
    // one surt captured three times; the Dec 31 23:59:59 capture is the
    // boundary trap: ts14 NUMERIC distance would mis-rank it against a
    // Jan 2 capture for a Jan 1 00:00:30 request
    val idx = Seq(
      ("org,nr)/p", "20251231235959", "fA.warc.gz", 1L, 10L),
      ("org,nr)/p", "20260102000000", "fB.warc.gz", 2L, 10L),
      ("org,nr)/p", "20260105000000", "fC.warc.gz", 3L, 10L)
    ).toDF("surt", "ts", "filename", "offset", "length")
    def ask(want: String) = graft.sources.CdxIndex.resolveNearest(
      Seq(("org,nr)/p", want)).toDF("surt", "want_ts"), idx)
      .select("ts", "filename").collect().map(r => (r.getString(0), r.getString(1)))
    // 30 s after the boundary capture: epoch distance picks it — a
    // numeric ts14 diff would have picked Jan 2
    assert(ask("20260101000030").head == ("20251231235959", "fA.warc.gz"))
    // before every capture → the forward match
    assert(ask("20251001000000").head == ("20251231235959", "fA.warc.gz"))
    // after every capture → the backward match
    assert(ask("20270101000000").head == ("20260105000000", "fC.warc.gz"))
    // exact midpoint of Jan 2 and Jan 6? use Jan 3 12:00 → 36h/36h? no:
    // Jan 2 00:00 and Jan 5 00:00 midpoint = Jan 3 12:00 — tie goes to
    // the EARLIER capture
    assert(ask("20260103120000").head == ("20260102000000", "fB.warc.gz"))
    // strictly nearer-forward wins
    assert(ask("20260104000000").head == ("20260105000000", "fC.warc.gz"))
    // an unindexed surt resolves to null match columns, not a crash
    val miss = graft.sources.CdxIndex.resolveNearest(
      Seq(("org,zz)/q", "20260101000000")).toDF("surt", "want_ts"), idx).collect()
    assert(miss.length == 1 && miss.head.isNullAt(miss.head.fieldIndex("ts")))
    // equal-(surt, ts) duplicate captures (parallel crawlers) pick
    // DETERMINISTICALLY: the max (filename, offset) tiebreak
    val dup = idx.unionByName(
      Seq(("org,nr)/p", "20260102000000", "fB2.warc.gz", 9L, 10L))
        .toDF("surt", "ts", "filename", "offset", "length"))
    (1 to 3).foreach { _ =>
      val got = graft.sources.CdxIndex.resolveNearest(
        Seq(("org,nr)/p", "20260102000000")).toDF("surt", "want_ts"),
        dup.repartition(7)).select("filename").head.getString(0)
      assert(got == "fB2.warc.gz", s"nondeterministic duplicate pick: $got")
    }
    // same-filename duplicates order NUMERICALLY (zero-padded offset
    // in the tiebreak): offset 10 beats 9, though "9" > "10" as strings
    val dupNum = Seq(
      ("org,nr)/p", "20260102000000", "fZ.warc.gz", 9L, 10L),
      ("org,nr)/p", "20260102000000", "fZ.warc.gz", 10L, 10L))
      .toDF("surt", "ts", "filename", "offset", "length")
    val pick = graft.sources.CdxIndex.resolveNearest(
      Seq(("org,nr)/p", "20260102000000")).toDF("surt", "want_ts"), dupNum)
      .select("offset").head.getLong(0)
    assert(pick == 10L, s"duplicate tiebreak must be numeric on offset: got $pick")
    // a malformed instant is loud, never a silent non-match
    val e = intercept[Exception] {
      graft.sources.CdxIndex.resolveNearest(
        Seq(("org,nr)/p", "not-a-ts")).toDF("surt", "want_ts"), idx).collect()
    }
    assert(e.toString.contains("ts14 instant") ||
      Option(e.getCause).exists(_.toString.contains("ts14 instant")))
  }

  test("resolveNearest: ts14 parses as UTC — a session-tz DST fold cannot flip a pick") {
    import spark.implicits._
    // America/New_York falls back 2026-11-01: local 01:00 is ambiguous
    // (EDT −4 vs EST −5). As UTC instants: A=01:00Z, want=02:20Z,
    // B=04:00Z → A wins (80 < 100 min). A session-zone parse maps A
    // through the EDT offset (05:00Z) but want/B through EST, warping
    // A's distance to 140 min and flipping the pick to B.
    val caps = Seq(
      ("org,ex)/p", "20261101010000", "fA.warc.gz", 0L, 100L),
      ("org,ex)/p", "20261101040000", "fB.warc.gz", 1L, 100L))
      .toDF("surt", "ts", "filename", "offset", "length")
    val reqs = Seq(("org,ex)/p", "20261101022000")).toDF("surt", "want_ts")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val got = graft.sources.CdxIndex.resolveNearest(reqs, caps).collect().head
      assert(got.getAs[String]("filename") == "fA.warc.gz",
        s"session-tz parse warped the time axis: $got")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("resolveNearest: a non-ts14 INDEX ts is loud; a NULL ts drops off the axis") {
    import spark.implicits._
    val reqs = Seq(("org,ex)/p", "20260101000000")).toDF("surt", "want_ts")
    // junk on the capture side must raise — silently nulling it would
    // hand the pick to the other direction
    val junk = Seq(("org,ex)/p", "2026-01-01T00:00:00Z", "f.warc.gz", 0L, 100L))
      .toDF("surt", "ts", "filename", "offset", "length")
    val e = intercept[Exception] {
      graft.sources.CdxIndex.resolveNearest(reqs, junk).collect()
    }
    assert(e.toString.contains("index ts is not a ts14 instant") ||
      Option(e.getCause).exists(_.toString.contains("index ts is not a ts14 instant")))
    // a NULL ts is "not on the time axis": dropped like a null surt
    val got = graft.sources.CdxIndex.resolveNearest(reqs, Seq(
      ("org,ex)/p", null.asInstanceOf[String], "f.warc.gz", 0L, 100L),
      ("org,ex)/p", "20260102000000", "g.warc.gz", 1L, 100L))
      .toDF("surt", "ts", "filename", "offset", "length")).collect().head
    assert(got.getAs[String]("ts") == "20260102000000")
  }

  private def nearestGen(year: Int) = spark.range(200).selectExpr(
    "concat('https://h', id % 10, '.ex.org/p/', id % 50) AS url",
    s"concat('$year', '01', lpad(CAST(1 + id % 25 AS STRING), 2, '0'), '000000') AS ts",
    "concat('f', id, '.warc.gz') AS filename", "id AS offset",
    "CAST(100 AS BIGINT) AS length")
    .withColumn("surt", call_function("graft_surt", col("url")))

  test("resolveNearestAt: equals the raw spine; out-of-window generations never read") {
    val dir = TempDirs.scratch("cdx_nat_")
    // three year-apart generations; requests live inside 2028's window
    Seq(2026, 2027, 2028).foreach(y =>
      CdxIndex.appendEpoch(nearestGen(y), dir, nShards = 4, s"y$y"))
    val reqs = spark.range(80).selectExpr(
      "graft_surt(concat('https://h', id % 10, '.ex.org/p/', id % 50)) AS surt",
      "concat('202801', lpad(CAST(1 + id % 28 AS STRING), 2, '0'), '120000') AS want_ts")
    val (got, wave1, wave2) = CdxIndex.resolveNearestAtPlanned(spark, dir, reqs)
    val brute = CdxIndex.resolveNearest(reqs, CdxIndex.readMaster(spark, dir))
    assert(got.orderBy("surt", "want_ts", "ts").collect().map(_.toSeq).toSeq ==
      brute.orderBy("surt", "want_ts", "ts").collect().map(_.toSeq).toSeq)
    // the pruning pin: every admitted file is 2028's generation; the
    // δ-feedback pass proved 2026/2027 irrelevant without reading them
    assert(wave1.nonEmpty && wave1.forall(_.contains("/gen-00000003/")),
      s"out-of-window generations admitted: $wave1")
    assert(wave2.isEmpty, s"wave 2 re-admitted files needlessly: $wave2")
  }

  test("resolveNearestAt: a key missing from the hot generation re-admits its history") {
    val dir = TempDirs.scratch("cdx_nat2_")
    CdxIndex.appendEpoch(nearestGen(2026), dir, nShards = 4, "y2026")
    // key p/7 is absent from the 2028 generation — its wave-1 δ is ∞,
    // so the second wave must reach back to 2026 for it
    CdxIndex.appendEpoch(
      nearestGen(2028).filter(!col("url").endsWith("/p/7")), dir, nShards = 4, "y2028")
    val reqs = spark.range(50).selectExpr(
      "graft_surt(concat('https://h', id % 10, '.ex.org/p/', id % 50)) AS surt",
      "'20280115120000' AS want_ts")
    val (got, _, wave2) = CdxIndex.resolveNearestAtPlanned(spark, dir, reqs)
    val brute = CdxIndex.resolveNearest(reqs, CdxIndex.readMaster(spark, dir))
    assert(got.orderBy("surt", "ts").collect().map(_.toSeq).toSeq ==
      brute.orderBy("surt", "ts").collect().map(_.toSeq).toSeq)
    assert(wave2.nonEmpty && wave2.forall(_.contains("/gen-00000001/")),
      s"expected a second wave into the 2026 generation: $wave2")
    val p7 = got.filter(col("surt") === graft.functions.UrlOps.surtKey(
      "https://h7.ex.org/p/7")).collect()
    assert(p7.nonEmpty && p7.forall(_.getAs[String]("ts").startsWith("2026")))
  }

  test("resolveNearestAt: pre-ts-window cluster tables stay correct (always admitted)") {
    import spark.implicits._
    val dir = TempDirs.scratch("cdx_nat3_")
    Seq(2026, 2028).foreach(y =>
      CdxIndex.appendEpoch(nearestGen(y), dir, nShards = 4, s"y$y"))
    // strip the ts window from 2026's cluster — the pre-r17 layout
    val cl = s"$dir/gen-00000001/cluster"
    val legacy = spark.read.parquet(cl).drop("ts_lo", "ts_hi").collect()
    val schema = spark.read.parquet(cl).drop("ts_lo", "ts_hi").schema
    spark.createDataFrame(
      spark.sparkContext.parallelize(legacy.toSeq), schema)
      .coalesce(1).write.mode("overwrite").parquet(cl)
    val reqs = spark.range(30).selectExpr(
      "graft_surt(concat('https://h', id % 10, '.ex.org/p/', id % 50)) AS surt",
      "'20280110120000' AS want_ts")
    val (got, wave1, _) = CdxIndex.resolveNearestAtPlanned(spark, dir, reqs)
    val brute = CdxIndex.resolveNearest(reqs, CdxIndex.readMaster(spark, dir))
    assert(got.orderBy("surt", "ts").collect().map(_.toSeq).toSeq ==
      brute.orderBy("surt", "ts").collect().map(_.toSeq).toSeq)
    // no window recorded → conservatively admitted in wave 1
    assert(wave1.exists(_.contains("/gen-00000001/")),
      "windowless legacy files must always admit")
  }

  test("resolveNearestAt works against the LEGACY single-table layout too") {
    val dir = TempDirs.scratch("cdx_nat_legacy_")
    CdxIndex.buildTable(nearestGen(2026), dir, nShards = 4)
    val reqs = spark.range(40).selectExpr(
      "graft_surt(concat('https://h', id % 10, '.ex.org/p/', id % 50)) AS surt",
      "'20260112090000' AS want_ts")
    val got = CdxIndex.resolveNearestAt(spark, dir, reqs)
    val brute = CdxIndex.resolveNearest(reqs, spark.read.parquet(s"$dir/cdx"))
    assert(got.orderBy("surt", "ts").collect().map(_.toSeq).toSeq ==
      brute.orderBy("surt", "ts").collect().map(_.toSeq).toSeq)
  }

  test("lookupPrefixPage: resume-key pages tile the listing exactly; pruned TakeOrdered") {
    import spark.implicits._
    val dir = TempDirs.scratch("cdx_pages_")
    // 30 captures of one host incl. DUPLICATE (surt, ts) runs that a
    // page boundary must split without skipping or repeating; plus
    // sibling-host noise that must never appear
    // day pattern 1,2,1 over the three visits → every url's day-1
    // capture is DUPLICATED at two pointers
    val rows = (0 until 30).map { i =>
      (s"https://pg.ex.org/p/${i % 10}", s"2026010${1 + (i / 10) % 2}000000",
        s"f${i % 2}.warc.gz", i.toLong, 100L, s"d$i")
    } ++ (0 until 20).map { i =>
      (s"https://other.ex.org/p/$i", "20260101000000", "fx.warc.gz",
        100L + i, 100L, s"e$i")
    }
    val cdx = rows.toDF("url", "ts", "filename", "offset", "length", "digest")
      .withColumn("surt", call_function("graft_surt", col("url")))
    CdxIndex.buildTable(cdx, dir, nShards = 3)
    val prefix = "org,ex,pg)"
    val brute = cdx.filter(col("surt").startsWith(prefix))
      .orderBy("surt", "ts", "filename", "offset")
      .select("surt", "ts", "filename", "offset").collect().map(_.toSeq).toSeq
    // walk with a page size that lands boundaries inside duplicate runs
    var resume: Option[(String, String, String, Long)] = None
    val walked = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    var pages = 0
    var done = false
    while (!done) {
      val page = CdxIndex.lookupPrefixPage(spark, dir, prefix, limit = 7, resume)
        .select("surt", "ts", "filename", "offset").collect()
      walked ++= page.map(_.toSeq)
      pages += 1
      if (page.length < 7) done = true
      else resume = Some((page.last.getString(0), page.last.getString(1),
        page.last.getString(2), page.last.getLong(3)))
      assert(pages <= 10, "pagination did not terminate")
    }
    assert(walked.toSeq == brute, "pages must tile the ordered listing exactly")
    assert(pages == 5, s"30 rows at limit 7 = 5 pages (last short), got $pages")
    // each page is a TakeOrdered cut over a PRUNED scan — never a
    // global sort of the listing
    val p = CdxIndex.lookupPrefixPage(spark, dir, prefix, 7, None)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected a top-k cut:\n$p")
    // misuse is loud
    intercept[IllegalArgumentException] {
      CdxIndex.lookupPrefixPage(spark, dir, prefix, 0, None)
    }
    intercept[IllegalArgumentException] {
      CdxIndex.lookupRangePage(spark, dir, "a", "b", 5,
        Some(("zzz", "0", "f", 0L))) // resume key outside the range
    }
  }

  test("lookupPrefixBetween: era bounds prune out-of-window generations' files") {
    val dir = TempDirs.scratch("cdx_tbound_")
    Seq(2026, 2027, 2028).foreach(y =>
      CdxIndex.appendEpoch(nearestGen(y), dir, nShards = 4, s"y$y"))
    val got = CdxIndex.lookupPrefixBetween(spark, dir, "org,ex,h3)", "2027", "2028")
    // answer == the brute time-filtered listing
    val brute = CdxIndex.readMaster(spark, dir)
      .filter(col("surt").startsWith("org,ex,h3)") &&
        col("ts") >= "2027" && col("ts") < "2028")
      .orderBy("surt", "ts", "offset").collect().map(_.toSeq).toSeq
    assert(brute.nonEmpty &&
      got.orderBy("surt", "ts", "offset").collect().map(_.toSeq).toSeq == brute)
    // file-level pin: only the 2027 generation's shards were admitted
    val scanned = got.inputFiles.toSet
    assert(scanned.nonEmpty && scanned.forall(_.contains("/gen-00000002/")),
      s"out-of-era generations read: $scanned")
    // misuse is loud; an empty window of a real master is empty, not a crash
    intercept[IllegalArgumentException] {
      CdxIndex.lookupPrefixBetween(spark, dir, "org,ex,h3)", "2028", "2027")
    }
    assert(CdxIndex.lookupPrefixBetween(spark, dir, "org,ex,h3)", "1999", "2000")
      .count() == 0)
    // the domain spelling: same window over the whole registrable
    // domain = exactly the middle generation's rows, same file prune
    val dom = CdxIndex.lookupDomainBetween(spark, dir, "org,ex", "2027", "2028")
    assert(dom.count() == 200 &&
      dom.inputFiles.toSet.forall(_.contains("/gen-00000002/")))
    intercept[IllegalArgumentException] {
      CdxIndex.lookupDomainBetween(spark, dir, "org,ex,", "2027", "2028")
    }
  }

  test("collapseCaptures: adjacency thinning — month buckets, reversions, null survival") {
    // 3 URLs × 12 captures spread over 4 months, duplicate-heavy
    val cdx = spark.range(36).selectExpr(
      "concat('https://h', id % 3, '.ex.org/') AS url",
      "concat('2026', lpad(CAST(1 + (id DIV 3) % 4 AS STRING), 2, '0'), " +
        "lpad(CAST(1 + id AS STRING), 2, '0'), '000000') AS ts",
      "concat('f', id % 2, '.warc.gz') AS filename", "id AS offset",
      "CAST(100 AS BIGINT) AS length", "concat('d', id % 5) AS digest")
      .withColumn("surt", call_function("graft_surt", col("url")))
    val got = CdxIndex.collapseCaptures(cdx, "ts", 6)
      .orderBy("surt", "ts", "offset").collect().map(_.toSeq).toSeq
    // ts prefixes are monotonic within each key's order, so adjacency
    // collapse == first capture per (surt, month) — the brute form
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("surt"), substring(col("ts"), 1, 6))
      .orderBy(col("ts"), col("filename"), lpad(col("offset").cast("string"), 20, "0"))
    val brute = cdx.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn").orderBy("surt", "ts", "offset").collect().map(_.toSeq).toSeq
    assert(got == brute && got.size == 12)

    // digest collapse is ADJACENCY, not distinct: A→B→A keeps all three
    val rev = spark.createDataFrame(Seq(
      ("org,ex)/", "20260101000000", "https://ex.org/", "f.warc.gz", 0L, 100L, "A"),
      ("org,ex)/", "20260201000000", "https://ex.org/", "f.warc.gz", 1L, 100L, "B"),
      ("org,ex)/", "20260301000000", "https://ex.org/", "f.warc.gz", 2L, 100L, "A"),
      ("org,ex)/", "20260401000000", "https://ex.org/", "f.warc.gz", 3L, 100L, "A")))
      .toDF("surt", "ts", "url", "filename", "offset", "length", "digest")
    assert(CdxIndex.collapseCaptures(rev, "digest", 99)
      .select("digest").orderBy("ts").collect().map(_.getString(0)).toSeq ==
      Seq("A", "B", "A"))
    // null field values never match — unknown digests all survive
    val nulls = rev.withColumn("digest", lit(null).cast("string"))
    assert(CdxIndex.collapseCaptures(nulls, "digest", 99).count() == 4)
    // ... including a null FOLLOWING a non-null (the =!= three-valued
    // trap: "A" =!= null is null, which a bare filter would DROP) and
    // a non-null following a null; digests A, null, A, A keep 0/1/2
    val mixed = rev.withColumn("digest",
      when(col("offset") === 1, lit(null).cast("string")).otherwise(lit("A")))
    assert(CdxIndex.collapseCaptures(mixed, "digest", 99)
      .select("offset").orderBy("ts").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L))
    // misuse is loud
    intercept[IllegalArgumentException] { CdxIndex.collapseCaptures(rev, "nope", 4) }
    intercept[IllegalArgumentException] { CdxIndex.collapseCaptures(rev, "ts", 0) }
  }

  test("latestCaptures/lookupLatest: max per key, pointer tiebreak, fresh generation wins") {
    val dir = TempDirs.scratch("cdx_latest_")
    Seq(2026, 2027).foreach(y =>
      CdxIndex.appendEpoch(nearestGen(y), dir, nShards = 4, s"y$y"))
    val got = CdxIndex.lookupLatest(spark, dir, "org,ex,h3)")
      .select("surt", "ts", "url", "filename", "offset", "length")
      .orderBy("surt").collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("surt"))
      .orderBy(col("ts").desc, col("filename").desc,
        lpad(col("offset").cast("string"), 20, "0").desc)
    val brute = CdxIndex.readMaster(spark, dir)
      .filter(col("surt").startsWith("org,ex,h3)"))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select("surt", "ts", "url", "filename", "offset", "length")
      .orderBy("surt").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == brute)
    // every winner comes from the 2027 generation (every key re-captured)
    assert(got.forall(_(1).toString.startsWith("2027")))
    // a schema without the pointer axis is loud
    intercept[IllegalArgumentException] {
      CdxIndex.latestCaptures(nearestGen(2026).drop("filename"))
    }
    // duplicate-instant tiebreak: offset 10 beats 9 NUMERICALLY
    val dup = spark.createDataFrame(Seq(
      ("org,ex)/", "20260101000000", "https://ex.org/", "d1", "f.warc.gz", 9L, 100L),
      ("org,ex)/", "20260101000000", "https://ex.org/", "d2", "f.warc.gz", 10L, 100L)))
      .toDF("surt", "ts", "url", "digest", "filename", "offset", "length")
    assert(CdxIndex.latestCaptures(dup).select("offset").collect()
      .map(_.getLong(0)).toSeq == Seq(10L))
    // filename-prefix tiebreak: TUPLE order, not separator-string
    // order — "f.warc.gz" outranks "f.warc" at an equal ts (a '|'-glued
    // axis would rank the shorter name above its own extension, making
    // the banner disagree with the final row of the same URI's timeMap)
    val pfx = spark.createDataFrame(Seq(
      ("org,ex)/", "20260101000000", "https://ex.org/", "d1", "f.warc", 99L, 100L),
      ("org,ex)/", "20260101000000", "https://ex.org/", "d2", "f.warc.gz", 1L, 100L)))
      .toDF("surt", "ts", "url", "digest", "filename", "offset", "length")
    assert(CdxIndex.latestCaptures(pfx).select("filename").collect()
      .map(_.getString(0)).toSeq == Seq("f.warc.gz"))
  }

  test("buildTable records per-file ts windows in the cluster rows") {
    val dir = TempDirs.scratch("cdx_tswin_")
    CdxIndex.buildTable(corpus(500), dir, nShards = 4)
    val cl = spark.read.parquet(dir + "/cluster")
    assert(cl.columns.contains("ts_lo") && cl.columns.contains("ts_hi"))
    assert(cl.filter(col("ts_lo").isNull || col("ts_hi") < col("ts_lo")).count() == 0)
  }

  test("timeMap: ascending pages, duplicate-instant tiebreak, exact-key pruning") {
    import spark.implicits._
    val dir = TempDirs.scratch("cdx_tm_")
    // 9 captures of one url (3 instants × 3 duplicate pointers) plus a
    // sibling /p/10 that must not bleed into /p/1's timeline
    val rows = (0 until 9).map { i =>
      ("https://tm.ex.org/p/1", s"2026010${1 + i % 3}000000", s"f${i % 4}.warc.gz",
        i.toLong, 100L, s"d${i % 2}")
    } ++ Seq(("https://tm.ex.org/p/10", "20260101000000", "fx.warc.gz", 99L, 100L, "dx"))
    val cdx = rows.toDF("url", "ts", "filename", "offset", "length", "digest")
      .withColumn("surt", call_function("graft_surt", col("url")))
    CdxIndex.buildTable(cdx, dir, nShards = 2)
    // spelling variant resolves through the same canonicalization
    val got = CdxIndex.timeMap(spark, dir, "https://TM.ex.org/p/1", pageSize = 4)
      .collect().sortBy(_.getAs[Long]("seq"))
    assert(got.length == 9, "sibling /p/10 bled into the timeline")
    assert(got.map(_.getAs[Long]("seq")).toSeq == (0L until 9L).toSeq)
    assert(got.map(_.getAs[Long]("page")).toSeq == Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L, 1L, 2L))
    val order = got.map(r => (r.getAs[String]("ts"), r.getAs[String]("filename"),
      r.getAs[Long]("offset"))).toSeq
    assert(order == order.sorted, s"timeline not in (ts, filename, offset) order: $order")
    intercept[IllegalArgumentException] { CdxIndex.timeMap(spark, dir, "x", 0) }
  }

  test("pruneEpochTags: oldest tags drop first; a pruned tag CAN replay (the horizon)") {
    val dir = TempDirs.scratch("cdx_prune_")
    val cdx = corpus(300)
    Seq("e0", "e1", "e2", "e3").zipWithIndex.foreach { case (t, i) =>
      CdxIndex.appendEpoch(cdx.filter(col("offset") % 4 === i), dir, nShards = 2, t)
    }
    assert(CdxIndex.hasEpoch(spark, dir, "e0"))
    CdxIndex.pruneEpochTags(spark, dir, keepTags = 2)
    assert(!CdxIndex.hasEpoch(spark, dir, "e0") && !CdxIndex.hasEpoch(spark, dir, "e1"))
    assert(CdxIndex.hasEpoch(spark, dir, "e2") && CdxIndex.hasEpoch(spark, dir, "e3"))
    // pruning moves no rows
    assert(CdxIndex.readMaster(spark, dir).count() == 300)
    // the documented hazard: a replay of a PRUNED tag re-appends — the
    // horizon must exceed the delivery mechanism's replay depth
    assert(CdxIndex.appendEpoch(cdx.filter(col("offset") % 4 === 0), dir, nShards = 2, "e0"))
    assert(CdxIndex.readMaster(spark, dir).count() == 375)
    // at or under the bound the pass is a free no-op
    CdxIndex.pruneEpochTags(spark, dir, keepTags = 10)
    assert(CdxIndex.hasEpoch(spark, dir, "e2") && CdxIndex.hasEpoch(spark, dir, "e0"))
  }

  test("pruneEpochTags prunes by DELIVERY order even after a fold re-homes old tags") {
    // a size-tiered fold moves the OLDEST tags onto the NEWEST
    // generation at the END of the manifest — pruning by flatten order
    // would then drop the newest delivery's tag (exactly the one a
    // crash-replay probes next) and double-count its epoch on replay
    val dir = TempDirs.scratch("cdx_prunefold_")
    val cdx = corpus(400)
    Seq("e0", "e1", "e2", "e3").zipWithIndex.foreach { case (t, i) =>
      CdxIndex.appendEpoch(cdx.filter(col("offset") % 4 === i), dir, nShards = 2, t)
    }
    // folds the three smallest (equal-sized → oldest-listed) gens; the
    // folded output carries e0..e2 and lands AFTER e3's generation
    CdxIndex.compact(spark, dir, nShards = 2, maxGens = 2)
    CdxIndex.pruneEpochTags(spark, dir, keepTags = 2)
    assert(CdxIndex.hasEpoch(spark, dir, "e2") && CdxIndex.hasEpoch(spark, dir, "e3"),
      "the two NEWEST deliveries must survive the prune")
    assert(!CdxIndex.hasEpoch(spark, dir, "e0") && !CdxIndex.hasEpoch(spark, dir, "e1"))
    // the replay the horizon promises to absorb still no-ops
    assert(!CdxIndex.appendEpoch(cdx.filter(col("offset") % 4 === 3), dir, nShards = 2, "e3"))
    assert(CdxIndex.readMaster(spark, dir).count() == 400)
  }

  test("epochMetrics on a master with no applied epoch is empty, not a crash") {
    val dir = TempDirs.scratch("cdx_nomet_")
    val met = CdxIndex.epochMetrics(spark, dir)
    assert(met.count() == 0)
    assert(met.columns.toSeq == Seq("epoch", "rows", "gens_before", "gens_after",
      "gens_folded", "archive_bytes", "wall_ms"))
    // compacting a metrics-less master is a no-op, not a crash
    CdxIndex.compactEpochMetrics(spark, dir)
  }

  test("compactEpochMetrics folds the per-epoch part files; rows identical") {
    import spark.implicits._
    val dir = TempDirs.scratch("cdx_metfold_")
    def row(e: Int) = Seq((s"epoch-$e", 5L, 1, 1, 0, 100L, 1L))
      .toDF("epoch", "rows", "gens_before", "gens_after", "gens_folded",
        "archive_bytes", "wall_ms")
    (0 until 5).foreach(e =>
      row(e).coalesce(1).write.mode("append").parquet(s"$dir/_metrics"))
    def partCount = new java.io.File(s"$dir/_metrics").list()
      .count(_.endsWith(".parquet"))
    assert(partCount == 5)
    CdxIndex.compactEpochMetrics(spark, dir, minFiles = 8) // under threshold: no-op
    assert(partCount == 5)
    CdxIndex.compactEpochMetrics(spark, dir, minFiles = 2)
    assert(partCount == 1, s"expected one folded part, got $partCount")
    val met = CdxIndex.epochMetrics(spark, dir).orderBy("epoch").collect()
    assert(met.map(_.getAs[String]("epoch")).toSeq == (0 until 5).map(e => s"epoch-$e"))
    assert(met.forall(_.getAs[Long]("rows") == 5L))
    // the writer lease released
    assert(!new java.io.File(s"$dir/_writer.lock").exists())
  }

  test("compactEpochMetrics: crash windows duplicate, never lose; legacy parked recovers") {
    import spark.implicits._
    val dir = TempDirs.scratch("cdx_metcrash_")
    def row(e: Int) = Seq((s"epoch-$e", 5L, 1, 1, 0, 100L, 1L))
      .toDF("epoch", "rows", "gens_before", "gens_after", "gens_folded",
        "archive_bytes", "wall_ms")
    (0 until 4).foreach(e =>
      row(e).coalesce(1).write.mode("append").parquet(s"$dir/_metrics"))
    val live = new java.io.File(s"$dir/_metrics")
    // 1) mid-fold crash: the compacted part was moved in BESIDE the
    //    sources, which were not yet deleted — rows exist twice on
    //    disk; the read dedupes on epoch and the next fold converges
    CdxIndex.epochMetrics(spark, dir).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_metrics__staging")
    val part = new java.io.File(s"$dir/_metrics__staging").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      new java.io.File(live, "part-folded-crash.parquet").toPath)
    assert(CdxIndex.epochMetrics(spark, dir).count() == 4)
    CdxIndex.compactEpochMetrics(spark, dir, minFiles = 1)
    assert(live.list().count(_.endsWith(".parquet")) == 1)
    assert(CdxIndex.epochMetrics(spark, dir).orderBy("epoch").collect()
      .map(_.getString(0)).toSeq == (0 until 4).map(e => s"epoch-$e"))
    // 2) legacy parked crash (an older build's swap died between park
    //    and promote): live gone, history parked — the read still sees
    //    it, a post-crash sink APPEND beside it loses nothing, and the
    //    next fold merges both and clears the parked tree
    val parked = new java.io.File(s"$dir/_metrics__parked")
    assert(live.renameTo(parked))
    assert(CdxIndex.epochMetrics(spark, dir).count() == 4)
    row(9).coalesce(1).write.mode("append").parquet(s"$dir/_metrics")
    assert(CdxIndex.epochMetrics(spark, dir).count() == 5)
    CdxIndex.compactEpochMetrics(spark, dir, minFiles = 1)
    assert(!parked.exists())
    assert(CdxIndex.epochMetrics(spark, dir).orderBy("epoch").collect()
      .map(_.getString(0)).toSeq ==
      ((0 until 4).map(e => s"epoch-$e") :+ "epoch-9"))
    assert(!new java.io.File(s"$dir/_writer.lock").exists())
  }

  test("changeStats: single capture is rate 0.0, not 0/0; merge conserves rows") {
    import spark.implicits._
    val mk = (url: String, ts: String, dg: String) =>
      (UrlOps.surtKey(url), ts, url, "text/html", 200, dg, 100L, 0L, "f.warc.gz")
    val crawl1 = Seq(
      mk("https://a.org/only-once", "20260101000000", "d1"),
      mk("https://a.org/stable", "20260101000000", "s1")).toDF(
      "surt", "ts", "url", "mime", "status", "digest", "length", "offset", "filename")
    val crawl2 = Seq(
      mk("https://a.org/stable", "20260102000000", "s1")).toDF(
      "surt", "ts", "url", "mime", "status", "digest", "length", "offset", "filename")
    val (d1, d2, m) = (TempDirs.scratch("cdx_cs1_"), TempDirs.scratch("cdx_cs2_"),
      TempDirs.scratch("cdx_csm_"))
    CdxIndex.buildTable(crawl1, d1, 2)
    CdxIndex.buildTable(crawl2, d2, 2)
    CdxIndex.mergeTables(spark, Seq(d1, d2), m, 2)
    val merged = spark.read.parquet(m + "/cdx")
    assert(merged.count() == 3)
    val stats = CdxIndex.changeStats(merged).collect()
      .map(r => r.getAs[String]("surt") ->
        (r.getAs[Long]("n_captures"), r.getAs[Double]("change_rate"))).toMap
    assert(stats("org,a)/only-once") == ((1L, 0.0)))
    assert(stats("org,a)/stable") == ((2L, 0.0)))
    // a NULL digest counts as a capture but never as a version (an
    // unknown hash is not evidence of change), and a garbage ts fails
    // loudly instead of nulling the span
    val withNull = merged.unionByName(
      Seq((UrlOps.surtKey("https://a.org/stable"), "20260103000000",
        "https://a.org/stable", "text/html", 200, null.asInstanceOf[String],
        100L, 0L, "f.warc.gz")).toDF(
        "surt", "ts", "url", "mime", "status", "digest", "length", "offset", "filename"))
    val st = CdxIndex.changeStats(withNull)
      .filter(col("surt") === "org,a)/stable").collect().head
    assert(st.getAs[Long]("n_captures") == 3L && st.getAs[Long]("n_versions") == 1L &&
      st.getAs[Double]("change_rate") == 0.0)
    val bad = merged.withColumn("ts",
      when(col("url") === "https://a.org/only-once", lit("2026-01-01T00:00:00Z"))
        .otherwise(col("ts")))
    val e = intercept[Exception] { // SparkRuntimeException from raise_error
      CdxIndex.changeStats(bad).collect()
    }
    assert(e.toString.contains("ts14") || e.getCause != null)
  }

  test("buildTable rebuild is staged: no residue, lookups stay correct, names relative") {
    val dir = TempDirs.scratch("cdx_swap_") + "/table"
    CdxIndex.buildTable(corpus(500), dir, nShards = 4)
    val before = CdxIndex.lookupPrefix(spark, dir, "org,site3,h17)").count()
    // rebuild over the live table (the compaction path): staged swap,
    // not delete-then-write
    CdxIndex.buildTable(corpus(1000), dir, nShards = 4)
    assert(CdxIndex.lookupPrefix(spark, dir, "org,site3,h17)").count() >= before)
    val root = java.nio.file.Paths.get(dir).getParent
    val listing = java.nio.file.Files.list(root)
    val names =
      try {
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        listing.iterator().forEachRemaining(p => b += p.getFileName.toString)
        b
      } finally listing.close()
    assert(names.toSet == Set("table"), s"staging/parked residue left: $names")
    // cluster rows carry basenames — the table survives relocation
    val moved = root.resolve("moved").toString
    assert(new java.io.File(dir).renameTo(new java.io.File(moved)))
    assert(CdxIndex.lookupPrefix(spark, moved, "org,site3,h17)").count() >= before)
  }

  test("LSM master: append spans generations, answers equal the single-table build") {
    val dir = TempDirs.scratch("cdx_lsm_")
    val cdx = corpus(3000)
    CdxIndex.initMaster(cdx.filter(col("offset") < 1000), dir, nShards = 6)
    CdxIndex.appendCrawl(cdx.filter(col("offset") >= 1000 && col("offset") < 2000),
      dir, nShards = 6)
    CdxIndex.appendCrawl(cdx.filter(col("offset") >= 2000), dir, nShards = 6)
    // three live generations
    assert(new java.io.File(dir).list().count(_.matches("gen-\\d{8}")) == 3)
    val prefix = "org,site3,h17)"
    val got = CdxIndex.lookupPrefix(spark, dir, prefix)
    val brute = cdx.filter(col("surt").startsWith(prefix))
      .orderBy("surt", "ts").collect().map(_.toSeq).toSeq
    assert(got.orderBy("surt", "ts").collect().map(_.toSeq).toSeq == brute && brute.nonEmpty)
    // still ONE scan, still pruned: a strict subset of all shard files
    val scans = got.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    assert(scans.length == 1)
    val allFiles = CdxIndex.readMaster(spark, dir).inputFiles.toSet
    val scanned = got.inputFiles.toSet
    assert(scanned.subsetOf(allFiles) && scanned.size < allFiles.size)
    // readMaster sees every row once
    assert(CdxIndex.readMaster(spark, dir).count() == 3000)
    // lookupUrl / lookupDomain resolve through the same generational path
    assert(CdxIndex.lookupUrl(spark, dir, "https://h17.site3.org/p/17").count() == 1)
  }

  test("LSM master: compact folds generations; vacuum keeps pinned readers alive") {
    val dir = TempDirs.scratch("cdx_lsm2_")
    val cdx = corpus(1200)
    CdxIndex.initMaster(cdx.filter(col("offset") < 600), dir, nShards = 4)
    CdxIndex.appendCrawl(cdx.filter(col("offset") >= 600), dir, nShards = 4)
    // PIN a lookup before the rebuild: the manifest (and the concrete
    // shard files) resolve NOW, at construction
    val pinned = CdxIndex.lookupPrefix(spark, dir, "org,site3,h17)")
    val expected = cdx.filter(col("surt").startsWith("org,site3,h17)"))
      .orderBy("surt", "ts").collect().map(_.toSeq).toSeq
    CdxIndex.compact(spark, dir, nShards = 4)
    CdxIndex.vacuum(spark, dir) // keeps the previous manifest's gens
    // the pinned lookup completes with the OLD generations' (correct)
    // answer — availability across rebuilds, not a loud failure
    assert(pinned.orderBy("surt", "ts").collect().map(_.toSeq).toSeq == expected)
    // a fresh lookup resolves the compacted single generation and agrees
    val fresh = CdxIndex.lookupPrefix(spark, dir, "org,site3,h17)")
    assert(fresh.orderBy("surt", "ts").collect().map(_.toSeq).toSeq == expected)
    assert(new java.io.File(dir).list().count(_.matches("gen-\\d{8}")) == 3)
    // one more cycle: append + vacuum — the pre-compaction gens age out
    CdxIndex.appendCrawl(cdx.limit(0), dir, nShards = 4)
    CdxIndex.vacuum(spark, dir)
    val gens = new java.io.File(dir).list().filter(_.matches("gen-\\d{8}")).sorted
    assert(gens.length == 2, s"expected the 2 newest-manifest gens, got ${gens.toSeq}")
    assert(CdxIndex.readMaster(spark, dir).count() == 1200)
    // single-writer discipline: no lock residue after the mutators
    assert(!new java.io.File(dir, "_writer.lock").exists())
  }

  test("LSM master: size-tiered compact folds only the smallest generations") {
    val dir = TempDirs.scratch("cdx_tier_")
    val cdx = corpus(3000)
    // one BIG base crawl + three small appends
    CdxIndex.initMaster(cdx.filter(col("offset") < 2400), dir, nShards = 6)
    CdxIndex.appendCrawl(cdx.filter(col("offset") >= 2400 && col("offset") < 2600),
      dir, nShards = 2)
    CdxIndex.appendCrawl(cdx.filter(col("offset") >= 2600 && col("offset") < 2800),
      dir, nShards = 2)
    CdxIndex.appendCrawl(cdx.filter(col("offset") >= 2800), dir, nShards = 2)
    val baseDir = new java.io.File(dir, "gen-00000001/cdx")
    val baseBefore = baseDir.listFiles().map(f => (f.getName, f.lastModified, f.length)).sorted.toSeq
    val manifestsBefore = new java.io.File(dir).list().count(_.matches("manifest-\\d{8}"))
    // fold down to 2 generations: the three small appends merge, the
    // big base generation's bytes are NEVER read or rewritten
    CdxIndex.compact(spark, dir, nShards = 4, maxGens = 2)
    assert(baseDir.listFiles().map(f => (f.getName, f.lastModified, f.length)).sorted.toSeq
      == baseBefore, "the base generation must ride through a tiered pass untouched")
    CdxIndex.vacuum(spark, dir, keepManifests = 1)
    val gens = new java.io.File(dir).list().filter(_.matches("gen-\\d{8}")).sorted
    assert(gens.length == 2 && gens.head == "gen-00000001",
      s"expected base + one folded generation, got ${gens.toSeq}")
    // answers unchanged: every row exactly once, lookups identical to brute
    assert(CdxIndex.readMaster(spark, dir).count() == 3000)
    val prefix = "org,site3,h17)"
    assert(CdxIndex.lookupPrefix(spark, dir, prefix)
      .orderBy("surt", "ts").collect().map(_.toSeq).toSeq ==
      cdx.filter(col("surt").startsWith(prefix))
        .orderBy("surt", "ts").collect().map(_.toSeq).toSeq)
    // at or under maxGens the pass is a FREE no-op: no manifest republish
    val manifestsAfter = new java.io.File(dir).list().count(_.matches("manifest-\\d{8}"))
    CdxIndex.compact(spark, dir, nShards = 4, maxGens = 2)
    assert(new java.io.File(dir).list().count(_.matches("manifest-\\d{8}")) == manifestsAfter)
    assert(manifestsAfter <= manifestsBefore + 1) // tiered pass published exactly one
  }

  test("appendEpoch: a replayed epoch no-ops; tags survive both compaction shapes") {
    val dir = TempDirs.scratch("cdx_epoch_")
    val cdx = corpus(900)
    // the first epoch CREATES the master (one code path for the stream)
    assert(CdxIndex.appendEpoch(cdx.filter(col("offset") < 300), dir, 4, "epoch-0"))
    assert(CdxIndex.appendEpoch(
      cdx.filter(col("offset") >= 300 && col("offset") < 600), dir, 4, "epoch-1"))
    // the foreachBatch crash-replay: the SAME epoch delivered again is
    // a no-op — the master holds its captures exactly once
    assert(!CdxIndex.appendEpoch(
      cdx.filter(col("offset") >= 300 && col("offset") < 600), dir, 4, "epoch-1"))
    assert(CdxIndex.readMaster(spark, dir).count() == 600)
    assert(CdxIndex.appendEpoch(cdx.filter(col("offset") >= 600), dir, 4, "epoch-2"))
    // tags ride the FULL compaction onto the folded generation: a very
    // late replay of a long-compacted epoch still no-ops
    CdxIndex.compact(spark, dir, nShards = 4)
    assert(!CdxIndex.appendEpoch(cdx.filter(col("offset") < 300), dir, 4, "epoch-0"))
    assert(CdxIndex.readMaster(spark, dir).count() == 900)
    // and the SIZE-TIERED shape folds tags the same way
    assert(CdxIndex.appendEpoch(cdx.filter(col("offset") < 50), dir, 2, "epoch-3"))
    assert(CdxIndex.appendEpoch(cdx.filter(col("offset") < 10), dir, 2, "epoch-4"))
    CdxIndex.compact(spark, dir, nShards = 4, maxGens = 2)
    assert(!CdxIndex.appendEpoch(cdx.filter(col("offset") < 50), dir, 2, "epoch-3"))
    assert(!CdxIndex.appendEpoch(cdx.filter(col("offset") < 10), dir, 2, "epoch-4"))
    assert(CdxIndex.readMaster(spark, dir).count() == 960)
    // a tag that could corrupt the manifest line is refused up front
    intercept[IllegalArgumentException] {
      CdxIndex.appendEpoch(cdx.limit(1), dir, 2, "bad tag")
    }
    // untagged appendCrawl still interleaves freely with epochs
    CdxIndex.appendCrawl(cdx.filter(col("offset") < 5), dir, nShards = 2)
    assert(CdxIndex.readMaster(spark, dir).count() == 965)
  }

  test("lookupBatch: a non-deterministic keys frame answers consistently (keys pinned)") {
    val dir = TempDirs.scratch("cdx_batchnd_")
    // three captures of EVERY surt, one per generation — a keys plan
    // that desynced between the shard-discovery pass and the semi join
    // would return PARTIAL capture sets for some keys
    def crawl(g: Int) = corpus(1200).withColumn("ts", lpad(lit(g.toString), 14, "0"))
    CdxIndex.initMaster(crawl(1), dir, nShards = 8)
    CdxIndex.appendCrawl(crawl(2), dir, nShards = 8)
    CdxIndex.appendCrawl(crawl(3), dir, nShards = 8)
    val keys = corpus(1200).select("surt").filter(rand() < 0.3)
    val got = CdxIndex.lookupBatch(spark, dir, keys)
      .groupBy("surt").count().collect()
    assert(got.nonEmpty && got.length < 1200)
    assert(got.forall(_.getLong(1) == 3),
      s"partial capture sets — the keys plan desynced between the two passes: " +
        got.filter(_.getLong(1) != 3).take(5).mkString(", "))
  }

  test("refreshFromArchive: compaction + refresh serve byte-identical content") {
    import spark.implicits._
    val dir = TempDirs.scratch("cdx_refr_")
    val rows = spark.range(30).map { i =>
      ("response", s"http://rx.example.org/p/$i", "2026-01-01T00:00:00Z",
        WarcIo.recordIdFor(s"rfx:$i"), "application/http; msgtype=response",
        WarcIo.buildHttpResponse(200, "OK", Seq("Content-Type" -> "text/plain"),
          (s"refresh body $i " * (1 + (i % 3).toInt)).getBytes(UTF_8)))
    }.toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
      .repartition(8)
    WarcIo.writeWarcWithCdx(rows, dir)
    val master = TempDirs.scratch("cdx_refrm_")
    // master created by the STREAMING path so the refresh must carry
    // the epoch tag forward
    assert(CdxIndex.appendEpoch(WarcIo.readCdxjCommitted(spark, dir), master,
      4, "epoch-0"))
    def viaMaster() = WarcIo.fetchByCdx(
      CdxIndex.lookupPrefix(spark, master, "org,example,rx)"), dir)
      .select("target_uri", "payload").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val before = viaMaster()
    assert(before.size == 30)
    val pinned = CdxIndex.lookupPrefix(spark, master, "org,example,rx)")
    val total = WarcIo.committedFiles(spark, dir, ".warc.gz")
      .map(p => new java.io.File(new java.net.URI(p)).length).sum
    WarcIo.compactArchives(spark, dir, targetBytes = total / 2 + 1)
    CdxIndex.refreshFromArchive(spark, dir, master, nShards = 4)
    // post-refresh lookups fetch byte-exactly what the old master served
    assert(viaMaster() == before)
    // the pinned pre-refresh lookup still answers with correct INDEX
    // rows (generation availability)...
    assert(pinned.select("surt", "ts", "digest").collect().map(_.toSeq).toSet ==
      CdxIndex.lookupPrefix(spark, master, "org,example,rx)")
        .select("surt", "ts", "digest").collect().map(_.toSeq).toSet)
    // ...and its STALE pointers can only fail loudly at fetch time
    // (manifest gate / framing), never serve silently wrong bytes
    val staleFetch = scala.util.Try(
      WarcIo.fetchByCdx(pinned, dir).select("target_uri", "payload").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap)
    staleFetch match {
      case scala.util.Success(m) => assert(m == before) // only if every window survived
      case scala.util.Failure(_) => () // loud is the contract
    }
    // the refresh carried the epoch ledger: a late replay still no-ops
    assert(!CdxIndex.appendEpoch(WarcIo.readCdxjCommitted(spark, dir), master,
      4, "epoch-0"))
    // refresh against a never-initialized master is loud
    intercept[IllegalStateException] {
      CdxIndex.refreshFromArchive(spark, dir, TempDirs.scratch("cdx_refrx_"), 2)
    }
  }

  test("LSM master: initMaster refuses an existing index; appendCrawl needs one") {
    val dir = TempDirs.scratch("cdx_lsm3_")
    intercept[IllegalStateException] {
      CdxIndex.appendCrawl(corpus(10), dir, nShards = 2)
    }
    CdxIndex.initMaster(corpus(10), dir, nShards = 2)
    intercept[IllegalArgumentException] {
      CdxIndex.initMaster(corpus(10), dir, nShards = 2)
    }
    // legacy single-table dirs are likewise not re-initializable
    val legacy = TempDirs.scratch("cdx_lsm4_")
    CdxIndex.buildTable(corpus(10), legacy, nShards = 2)
    intercept[IllegalArgumentException] {
      CdxIndex.initMaster(corpus(10), legacy, nShards = 2)
    }
  }

  test("generational DIGEST master: incremental appends, pruned lookup, key pinning") {
    import spark.implicits._
    val dir = TempDirs.scratch("cdx_digm_")
    val cdx = corpus(2000)
      // plant one content across BOTH crawls (ids ≡ 5 mod 500)
      .withColumn("digest",
        when(col("offset") % 500 === 5, lit("sha1:CROSSGEN")).otherwise(col("digest")))
    CdxIndex.initMaster(cdx.filter(col("offset") < 1000), dir, nShards = 4,
      sortCols = CdxIndex.DigestKey)
    CdxIndex.appendCrawl(cdx.filter(col("offset") >= 1000), dir, nShards = 4,
      sortCols = CdxIndex.DigestKey)
    // the capture set spans generations; the scan is pruned
    val got = CdxIndex.lookupDigest(spark, dir, "sha1:CROSSGEN")
    assert(got.count() == 4) // ids 5, 505, 1005, 1505
    assert(got.select("offset").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(5L, 505L, 1005L, 1505L))
    val allFiles = CdxIndex.readMaster(spark, dir).inputFiles.toSet
    assert(got.inputFiles.toSet.subsetOf(allFiles) &&
      got.inputFiles.length < allFiles.size)
    // appending with the DEFAULT (surt) key against a digest-keyed
    // master fails loudly — mixed-key generations would silently break
    // cluster pruning
    val e = intercept[IllegalArgumentException] {
      CdxIndex.appendCrawl(cdx.limit(10), dir, nShards = 4)
    }
    assert(e.getMessage.contains("keyed on"))
    // and so does a surt-keyed LOOKUP against it: pruning surt strings
    // against digest cluster bounds would silently miss rows
    val e2 = intercept[IllegalArgumentException] {
      CdxIndex.lookupPrefix(spark, dir, "org,site1,h8)")
    }
    assert(e2.getMessage.contains("wrong bounds"))
    val e3 = intercept[IllegalArgumentException] {
      CdxIndex.lookupBatch(spark, dir, cdx.select("surt").limit(5))
    }
    assert(e3.getMessage.contains("wrong bounds"))
    // compact folds generations preserving the digest key
    CdxIndex.compact(spark, dir, nShards = 4)
    assert(CdxIndex.lookupDigest(spark, dir, "sha1:CROSSGEN").count() == 4)
    // BATCH digest sweep: a request set (the planted hash twice + a
    // miss) returns the full capture set once — and keys the pruning
    // on the digest bounds, which the primary-keyed batch cannot
    val sweep = CdxIndex.lookupDigestBatch(spark, dir,
      Seq("sha1:CROSSGEN", "sha1:CROSSGEN", "sha1:NEVERSEEN").toDF("digest"))
    assert(sweep.count() == 4)
    assert(sweep.select("offset").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(5L, 505L, 1005L, 1505L))
    val e4 = intercept[IllegalArgumentException] {
      CdxIndex.lookupDigestBatch(spark, TempDirs.scratch("cdx_digm2_") + "/none",
        Seq("x").toDF("digest"))
    }
    // (missing dir fails on resolveGens' layout check — loud, not empty)
    assert(e4.getMessage.contains("neither a manifest"))
  }

  test("refreshFromArchives: a multi-dir collection master republishes from EVERY dir") {
    import spark.implicits._
    val root = TempDirs.scratch("cdx_refrmulti_")
    def epoch(e: Int): Unit = {
      val rows = spark.range(12).map { i =>
        ("response", s"http://mc.example.org/e$e/$i", "2026-01-01T00:00:00Z",
          WarcIo.recordIdFor(s"mc$e:$i"), "application/http; msgtype=response",
          WarcIo.buildHttpResponse(200, "OK", Seq("Content-Type" -> "text/plain"),
            s"collection body $e-$i".getBytes(UTF_8)))
      }.toDF("rec_type", "target_uri", "warc_date", "record_id", "content_type", "payload")
        .repartition(4)
      WarcIo.writeWarcWithCdx(rows, s"$root/warc/epoch-$e", s"epoch-$e/")
    }
    epoch(0); epoch(1)
    val master = s"$root/master"
    CdxIndex.appendEpoch(WarcIo.readCdxjCommitted(spark, s"$root/warc/epoch-0"),
      master, 4, "epoch-0")
    CdxIndex.appendEpoch(WarcIo.readCdxjCommitted(spark, s"$root/warc/epoch-1"),
      master, 4, "epoch-1")
    def fetchAll() = WarcIo.fetchByCdx(CdxIndex.readMaster(spark, master), s"$root/warc")
      .select("target_uri", "payload").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val before = fetchAll()
    assert(before.size == 24)
    // compact ONLY epoch-0's parts; the refresh must still cover BOTH
    // dirs or the master silently shrinks to the refreshed one
    WarcIo.compactArchives(spark, s"$root/warc/epoch-0", targetBytes = Long.MaxValue)
    CdxIndex.refreshFromArchives(spark,
      Seq(s"$root/warc/epoch-0", s"$root/warc/epoch-1"), master, 4)
    assert(CdxIndex.readMaster(spark, master).count() == 24)
    assert(fetchAll() == before)
    // the rebuilt pointers kept their collection-relative prefixes
    assert(CdxIndex.readMaster(spark, master).select("filename").collect()
      .forall(_.getString(0).matches("epoch-[01]/part-.*\\.warc\\.gz")))
    // the epoch ledger survived the refresh
    assert(!CdxIndex.appendEpoch(WarcIo.readCdxjCommitted(spark, s"$root/warc/epoch-1"),
      master, 4, "epoch-1"))
  }

  test("lookupBatch: pruned request-set lookup; index side never broadcasts") {
    import spark.implicits._
    val dir = TempDirs.scratch("cdx_batch_")
    val cdx = corpus(3000)
    CdxIndex.initMaster(cdx.filter(col("offset") < 1500), dir, nShards = 8)
    CdxIndex.appendCrawl(cdx.filter(col("offset") >= 1500), dir, nShards = 8)
    // requests: one host's pages + duplicates + definite misses
    val keys = ((0 until 3000 by 7).map(i => s"https://h${i % 40}.site${i % 7}.org/p/$i")
      ++ Seq("https://h8.site1.org/p/8", "https://h8.site1.org/p/8", // dup
        "https://nowhere.example/x", "https://h1.site1.org/p/99999")) // misses
      .toDF("url").selectExpr("graft_surt(url) AS surt")
    val got = CdxIndex.lookupBatch(spark, dir, keys)
    // exactly the present keys' rows, once each (semi-join semantics)
    val expect = cdx.filter(col("offset") % 7 === 0 || col("offset") === 8)
      .select("surt").collect().map(_.getString(0)).toSet
    val gotKeys = got.select("surt").collect().map(_.getString(0))
    assert(gotKeys.length == gotKeys.distinct.length, "duplicate output rows")
    assert(gotKeys.toSet == expect)
    // plan shape: the returned plan holds NO broadcast at all (the
    // cluster consult collects eagerly inside lookupBatch, before this
    // plan) — the index↔keys semi join must be shuffle-hash, never a
    // broadcast of either large side
    val phys = got.queryExecution.executedPlan.toString
    assert(phys.contains("LeftSemi"), s"expected a semi join:\n$phys")
    assert(!phys.contains("BroadcastHashJoin") &&
      !phys.contains("BroadcastNestedLoopJoin") &&
      !phys.contains("BroadcastExchange"),
      s"the index/keys join must not broadcast either large side:\n$phys")
    val allFiles = CdxIndex.readMaster(spark, dir).inputFiles.toSet
    assert(got.inputFiles.toSet.subsetOf(allFiles))
  }

  test("digest reverse index: exact-key capture set, pruned, nulls excluded") {
    import spark.implicits._
    val dir = TempDirs.scratch("cdx_dig_")
    val base = corpus(2000)
    // plant: ids ≡ 3 (mod 400) share one content; one row with a NULL
    // digest (external CDX rows carry them) must not enter the index
    val planted = base
      .withColumn("digest",
        when(col("offset") % 400 === 3, lit("sha1:SAMECONTENT"))
          .when(col("offset") === 7, lit(null).cast("string"))
          .otherwise(col("digest")))
    CdxIndex.buildDigestIndex(planted, dir, nShards = 6)
    val got = CdxIndex.lookupDigest(spark, dir, "sha1:SAMECONTENT")
    assert(got.count() == 5) // 3, 403, 803, 1203, 1603
    assert(got.select("url").collect().map(_.getString(0)).sorted.toSeq ==
      Seq(3L, 403L, 803L, 1203L, 1603L)
        .map(i => s"https://h${i % 40}.site${i % 7}.org/p/$i").sorted)
    // pruned: the lookup touches a strict subset of shard files
    val allFiles = spark.read.parquet(dir + "/cdx").inputFiles.toSet
    val scanned = got.inputFiles.toSet
    assert(scanned.nonEmpty && scanned.subsetOf(allFiles) && scanned.size < allFiles.size)
    // the null-digest row is not in the index at all
    assert(spark.read.parquet(dir + "/cdx").filter(col("digest").isNull).count() == 0)
    // exact key: a digest that PREFIXES another must not bleed into it
    val dir2 = TempDirs.scratch("cdx_dig3_")
    CdxIndex.buildDigestIndex(
      base.withColumn("digest",
        when(col("offset") === 1, lit("sha1:AB"))
          .when(col("offset") === 2, lit("sha1:ABC")).otherwise(col("digest"))),
      dir2, nShards = 2)
    assert(CdxIndex.lookupDigest(spark, dir2, "sha1:AB").count() == 1)
  }

  test("lookupDomain: one cluster pass, one pruned scan — not three") {
    val dir = TempDirs.scratch("cdx_dom1_")
    CdxIndex.buildTable(corpus(2000), dir, nShards = 8)
    val dom = CdxIndex.lookupDomain(spark, dir, "org,site5")
    // the three SURT ranges resolve through ONE union of pruned files:
    // the plan holds exactly one parquet scan (the old per-range
    // spelling unioned three), and it still prunes
    val scans = dom.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1, s"expected one pruned scan, got ${scans.length}")
    val allFiles = spark.read.parquet(dir + "/cdx").inputFiles.toSet
    assert(dom.inputFiles.toSet.subsetOf(allFiles))
    assert(dom.count() == 2000 / 7 + (if (2000 % 7 > 5) 1 else 0))
  }

  test("readCdxj: a present-but-non-numeric pointer field fails loudly, never nulls") {
    val dir = TempDirs.scratch("cdx_badj_")
    val good = """org,ok)/a 20260101000000 {"url":"http://ok.org/a","offset":"12","length":"34","filename":"f.warc.gz"}"""
    val bad = """org,bad)/b 20260101000000 {"url":"http://bad.org/b","offset":"12kb","length":"34","filename":"f.warc.gz"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "x.cdx"),
      (good + "\n" + bad + "\n").getBytes(UTF_8))
    val e = intercept[Exception] {
      WarcIo.readCdxj(spark, dir + "/*.cdx").collect()
    }
    assert(e.toString.contains("non-numeric") ||
      Option(e.getCause).exists(_.toString.contains("non-numeric")))
    // absent fields still null quietly (warcinfo-free CDXJ variants
    // legitimately omit status); only present-but-garbage is loud
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "x.cdx"),
      (good + "\n").getBytes(UTF_8))
    val row = WarcIo.readCdxj(spark, dir + "/*.cdx").collect().head
    assert(row.isNullAt(row.fieldIndex("status")) && row.getAs[Long]("offset") == 12L)
  }

  test("toColumnar: url_path survives the original URL's scheme/host spelling") {
    import spark.implicits._
    val cdx = Seq(("HTTP://Host.Example.ORG/Deep/Path?q=1", "org,example,host)/deep/path?q=1"))
      .toDF("url", "surt")
      .selectExpr("surt", "'20260101000000' AS ts", "url", "'text/html' AS mime",
        "CAST(200 AS INT) AS status", "'d' AS digest", "CAST(10 AS BIGINT) AS length",
        "CAST(0 AS BIGINT) AS offset", "'f.warc.gz' AS filename")
    val r = CdxIndex.toColumnar(cdx).collect().head
    // external CDX rows keep the original spelling — an anchored
    // lowercase scheme regex would silently yield an empty path
    assert(r.getAs[String]("url_path") == "/Deep/Path")
  }

  test("toColumnar: cc-index-table columns derive from url + surt") {
    val one = CdxIndex.toColumnar(corpus(50)).filter(col("url").endsWith("/p/17")).collect()
    assert(one.length == 1)
    val r = one.head
    assert(r.getAs[String]("url_host_name") == "h17.site3.org")
    assert(r.getAs[String]("url_host_tld") == "org")
    assert(r.getAs[String]("url_host_registered_domain") == "site3.org")
    assert(r.getAs[String]("url_path") == "/p/17")
    assert(r.getAs[String]("url_surtkey").startsWith("org,site3,h17)"))
    assert(r.getAs[Int]("fetch_status") == 200)
  }
}
