package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{Punycode, RobotsTxt}
import graft.operators.text.HtmlExtract
import graft.sources.{SitemapXml, WarcIo}

/** Property-based fuzz for the crawl-ingestion parsers, each checked
  * against an INDEPENDENT reference implementation or a round-trip
  * law — the failure modes here (a wildcard matcher off by one octet,
  * a container field that doesn't survive re-parse) corrupt corpora
  * silently, so hand-picked examples aren't enough.
  */
class CrawlPropertySpec extends AnyFunSuite {

  private def holds(label: String, n: Int = 400)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  // ---- robots wildcard matcher vs a java.util.regex reference ----

  private def refMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val rx = pat.split("\\*", -1)
      .map(p => if (p.isEmpty) "" else java.util.regex.Pattern.quote(p))
      .mkString("(?s:.*)")
    val m = java.util.regex.Pattern.compile(rx).matcher(path)
    if (anchored) m.matches() else m.lookingAt()
  }

  private val pathChar = Gen.oneOf('/', 'a', 'b', 'c', '.', '?', '=', '%')
  private val patChar = Gen.oneOf('/', 'a', 'b', 'c', '.', '*', '?')
  private val pathGen = Gen.chooseNum(0, 14).flatMap(n => Gen.stringOfN(n, pathChar))
  private val patGen = for {
    n <- Gen.chooseNum(0, 10)
    body <- Gen.stringOfN(n, patChar)
    anchor <- Gen.oneOf("", "$")
  } yield body + anchor

  test("RobotsTxt.matches ≡ regex reference (wildcards, anchors, repeats)") {
    holds("matches", n = 2000) {
      Prop.forAll(patGen, pathGen) { (pat, path) =>
        RobotsTxt.matches(pat, path) == refMatches(pat, path)
      }
    }
  }

  // ---- WARC container round-trip on arbitrary records ----

  private val headerText: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(('!' to '~') ++ Seq('é', '中'))))
  private val recordGen: Gen[WarcIo.WarcRecord] = for {
    tpe <- Gen.oneOf("response", "request", "metadata", "conversion")
    uri <- headerText
    ct <- Gen.oneOf("", "text/plain", "application/http; msgtype=response")
    nExtra <- Gen.chooseNum(0, 3)
    // indexed keys: case-insensitively distinct by construction (the
    // parser matches header names case-insensitively)
    extra <- Gen.listOfN(nExtra, headerText)
      .map(_.zipWithIndex.map { case (v, ix) => (s"X-H$ix", v) }.toMap)
    payload <- Gen.chooseNum(0, 4000).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    seed <- Gen.alphaStr
  } yield WarcIo.WarcRecord(tpe, uri, "2026-01-01T00:00:00Z",
    WarcIo.recordIdFor("prop:" + seed), ct, extra, payload)

  test("writeGz → readAll is the identity on arbitrary records") {
    holds("warc round-trip", n = 150) {
      Prop.forAll(Gen.chooseNum(1, 5).flatMap(Gen.listOfN(_, recordGen))) { recs =>
        val back = WarcIo.readAll(WarcIo.writeGz(recs))
        back.length == recs.length && recs.zip(back).forall { case (a, b) =>
          a.recordType == b.recordType && a.targetUri == b.targetUri &&
            a.recordId == b.recordId && a.contentType == b.contentType &&
            a.extra.map { case (k, v) => (k.toLowerCase, v) } ==
              b.extra.map { case (k, v) => (k.toLowerCase, v) } &&
            java.util.Arrays.equals(a.payload, b.payload)
        }
      }
    }
  }

  // ---- sitemap render → parse round-trip ----

  private def escXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val locGen: Gen[String] = for {
    host <- Gen.chooseNum(1, 6).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
    path <- Gen.chooseNum(0, 10).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(('a' to 'z') ++ Seq('/', '&', '?', '='))))
  } yield s"https://$host.org/$path"

  test("sitemap urlset render → parse recovers every entry") {
    val entryGen = for {
      loc <- locGen
      lastmod <- Gen.oneOf("", "2026-01-02", "2025-12-31T23:59:59Z")
      freq <- Gen.oneOf("", "daily", "weekly", "monthly")
      pri <- Gen.option(Gen.chooseNum(0, 10))
    } yield SitemapXml.Entry(loc, lastmod, freq, pri)
    holds("sitemap round-trip", n = 200) {
      Prop.forAll(Gen.chooseNum(1, 6).flatMap(Gen.listOfN(_, entryGen))) { entries =>
        val xml = "<urlset>" + entries.map { e =>
          "<url><loc>" + escXml(e.loc) + "</loc>" +
            (if (e.lastmod.nonEmpty) s"<lastmod>${e.lastmod}</lastmod>" else "") +
            (if (e.changefreq.nonEmpty) s"<changefreq>${e.changefreq}</changefreq>" else "") +
            e.priorityTenths.map(t => s"<priority>${t / 10}.${t % 10}</priority>").getOrElse("") +
            "</url>"
        }.mkString + "</urlset>"
        SitemapXml.parse(xml).entries == entries.toVector
      }
    }
  }

  // ---- normalizeSpace vs the regex the oracles use ----

  test("normalizeSpace ≡ trim(regexp_replace([ \\t\\n\\f\\r]+, ' ')) incl. U+000B") {
    val sGen = Gen.chooseNum(0, 30).flatMap(n => Gen.stringOfN(n,
      Gen.oneOf('a', 'b', ' ', '\t', '\n', '\f', '\r', '\u000b', '中', '€')))
    holds("normalizeSpace", n = 1000) {
      Prop.forAll(sGen) { s =>
        HtmlExtract.normalizeSpace(s) ==
          s.replaceAll("[ \t\n\f\r]+", " ").replaceAll("^ | $", "")
      }
    }
  }

  // ---- punycode round-trip on arbitrary valid code points ----

  test("punycode decode(encode(x)) == x on arbitrary non-surrogate labels") {
    val cpGen = Gen.frequency(
      6 -> Gen.chooseNum(0x20, 0x7e),        // basic
      5 -> Gen.chooseNum(0xa0, 0x2fff),      // BMP
      2 -> Gen.chooseNum(0x10000, 0x1f9ff))  // supplementary
    val labelGen = Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, cpGen).map(cps => new String(cps.toArray, 0, cps.length)))
    holds("punycode round-trip", n = 1000) {
      Prop.forAll(labelGen) { label =>
        Punycode.decode(Punycode.encode(label)) == label
      }
    }
  }

  // ---- HTML extraction never throws on arbitrary tag soup ----

  test("blocks/links/headSignals never throw on arbitrary tag soup") {
    val soupGen = Gen.chooseNum(0, 60).flatMap(n => Gen.stringOfN(n,
      Gen.oneOf('<', '>', '/', 'a', 'p', '&', '#', ';', '"', '\'', '=',
        ' ', '\n', '!', '-', 'x', '中')))
    holds("tag soup", n = 2000) {
      Prop.forAll(soupGen) { s =>
        HtmlExtract.blocks(s)
        HtmlExtract.links(s)
        HtmlExtract.headSignals(s)
        HtmlExtract.extractText(s).getBytes(UTF_8) // well-formed UTF-16 out
        true
      }
    }
  }
}
