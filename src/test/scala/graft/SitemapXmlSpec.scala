package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SitemapXml

/** Sitemap-protocol XML: urlset/sitemapindex parsing, reference
  * decoding, optional fields, and leniency on malformed input.
  */
class SitemapXmlSpec extends AnyFunSuite {

  test("urlset: loc/lastmod/changefreq/priority; &amp; decoded") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://ex.org/p?a=1&amp;b=2</loc>
        |    <lastmod>2026-01-03</lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc>https://ex.org/q</loc></url>
        |</urlset>""".stripMargin
    val sm = SitemapXml.parse(xml)
    assert(sm.kind == "urlset" && sm.entries.length == 2)
    val e = sm.entries.head
    assert(e.loc == "https://ex.org/p?a=1&b=2")
    assert(e.lastmod == "2026-01-03" && e.changefreq == "daily")
    assert(e.priorityTenths.contains(8))
    assert(sm.entries(1) == SitemapXml.Entry("https://ex.org/q", "", "", None))
  }

  test("sitemapindex: child sitemap pointers") {
    val xml = "<sitemapindex><sitemap><loc>https://ex.org/s1.xml.gz</loc>" +
      "<lastmod>2026-02-01</lastmod></sitemap>" +
      "<sitemap><loc>https://ex.org/s2.xml.gz</loc></sitemap></sitemapindex>"
    val sm = SitemapXml.parse(xml)
    assert(sm.kind == "sitemapindex")
    assert(sm.entries.map(_.loc) ==
      Vector("https://ex.org/s1.xml.gz", "https://ex.org/s2.xml.gz"))
  }

  test("lenient: missing loc skipped, junk ignored, bad priority dropped, never throws") {
    val sm = SitemapXml.parse(
      "<urlset><url><lastmod>2026</lastmod></url>" + // no loc → skipped
        "<url><loc>https://a.org/x</loc><priority>9.5</priority></url>" + // out of range
        "<url><loc>https://a.org/y</loc><priority>zz</priority></url>" +
        "<unknown>stuff</unknown><url><loc></loc></url>")  // unterminated urlset
    assert(sm.entries.map(_.loc) == Vector("https://a.org/x", "https://a.org/y"))
    assert(sm.entries.forall(_.priorityTenths.isEmpty))
    assert(SitemapXml.parse("").kind == "")
    assert(SitemapXml.parse("not xml at all & <<<").entries.isEmpty)
    // <urlsetX> is not <urlset>
    assert(SitemapXml.parse("<urlsetX><url><loc>h</loc></url></urlsetX>").kind == "")
  }

  test("numeric references decode; surrogate refs → U+FFFD (shared policy)") {
    val sm = SitemapXml.parse(
      "<urlset><url><loc>https://ex.org/&#65;&#x42;</loc></url></urlset>")
    assert(sm.entries.head.loc == "https://ex.org/AB")
    // same substitution HtmlExtract applies — one decoder, one policy
    val s2 = SitemapXml.parse(
      "<urlset><url><loc>https://ex.org/&#xD800;</loc></url></urlset>")
    assert(s2.entries.head.loc == "https://ex.org/�")
  }
}
