package graft.sources

/** Sitemap-protocol XML parsing (sitemaps.org, referenced by RFC 9309
  * `Sitemap:` lines) — the frontier-seeding input of a crawl: a
  * `<urlset>` lists page URLs with optional freshness hints, a
  * `<sitemapindex>` lists child sitemaps. Together with
  * [[graft.functions.RobotsTxt]] (which collects the `Sitemap:`
  * pointers) this closes the discovery loop: robots → sitemaps →
  * frontier URLs → fetch → WARC.
  *
  * A deliberately small, lenient XML reader — sitemaps in the wild
  * are machine-generated but still frequently malformed, and the
  * sitemap spec's element set is tiny and flat. Entries missing a
  * `<loc>` are skipped; unknown elements are ignored; character
  * references in text (`&amp;` etc., numeric forms) are decoded.
  * Never throws on malformed input (a crawler that dies on one bad
  * sitemap seeds nothing).
  */
object SitemapXml extends Serializable {

  /** One `<url>` (kind=urlset) or `<sitemap>` (kind=sitemapindex)
    * entry. `priorityTenths` is the 0.0–1.0 priority scaled by 10
    * (exact integer — sitemap priorities have one decimal by spec).
    */
  final case class Entry(loc: String, lastmod: String, changefreq: String,
      priorityTenths: Option[Int])

  final case class Sitemap(kind: String, entries: Vector[Entry])

  // XML's five predefined entities + numeric forms, via the shared
  // decoder so the surrogate/overflow policy matches HtmlExtract's
  private def decodeRefs(s: String): String =
    graft.functions.CharRefs.decode(s, graft.functions.CharRefs.xmlEntities)

  /** Index just past `<name...>`, or -1. Matches `<name>` and
    * `<name attr=...>`, not `<namelonger>`.
    */
  private def openTag(xml: String, name: String, from: Int): Int = {
    var i = from
    while (i >= 0) {
      i = xml.indexOf("<" + name, i)
      if (i < 0) return -1
      val after = i + 1 + name.length
      if (after < xml.length && (xml.charAt(after) == '>' || Character.isWhitespace(xml.charAt(after)))) {
        val gt = xml.indexOf('>', after)
        return if (gt < 0) -1 else gt + 1
      }
      i = after
    }
    -1
  }

  /** Text of the first `<name>…</name>` inside [from, until), trimmed
    * and reference-decoded; "" when absent or malformed.
    */
  private def childText(xml: String, name: String, from: Int, until: Int): String = {
    val s = openTag(xml, name, from)
    if (s < 0 || s >= until) return ""
    val e = xml.indexOf("</" + name + ">", s)
    if (e < 0 || e > until) return ""
    decodeRefs(xml.substring(s, e).trim)
  }

  /** Parse a sitemap document. `kind` is `"urlset"`, `"sitemapindex"`,
    * or `""` when neither root is present (entries empty).
    */
  def parse(xml: String): Sitemap = {
    val (kind, itemTag) =
      if (openTag(xml, "urlset", 0) >= 0) ("urlset", "url")
      else if (openTag(xml, "sitemapindex", 0) >= 0) ("sitemapindex", "sitemap")
      else return Sitemap("", Vector.empty)
    val entries = Vector.newBuilder[Entry]
    var pos = openTag(xml, kind, 0)
    var itemStart = openTag(xml, itemTag, pos)
    while (itemStart >= 0) {
      val itemEnd = xml.indexOf("</" + itemTag + ">", itemStart)
      val until = if (itemEnd < 0) xml.length else itemEnd
      val loc = childText(xml, "loc", itemStart, until)
      if (loc.nonEmpty) {
        val pri = childText(xml, "priority", itemStart, until).toDoubleOption
          .filter(p => p >= 0.0 && p <= 1.0)
          .map(p => math.round(p * 10).toInt)
        entries += Entry(loc,
          childText(xml, "lastmod", itemStart, until),
          childText(xml, "changefreq", itemStart, until), pri)
      }
      pos = if (itemEnd < 0) xml.length else itemEnd + itemTag.length + 3
      itemStart = openTag(xml, itemTag, pos)
    }
    Sitemap(kind, entries.result())
  }
}
