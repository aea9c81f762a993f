package graft

import graft.operators.text.HtmlExtract

/** HTML tokenizer + block extraction: entity decoding, raw-text
  * elements, boilerplate classification, link extraction, and the
  * DataFrame plumbing.
  */
class HtmlExtractSpec extends SparkSpec {

  test("entity decoding: named, decimal, hex, supplementary, malformed") {
    assert(HtmlExtract.decodeEntities("a &amp; b &lt;c&gt;") == "a & b <c>")
    assert(HtmlExtract.decodeEntities("&#65;&#x42;") == "AB")
    assert(HtmlExtract.decodeEntities("&#x1F600;") == new String(Character.toChars(0x1F600)))
    // unknown/malformed pass through verbatim
    assert(HtmlExtract.decodeEntities("AT&T &fake; &#xZZ; & plain") == "AT&T &fake; &#xZZ; & plain")
    assert(HtmlExtract.decodeEntities("&nbsp;") == " ")
  }

  test("script/style emit no text; comments and doctype are skipped") {
    val html = """<!DOCTYPE html><html><head><style>p { color: red }</style>
      |<script>var s = "<p>fake</p>";</script></head>
      |<body><!-- hidden --><p>real text here</p></body></html>""".stripMargin
    assert(HtmlExtract.extractText(html) == "real text here")
  }

  test("block segmentation with normalized whitespace and nesting") {
    val html = "<div><h1>Title  Here</h1><p>one\n two</p><ul><li>a</li><li>b</li></ul></div>"
    val bs = HtmlExtract.blocks(html)
    assert(bs.map(_.text) == Vector("Title Here", "one two", "a", "b"))
    assert(bs.map(_.tag) == Vector("h1", "p", "li", "li"))
  }

  test("U+000B is NOT HTML whitespace: survives normalization verbatim") {
    val bs = HtmlExtract.blocks("<p>ab   c</p>")
    assert(bs.head.text == "ab c")
  }

  test("boilerplate containers mark their blocks; content() drops them") {
    val html = "<body><nav><a href='/h'>home</a> <a href='/a'>about</a></nav>" +
      "<p>this is a long enough real paragraph of body content</p>" +
      "<footer><a href='/c'>contact</a> legal notice</footer></body>"
    val bs = HtmlExtract.blocks(html)
    assert(bs.count(_.boiler) == 2) // nav + footer
    val kept = HtmlExtract.content(html, minChars = 25, maxLinkDensity = 0.33)
    assert(kept.map(_.text) == Vector("this is a long enough real paragraph of body content"))
  }

  test("link-dense non-boilerplate blocks are dropped by density") {
    val html = "<div><a href='/1'>click here for more related article links</a> ok</div>" +
      "<p>a genuinely long paragraph of prose without any anchors at all</p>"
    val kept = HtmlExtract.content(html, minChars = 25, maxLinkDensity = 0.33)
    assert(kept.map(_.text) ==
      Vector("a genuinely long paragraph of prose without any anchors at all"))
    // and the dropped block's density really was high
    val dense = HtmlExtract.blocks(html).head
    assert(dense.linkDensity > 0.8)
  }

  test("nChars counts code points, not UTF-16 units") {
    val emoji = new String(Character.toChars(0x1F600))
    val b = HtmlExtract.blocks(s"<p>$emoji$emoji x</p>").head
    assert(b.nChars == 4) // 2 emoji + space + x
  }

  test("links: quote styles, bare values, entities in href, implicit close") {
    val html = """<a href="/a">first</a><a href='/b?x=1&amp;y=2'>second link</a>
      |<a href=/bare>bare<a href="/next">implicit</a>""".stripMargin
    val ls = HtmlExtract.links(html)
    assert(ls == Vector(
      ("/a", "first"), ("/b?x=1&y=2", "second link"),
      ("/bare", "bare"), ("/next", "implicit")))
  }

  test("title extraction and br handling") {
    assert(HtmlExtract.title("<head><title>My  Page</title></head><p>x</p>")
      .contains("My Page"))
    assert(HtmlExtract.blocks("<p>line one<br>line two</p>").head.text == "line one line two")
  }

  test("uppercase tags, self-closing, stray '<', unterminated structures") {
    assert(HtmlExtract.extractText("<P>UPPER</P>") == "UPPER")
    assert(HtmlExtract.extractText("<p>a <br/> b</p>") == "a b")
    assert(HtmlExtract.extractText("<p>2 < 3 ok</p>") == "2 < 3 ok")
    // unterminated comment / tag swallow to EOF without throwing
    assert(HtmlExtract.extractText("<p>keep</p><!-- open") == "keep")
    assert(HtmlExtract.extractText("<p>keep</p><div attr") == "keep")
    // unterminated script swallows to EOF
    assert(HtmlExtract.extractText("<p>keep</p><script>var x = 1;") == "keep")
  }

  test("Latin-1 / symbol / Greek entities decode to text (r12 widening)") {
    assert(HtmlExtract.decodeEntities("caf&eacute; r&eacute;sum&eacute;") == "café résumé")
    assert(HtmlExtract.decodeEntities("&Auml;&ouml;&uuml;&szlig;") == "Äöüß")
    assert(HtmlExtract.decodeEntities("&ntilde;&ccedil;&iquest;") == "ñç¿")
    assert(HtmlExtract.decodeEntities("&euro;42 &trade; &bull; &ldquo;q&rdquo;") ==
      "€42 ™ • “q”")
    assert(HtmlExtract.decodeEntities("&alpha;&beta;&Omega;&pi;") == "αβΩπ")
    assert(HtmlExtract.decodeEntities("&frac12; + &frac14; &ne; &infin;") ==
      "½ + ¼ ≠ ∞")
    // still-unknown names pass through verbatim
    assert(HtmlExtract.decodeEntities("&notareal;") == "&notareal;")
  }

  test("numeric references in the surrogate block decode to U+FFFD") {
    assert(HtmlExtract.decodeEntities("&#xD800;") == "�")
    assert(HtmlExtract.decodeEntities("a&#xDFFF;b") == "a�b")
    assert(HtmlExtract.decodeEntities("&#55296;") == "�") // decimal D800
    // result is well-formed UTF-16: round-trips through UTF-8 unchanged
    val s = HtmlExtract.decodeEntities("x&#xDABC;y")
    assert(new String(s.getBytes("UTF-8"), "UTF-8") == s)
    // out-of-range still passes through verbatim
    assert(HtmlExtract.decodeEntities("&#x110000;") == "&#x110000;")
  }

  test("an unclosed <a> does not poison later blocks' link density") {
    // crawl HTML: anchor never closed; the next block must NOT count as link text
    val html = "<div><a href='/x'>menu link</a></div>" +
      "<div><a href='/y'>unclosed" +
      "<p>a real paragraph of body prose long enough to keep for training</p>" +
      "<p>another real paragraph with plenty of ordinary prose in it too</p>"
    val bs = HtmlExtract.blocks(html)
    val paras = bs.filter(_.tag == "p")
    assert(paras.length == 2)
    assert(paras.forall(_.linkChars == 0))
    val kept = HtmlExtract.content(html, minChars = 25, maxLinkDensity = 0.33)
    assert(kept.map(_.tag) == Vector("p", "p"))
    // and a new <a> implicitly closes the previous one within a block
    val b = HtmlExtract.blocks("<p><a href='/1'>one<a href='/2'>two</a> tail</p>").head
    assert(b.text == "onetwo tail")
    assert(b.linkChars == 6) // "one" + "two", not the tail
  }

  test("metaTags / canonicalUrl / htmlLang read the head section") {
    val html = """<html lang="en-GB"><head><title>T</title>
      |<meta name="description" content="a &amp; b">
      |<meta property="og:title" content="OG title">
      |<meta name="keywords">
      |<meta content="orphan content">
      |<link rel="stylesheet" href="/s.css">
      |<link rel="canonical" href="https://ex.org/page?id=1">
      |</head><body><p>x</p></body></html>""".stripMargin
    assert(HtmlExtract.metaTags(html) == Vector(
      "description" -> "a & b", "og:title" -> "OG title"))
    assert(HtmlExtract.canonicalUrl(html).contains("https://ex.org/page?id=1"))
    assert(HtmlExtract.htmlLang(html).contains("en-GB"))
    assert(HtmlExtract.canonicalUrl("<p>none</p>").isEmpty)
    assert(HtmlExtract.htmlLang("<html><p>no lang</p>").isEmpty)
  }

  test("contentBlocksDf + linksDf explode per document") {
    import spark.implicits._
    val df = Seq(
      (1L, "<nav><a href='/x'>x</a></nav><p>first long paragraph with enough characters</p>"),
      (2L, "<p>second long paragraph also with enough characters</p><a href='/only'>tiny</a>"))
      .toDF("doc_id", "html")
    val blocks = HtmlExtract.contentBlocksDf(df, "doc_id", "html").collect()
    assert(blocks.map(_.getAs[String]("text")).toSet ==
      Set("first long paragraph with enough characters",
        "second long paragraph also with enough characters"))
    val links = HtmlExtract.linksDf(df, "doc_id", "html").collect()
    assert(links.map(r => (r.getLong(0), r.getAs[String]("href"))).toSet ==
      Set((1L, "/x"), (2L, "/only")))
  }
}
