package graft.operators.text

import scala.collection.mutable.{ArrayBuffer, StringBuilder => MutSB}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** HTML main-content extraction for crawl→training-data pipelines: a
  * from-scratch single-pass tokenizer, block segmentation, and
  * link-density boilerplate classification (the jusText/trafilatura
  * family of heuristics, re-expressed deterministically).
  *
  * Pipeline position: WARC `response` records (WarcIo) → this → language
  * ID / quality gates (TextAnalysis) → dedup. The whole path is per-row
  * executor work — no shuffle is introduced here; at 100 TB the operator
  * scales linearly with input partitions.
  *
  * Tokenizer facts it gets right (each one is a real-corpus failure mode
  * when skipped): comments (`<!-- -->`), doctype/processing
  * instructions, raw-text elements (`script`/`style` content emits NO
  * text), case-insensitive tag names, both attribute quote styles plus
  * bare values, void/self-closing elements, named + decimal + hex
  * character references incl. supplementary code points, and stray `<`
  * recovered as text.
  *
  * Block model: text accumulates into the nearest enclosing BLOCK-level
  * element; any block-level open or close flushes. Whitespace inside a
  * block is normalized with the HTML space set (space, tab, LF, FF, CR —
  * deliberately NOT U+000B, which is an ordinary character to HTML).
  * Each block carries its code-point length, the code points contributed
  * under an `<a>` ancestor (→ link density), and whether it sits inside
  * boilerplate containers (`nav`/`header`/`footer`/`aside`/`title`).
  * `content()` keeps blocks that are non-boilerplate, long enough, and
  * link-sparse — the classification jusText calls "good".
  */
object HtmlExtract extends Serializable {

  /** One segmented text block. `nChars`/`linkChars` count Unicode code
    * points of the normalized text (UTF-16-unit counts would misgrade
    * emoji-heavy crawl text).
    */
  final case class Block(blockIx: Int, tag: String, text: String,
      nChars: Int, linkChars: Int, boiler: Boolean) {
    def linkDensity: Double = if (nChars == 0) 0.0 else linkChars.toDouble / nChars
  }

  private val blockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol", "dl",
    "dt", "dd", "table", "thead", "tbody", "tr", "td", "th", "blockquote",
    "pre", "article", "section", "header", "footer", "nav", "aside", "main",
    "figure", "figcaption", "title", "form", "hr", "body", "html", "head")

  private val boilerTags = Set("nav", "header", "footer", "aside", "title")

  private val rawTextTags = Set("script", "style")

  private val voidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…")

  /** Decode character references: named (core set), `&#NNN;`, `&#xHH;`.
    * Unknown or malformed references pass through verbatim (browser
    * behavior; crawl text is full of bare ampersands).
    */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new MutSB(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 12) { out.append('&'); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try {
                val cp = Integer.parseInt(body.substring(2), 16)
                if (Character.isValidCodePoint(cp)) Some(new String(Character.toChars(cp))) else None
              } catch { case _: NumberFormatException => None }
            else if (body.startsWith("#"))
              try {
                val cp = Integer.parseInt(body.substring(1))
                if (Character.isValidCodePoint(cp)) Some(new String(Character.toChars(cp))) else None
              } catch { case _: NumberFormatException => None }
            else namedEntities.get(body)
          decoded match {
            case Some(d) => out.append(d); i = semi + 1
            case None => out.append('&'); i += 1
          }
        }
      }
    }
    out.toString
  }

  // ------------------------------------------------------------ tokenizer

  private sealed trait Tok
  private final case class StartTag(name: String, attrs: List[(String, String)],
      selfClosing: Boolean) extends Tok
  private final case class EndTag(name: String) extends Tok
  private final case class TextTok(raw: String) extends Tok

  private def isHtmlSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  private def tokenize(html: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { toks += TextTok(html.substring(i)); i = n }
      else {
        if (lt > i) toks += TextTok(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val end = html.indexOf('>', lt + 1)
          i = if (end < 0) n else end + 1
        } else if (lt + 1 < n && html.charAt(lt + 1) == '/') {
          var j = lt + 2
          while (j < n && html.charAt(j) != '>') j += 1
          val name = html.substring(lt + 2, math.min(j, n)).trim.toLowerCase
          if (name.nonEmpty) toks += EndTag(name)
          i = if (j < n) j + 1 else n
        } else if (lt + 1 < n && Character.isLetter(html.charAt(lt + 1))) {
          val (tok, after) = parseStartTag(html, lt)
          toks += tok
          i = after
          if (rawTextTags(tok.name) && !tok.selfClosing) {
            // raw-text: consume to the matching close tag, emit no text
            val close = indexOfIgnoreCase(html, "</" + tok.name, i)
            if (close < 0) i = n
            else {
              val gt = html.indexOf('>', close)
              toks += EndTag(tok.name)
              i = if (gt < 0) n else gt + 1
            }
          }
        } else { // stray '<'
          toks += TextTok("<")
          i = lt + 1
        }
      }
    }
    toks.result()
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    var i = math.max(0, from)
    val limit = hay.length - needle.length
    while (i <= limit) {
      if (hay.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  private def parseStartTag(html: String, lt: Int): (StartTag, Int) = {
    val n = html.length
    var i = lt + 1
    val nameStart = i
    while (i < n && (Character.isLetterOrDigit(html.charAt(i)) || html.charAt(i) == '-')) i += 1
    val name = html.substring(nameStart, i).toLowerCase
    val attrs = List.newBuilder[(String, String)]
    var selfClosing = false
    var done = false
    while (!done && i < n) {
      while (i < n && isHtmlSpace(html.charAt(i))) i += 1
      if (i >= n) done = true
      else html.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && html.charAt(i + 1) == '>') { selfClosing = true; i += 2; done = true }
          else i += 1
        case _ =>
          val as = i
          while (i < n && !isHtmlSpace(html.charAt(i)) &&
            html.charAt(i) != '=' && html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
          val aname = html.substring(as, i).toLowerCase
          while (i < n && isHtmlSpace(html.charAt(i))) i += 1
          var avalue = ""
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && isHtmlSpace(html.charAt(i))) i += 1
            if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
              val q = html.charAt(i); i += 1
              val vs = i
              while (i < n && html.charAt(i) != q) i += 1
              avalue = html.substring(vs, math.min(i, n))
              if (i < n) i += 1
            } else {
              val vs = i
              while (i < n && !isHtmlSpace(html.charAt(i)) && html.charAt(i) != '>') i += 1
              avalue = html.substring(vs, i)
            }
          }
          if (aname.nonEmpty) attrs += ((aname, decodeEntities(avalue)))
      }
    }
    (StartTag(name, attrs.result(), selfClosing || voidTags(name)), i)
  }

  // --------------------------------------------------------------- blocks

  /** Collapse HTML whitespace runs to single spaces and trim. */
  def normalizeSpace(s: String): String = {
    val out = new MutSB(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isHtmlSpace(c)) pendingSpace = out.nonEmpty
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** Segment `html` into normalized text blocks (see class doc). */
  def blocks(html: String): Vector[Block] = {
    val out = ArrayBuffer.empty[Block]
    val text = new MutSB
    val linkText = new MutSB
    var blockTag = "body"
    var firstTextBoiler = false
    var sawText = false
    var aDepth = 0
    var boilerDepth = 0
    val tagStack = ArrayBuffer.empty[String]

    def flush(): Unit = {
      val t = normalizeSpace(text.toString)
      if (t.nonEmpty) {
        val lk = normalizeSpace(linkText.toString)
        out += Block(out.length, blockTag, t,
          t.codePointCount(0, t.length), lk.codePointCount(0, lk.length), firstTextBoiler)
      }
      text.clear(); linkText.clear(); sawText = false; firstTextBoiler = false
    }

    tokenize(html).foreach {
      case TextTok(raw) =>
        val dec = decodeEntities(raw)
        if (dec.exists(c => !isHtmlSpace(c)) && !sawText) {
          sawText = true; firstTextBoiler = boilerDepth > 0
        }
        text.append(dec)
        if (aDepth > 0) linkText.append(dec)
      case StartTag(name, _, selfClosing) =>
        if (name == "br") { text.append('\n'); if (aDepth > 0) linkText.append('\n') }
        else if (blockTags(name)) {
          flush()
          if (!selfClosing) {
            tagStack += name
            blockTag = name
            if (boilerTags(name)) boilerDepth += 1
          }
        } else if (name == "a" && !selfClosing) aDepth += 1
      case EndTag(name) =>
        if (blockTags(name)) {
          flush()
          val ix = tagStack.lastIndexOf(name)
          if (ix >= 0) {
            // close this element and anything left open inside it
            var j = tagStack.length - 1
            while (j >= ix) {
              if (boilerTags(tagStack(j))) boilerDepth -= 1
              tagStack.remove(j); j -= 1
            }
          }
          blockTag = if (tagStack.nonEmpty) tagStack.last else "body"
        } else if (name == "a" && aDepth > 0) aDepth -= 1
    }
    flush()
    out.toVector
  }

  /** All visible text (boilerplate included), blocks joined by `\n`. */
  def extractText(html: String): String = blocks(html).map(_.text).mkString("\n")

  /** Main-content blocks: non-boilerplate, at least `minChars` code
    * points, link density at most `maxLinkDensity`.
    */
  def content(html: String, minChars: Int = 25, maxLinkDensity: Double = 0.33): Vector[Block] =
    blocks(html).filter(b => !b.boiler && b.nChars >= minChars && b.linkDensity <= maxLinkDensity)

  /** `(href, normalized anchor text)` for every `<a href=…>` in document
    * order. Nested block tags inside the anchor do not end it; a new
    * `<a>` implicitly closes the previous one (browser behavior).
    */
  def links(html: String): Vector[(String, String)] = {
    val out = ArrayBuffer.empty[(String, String)]
    var href: Option[String] = None
    val anchor = new MutSB
    def close(): Unit = {
      href.foreach(h => out += ((h, normalizeSpace(anchor.toString))))
      href = None; anchor.clear()
    }
    tokenize(html).foreach {
      case StartTag("a", attrs, selfClosing) =>
        close()
        if (!selfClosing) href = attrs.find(_._1 == "href").map(_._2)
      case EndTag("a") => close()
      case TextTok(raw) if href.isDefined => anchor.append(decodeEntities(raw))
      case _ => ()
    }
    close()
    out.toVector
  }

  /** First `<title>` text, if any. */
  def title(html: String): Option[String] =
    blocks(html).find(_.tag == "title").map(_.text)

  // ---------------------------------------------------------------- Spark

  /** Explode each document's HTML into its kept content blocks:
    * `(id, block_ix, tag, text, n_chars, link_chars)`. Pure per-row
    * work — parallelism is widened for the compute, no shuffle added.
    */
  def contentBlocksDf(df: DataFrame, idCol: String, htmlCol: String,
      minChars: Int = 25, maxLinkDensity: Double = 0.33): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src: Dataset[(Long, String)] = graft.operators.Partitioning
      .ensureMinParallelism(df.select(col(idCol).cast("long"), col(htmlCol)))
      .as[(Long, String)]
    src.flatMap { case (id, html) =>
      if (html == null) Iterator.empty
      else content(html, minChars, maxLinkDensity).iterator
        .map(b => (id, b.blockIx, b.tag, b.text, b.nChars, b.linkChars))
    }.toDF(idCol, "block_ix", "tag", "text", "n_chars", "link_chars")
  }

  /** Explode `(id, href, anchor)` link tuples per document. */
  def linksDf(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src = graft.operators.Partitioning
      .ensureMinParallelism(df.select(col(idCol).cast("long"), col(htmlCol)))
      .as[(Long, String)]
    src.flatMap { case (id, html) =>
      if (html == null) Iterator.empty
      else links(html).iterator.zipWithIndex.map { case ((h, a), ix) => (id, ix, h, a) }
    }.toDF(idCol, "link_ix", "href", "anchor")
  }
}
