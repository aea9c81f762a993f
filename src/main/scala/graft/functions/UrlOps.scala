package graft.functions

/** URL canonicalization for crawl dedup/aggregation — the step that
  * makes "HTTP://WWW.Site.COM:80/a/./b/../p.html?utm_source=x&id=1#f"
  * and "http://www.site.com/a/p.html?id=1" the same key, so URL-level
  * dedup and per-domain stats group correctly at corpus scale.
  *
  * Normalization applied (RFC 3986 §6 syntax-based, plus the crawl
  * conventions):
  *   - scheme and host lowercased; default port for the scheme dropped
  *     (http:80, https:443); other ports kept;
  *   - path dot-segments (`.` / `..`) resolved; empty path → `/`;
  *     path CASE is preserved (paths are case-sensitive);
  *   - percent-escapes of UNRESERVED characters decoded (`%41`→`A`,
  *     `%7E`→`~`); all other escapes kept with UPPERCASE hex digits;
  *   - tracking parameters stripped (`utm_*`, `gclid`, `fbclid`,
  *     `msclkid`); remaining query parameter ORDER preserved (reordering
  *     changes semantics for some endpoints); empty query dropped;
  *   - the fragment is dropped (never sent to servers).
  *
  * `registrableDomain` groups hosts by their eTLD+1 using an embedded
  * SNAPSHOT of common public-suffix rules — enough for corpus
  * bucketing; production deployments should supply the full, current
  * public-suffix list via `registrableDomain(host, suffixes)`.
  *
  * Everything here is a pure string function — used inside codegen'd
  * expressions or per-row maps, no shuffle, no state.
  */
object UrlOps extends Serializable {

  final case class ParsedUrl(scheme: String, host: String, port: Int,
      path: String, query: String, fragment: String)

  private val trackingParams: String => Boolean = { name =>
    val n = name.toLowerCase
    n.startsWith("utm_") || n == "gclid" || n == "fbclid" || n == "msclkid"
  }

  /** Minimal public-suffix snapshot (multi-label suffixes listed
    * explicitly; any unlisted single label acts as a suffix, which is
    * the PSL's own fallback rule `*`).
    */
  val defaultSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ac.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
    "github.io", "gitlab.io", "blogspot.com", "s3.amazonaws.com")

  /** Parse an absolute http(s)-style URL. Fails loudly on inputs with
    * no scheme or authority — crawl frontiers resolve relative links
    * against their base BEFORE storage.
    */
  def parse(url: String): ParsedUrl = {
    val si = url.indexOf("://")
    require(si > 0, s"URL without scheme: '${url.take(60)}'")
    val scheme = url.substring(0, si).toLowerCase
    var i = si + 3
    val authEnd = {
      var j = i
      while (j < url.length && url.charAt(j) != '/' && url.charAt(j) != '?' && url.charAt(j) != '#') j += 1
      j
    }
    val auth = url.substring(i, authEnd)
    require(auth.nonEmpty, s"URL without host: '${url.take(60)}'")
    val (host, port) = auth.lastIndexOf(':') match {
      case -1 => (auth, -1)
      case c =>
        val p = auth.substring(c + 1)
        if (p.nonEmpty && p.forall(_.isDigit)) (auth.substring(0, c), p.toInt)
        else (auth, -1)
    }
    i = authEnd
    val hashAt = url.indexOf('#', i)
    val noFrag = if (hashAt < 0) url.length else hashAt
    val qAt = url.indexOf('?', i)
    val (path, query) =
      if (qAt >= 0 && qAt < noFrag) (url.substring(i, qAt), url.substring(qAt + 1, noFrag))
      else (url.substring(i, noFrag), "")
    val fragment = if (hashAt < 0) "" else url.substring(hashAt + 1)
    ParsedUrl(scheme, host.toLowerCase, port, path, query, fragment)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, implemented literally (the
    * buffer-rewriting form) — preserves empty segments (`a//b` stays,
    * per the RFC; only `.`/`..` are rewritten). Empty path → `/`.
    */
  def resolveDotSegments(path: String): String = {
    if (path.isEmpty) return "/"
    var in = path
    val out = new StringBuilder
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        val cut = out.lastIndexOf("/")
        out.setLength(if (cut < 0) 0 else cut)
      } else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.charAt(0) == '/') 1 else 0
        val next = in.indexOf('/', from)
        val end = if (next < 0) in.length else next
        out.append(in.substring(0, end))
        in = in.substring(end)
      }
    }
    if (out.isEmpty) "/" else out.toString
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_' || c == '~'

  /** Decode unreserved percent-escapes, uppercase the hex of the rest. */
  def normalizeEscapes(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (v < 128 && isUnreserved(v.toChar)) out.append(v.toChar)
        else out.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def defaultPort(scheme: String): Int = scheme match {
    case "http" => 80
    case "https" => 443
    case "ftp" => 21
    case _ => -1
  }

  /** Strip tracking params, keep order, re-join. Empty result → "". */
  def normalizeQuery(query: String): String = {
    if (query.isEmpty) return ""
    query.split("&", -1).iterator
      .filter(_.nonEmpty)
      .filterNot(p => trackingParams(p.takeWhile(_ != '=')))
      .map(normalizeEscapes)
      .mkString("&")
  }

  /** Full syntax-based normalization (see class doc). */
  def normalize(url: String): String = {
    val u = parse(url)
    val port = if (u.port == defaultPort(u.scheme)) -1 else u.port
    val path = normalizeEscapes(resolveDotSegments(u.path))
    val q = normalizeQuery(u.query)
    val sb = new StringBuilder(u.scheme).append("://").append(u.host)
    if (port > 0) sb.append(':').append(port)
    sb.append(path)
    if (q.nonEmpty) sb.append('?').append(q)
    sb.toString
  }

  /** eTLD+1 under the given suffix set: the longest listed multi-label
    * suffix wins; otherwise the final label is the suffix. A host that
    * IS a suffix (or a single label, or an IP) is returned unchanged.
    */
  def registrableDomain(host: String,
      suffixes: Set[String] = defaultSuffixes): String = {
    val h = host.toLowerCase.stripSuffix(".")
    if (h.forall(c => c.isDigit || c == '.')) return h // IPv4 literal
    val labels = h.split("\\.", -1)
    if (labels.length < 2) return h
    // longest listed suffix matching a proper tail of the host
    var best = 1 // PSL fallback: last label is a suffix
    var k = 2
    while (k < labels.length) {
      if (suffixes(labels.takeRight(k).mkString("."))) best = k
      k += 1
    }
    if (labels.length <= best) h
    else labels.takeRight(best + 1).mkString(".")
  }
}
