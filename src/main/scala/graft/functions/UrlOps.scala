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
  * `registrableDomain` groups hosts by their eTLD+1 under a
  * [[PublicSuffixList]] implementing the full publicsuffix.org
  * algorithm — normal rules, wildcard rules (`*.ck`), and exception
  * rules (`!www.ck`) — over the FULL published
  * public_suffix_list.dat, embedded as a classpath resource
  * ([[fullPsl]], ~10k rules, verified against the publicsuffix.org
  * test battery in UrlOpsSpec). A newer list drops in via
  * `PublicSuffixList.parse` + `registrableDomain(host, psl)`.
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

  /** Compiled public-suffix rules in the public_suffix_list.dat model:
    * normal rules, wildcard rules (stored with their `*.` prefix), and
    * exception rules (stored WITHOUT the `!`). Matching follows the
    * published algorithm: among matching rules an exception beats all,
    * otherwise the rule with the most labels prevails, and a host no
    * rule matches falls back to the implicit `*` (last label).
    *
    * Three flat `Set[String]` lookups per candidate suffix length —
    * O(labels²) string work per host, no allocation beyond the tail
    * joins — fine inside codegen'd per-row maps at corpus scale.
    */
  final class PublicSuffixList private[functions] (
      normal: Set[String], wildcard: Set[String], exception: Set[String])
      extends Serializable {

    /** Label count of the public suffix of `labels` (a lowercased host
      * split on '.'). At least 1 (the implicit `*` fallback rule); can
      * equal `labels.length` when the whole host is a public suffix.
      */
    private[functions] def suffixLength(labels: Array[String]): Int = {
      var excLen = -1
      var best = 1
      var k = 1
      while (k <= labels.length) {
        val tail = labels.takeRight(k).mkString(".")
        // exception rule: the suffix is the rule minus its leftmost label
        if (exception(tail) && k - 1 > excLen) excLen = k - 1
        if (normal(tail) && k > best) best = k
        if (k >= 2 && wildcard("*." + labels.takeRight(k - 1).mkString(".")) && k > best)
          best = k
        k += 1
      }
      if (excLen >= 0) excLen else best
    }

    /** The public suffix of `host` (eTLD), lowercased. */
    def publicSuffix(host: String): String = {
      val h = host.toLowerCase.stripSuffix(".")
      val labels = h.split("\\.", -1)
      labels.takeRight(suffixLength(labels)).mkString(".")
    }

    /** eTLD+1. A host that IS a public suffix (or a single label, or an
      * IPv4 literal) is returned unchanged.
      */
    def registrableDomain(host: String): String = {
      val h = host.toLowerCase.stripSuffix(".")
      if (h.isEmpty || h.forall(c => c.isDigit || c == '.')) return h // IPv4 literal
      val labels = h.split("\\.", -1)
      if (labels.length < 2) return h
      val sl = suffixLength(labels)
      if (labels.length <= sl) h
      else labels.takeRight(sl + 1).mkString(".")
    }
  }

  object PublicSuffixList {
    /** Parse public_suffix_list.dat content: one rule per line, `//`
      * comments and blank lines skipped, a rule ends at the first
      * whitespace (the file's own convention), case-insensitive.
      * Handles `!exception` and `*.wildcard` rules. IDN rules (the
      * list stores them in unicode) are ALSO indexed under their
      * punycoded form, so `xn--…` hostnames match the same registry
      * rules their unicode twins do — the publicsuffix.org test
      * battery checks both spellings.
      */
    def parse(lines: IterableOnce[String]): PublicSuffixList = {
      val normal = Set.newBuilder[String]
      val wildcard = Set.newBuilder[String]
      val exception = Set.newBuilder[String]
      def variants(rule: String): Seq[String] = {
        if (rule.forall(_ < 128)) Seq(rule)
        else Seq(rule, toAsciiHost(rule))
      }
      lines.iterator.foreach { raw =>
        val l = raw.trim.takeWhile(!_.isWhitespace).toLowerCase
        if (l.nonEmpty && !l.startsWith("//")) {
          if (l.startsWith("!")) exception ++= variants(l.substring(1))
          else if (l.contains("*")) wildcard ++= variants(l)
          else normal ++= variants(l)
        }
      }
      new PublicSuffixList(normal.result(), wildcard.result(), exception.result())
    }

    /** Treat a plain suffix set as normal rules (legacy entry point). */
    def fromSuffixes(suffixes: Set[String]): PublicSuffixList =
      new PublicSuffixList(suffixes.map(_.toLowerCase), Set.empty, Set.empty)
  }

  /** Embedded SNAPSHOT of the public suffix list — the high-traffic
    * ccTLD second levels, the wildcard/exception families, and common
    * hosting "private domains". NOT the full list (that is ~10k rules
    * and updates monthly); corpus bucketing with this snapshot groups
    * the overwhelming majority of crawl hosts correctly, and
    * deployments can swap in the real file via `PublicSuffixList.parse`.
    */
  val defaultPslRules: Seq[String] = Seq(
    // generic TLDs (single labels also fall out of the implicit `*`
    // rule; listing the common ones keeps parity with the real file)
    "com", "net", "org", "edu", "gov", "mil", "int", "info", "biz",
    "name", "mobi", "io", "co", "me", "tv", "cc", "ai", "app", "dev",
    "xyz", "online", "site",
    // United Kingdom
    "uk", "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk",
    "nhs.uk", "org.uk", "plc.uk", "police.uk", "*.sch.uk",
    // Japan (incl. the city wildcard/exception families)
    "jp", "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    // Australia
    "au", "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // Cook Islands: everything under ck is a suffix except www.ck
    "ck", "*.ck", "!www.ck",
    // Bangladesh: fully wildcarded
    "bd", "*.bd",
    // other common ccTLD second levels
    "br", "com.br", "net.br", "org.br", "gov.br",
    "cn", "com.cn", "net.cn", "org.cn", "gov.cn",
    "in", "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "kr", "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr",
    "za", "co.za", "net.za", "org.za", "web.za",
    "mx", "com.mx", "org.mx", "gob.mx", "net.mx",
    "fr", "de", "it", "es", "nl", "ru", "pl", "us", "ca", "ch", "se",
    // hosting private domains (the PSL's PRIVATE section)
    "github.io", "gitlab.io", "blogspot.com", "s3.amazonaws.com",
    "herokuapp.com", "netlify.app", "vercel.app", "web.app",
    "firebaseapp.com", "pages.dev", "workers.dev", "azurewebsites.net",
    "cloudfront.net", "appspot.com")

  /** The in-source snapshot PSL — parse-mechanics tests and a
    * no-resource fallback; the 1-arg `registrableDomain` uses
    * [[fullPsl]].
    */
  val defaultPsl: PublicSuffixList = PublicSuffixList.parse(defaultPslRules)

  /** Legacy flat view (normal multi-label rules only) — kept for callers
    * that pass an explicit suffix set.
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

  /** IDNA-lite ToASCII: per label, locale-independent code-point
    * lowercase; a label with any non-ASCII code point becomes
    * `xn--` + punycode (RFC 3492). Already-encoded `xn--` labels and
    * plain ASCII pass through lowercased. Full IDNA2008 mapping (bidi
    * rules, contextual joiners, deviation characters) is deliberately
    * out of scope — the case-fold + punycode pair folds the
    * overwhelming majority of crawl hostnames to one key.
    */
  def toAsciiHost(host: String): String =
    host.split("\\.", -1).map { label =>
      val lower = label.codePoints().toArray.map(Character.toLowerCase)
      val s = new String(lower, 0, lower.length)
      if (s.forall(_ < 128)) s else "xn--" + Punycode.encode(s)
    }.mkString(".")

  /** Full syntax-based normalization (see class doc). */
  def normalize(url: String): String = {
    val u = parse(url)
    val port = if (u.port == defaultPort(u.scheme)) -1 else u.port
    val path = normalizeEscapes(resolveDotSegments(u.path))
    val q = normalizeQuery(u.query)
    val sb = new StringBuilder(u.scheme).append("://").append(toAsciiHost(u.host))
    if (port > 0) sb.append(':').append(port)
    sb.append(path)
    if (q.nonEmpty) sb.append('?').append(q)
    sb.toString
  }

  /** The FULL published public suffix list
    * (https://publicsuffix.org/list/public_suffix_list.dat, MPL 2.0),
    * embedded as a classpath resource and parsed once per JVM — ~10k
    * rules covering every ccTLD registry and the PRIVATE hosting
    * section. This is what the 1-arg [[registrableDomain]] (and the
    * native `graft_url_domain` expression on top of it) uses; the
    * in-source [[defaultPsl]] snapshot remains for parse-mechanics
    * tests and as an explicit no-resource fallback.
    */
  lazy val fullPsl: PublicSuffixList = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "embedded graft/public_suffix_list.dat missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try PublicSuffixList.parse(src.getLines()) finally src.close()
  }

  /** eTLD+1 under the full embedded public suffix list. A host that IS
    * a public suffix (or a single label, or an IP) is returned
    * unchanged.
    */
  def registrableDomain(host: String): String =
    fullPsl.registrableDomain(host)

  /** eTLD+1 under a caller-supplied PSL (e.g. the full
    * public_suffix_list.dat via `PublicSuffixList.parse`).
    */
  def registrableDomain(host: String, psl: PublicSuffixList): String =
    psl.registrableDomain(host)

  /** Legacy form: a flat set of normal suffix rules (no wildcards or
    * exceptions) plus the implicit `*` fallback.
    */
  def registrableDomain(host: String, suffixes: Set[String]): String =
    PublicSuffixList.fromSuffixes(suffixes).registrableDomain(host)

  private val ipv4Re = "\\d{1,3}(\\.\\d{1,3}){3}".r
  private val wwwLabelRe = "www\\d*".r

  /** SURT key (Sort-friendly URI Reordering Transform) of an absolute
    * URL — the sort/lookup key of web-archive CDX indexes: host labels
    * reversed and comma-joined so one host's records (and one domain's
    * hosts) are CONTIGUOUS under a lexicographic sort, which is what
    * makes range-pruned index lookup work at archive scale.
    *
    * Built from [[normalize]]'s components, then canonicalized the way
    * CDX writers (pywb / webarchive-commons) do:
    *   - scheme dropped (http/https collide — same document); userinfo
    *     (`user:pass@`) dropped — it is not part of the resource's
    *     identity and would push the key outside its host's range;
    *   - host IDNA-folded + lowercased, one trailing dot stripped, ONE
    *     leading `www`/`www<digits>` label stripped when at least two
    *     labels remain (`www.example.com` → `example.com`, but `www.ck`
    *     keeps its only meaningful label); IPv4 literals keep their
    *     byte order (reversing octets would scatter a subnet), other
    *     hosts reverse label order joined by `,`;
    *   - non-default port kept after the reversed host (`:8443`);
    *   - path dot-segment-resolved, escape-normalized, LOWERCASED —
    *     CDX keys are case-folded so `/A` and `/a` collide (the
    *     documented over-fold CDX accepts for dedup);
    *   - query tracking-stripped ([[normalizeQuery]]), params
    *     LOWERCASED first and then sorted byte-wise (`?B=2&a=1` and
    *     `?a=1&b=2` collide — folding after sorting would give case
    *     variants different orders), empty query dropped; fragment
    *     dropped;
    *   - any raw whitespace/control byte left in the path or query is
    *     percent-encoded (`%20` …) — the key must survive
    *     space-delimited index formats (CDXJ lines) verbatim.
    *
    * `com,example)/index.html?a=1` sorts between `com,example)/` and
    * `com,example,sub)/` — a host prefix query is `key >= "com,example)"
    * && key < "com,example*"` (`'*'` is `')'+1`).
    */
  def surtKey(url: String): String = {
    val u = parse(url)
    val port = if (u.port == defaultPort(u.scheme)) -1 else u.port
    val host = {
      val noUser = u.host.substring(u.host.lastIndexOf('@') + 1)
      val h = toAsciiHost(if (noUser.endsWith(".")) noUser.dropRight(1) else noUser)
      require(h.nonEmpty, s"URL without host: '${url.take(60)}'")
      h
    }
    val isIp = ipv4Re.matches(host)
    val rev =
      if (isIp) host
      else {
        val labels = host.split('.')
        val kept =
          if (labels.length >= 3 && wwwLabelRe.matches(labels.head)) labels.tail
          else labels
        kept.reverseIterator.mkString(",")
      }
    def fold(s: String): String =
      encodeKeyUnsafe(s.toLowerCase(java.util.Locale.ROOT))
    val path = fold(normalizeEscapes(resolveDotSegments(u.path)))
    val q = normalizeQuery(u.query)
    val sq = if (q.isEmpty) "" else fold(q).split("&", -1).sorted.mkString("&")
    val sb = new StringBuilder(rev)
    if (port > 0) sb.append(':').append(port)
    sb.append(')').append(path)
    if (sq.nonEmpty) sb.append('?').append(sq)
    sb.toString
  }

  /** Percent-encode ASCII whitespace/control bytes (anything <= 0x20,
    * plus DEL) so a SURT key is a single space-free token.
    */
  private def encodeKeyUnsafe(s: String): String = {
    var i = 0
    var clean = true
    while (clean && i < s.length) { if (s.charAt(i) <= ' ' || s.charAt(i) == 0x7f) clean = false; i += 1 }
    if (clean) return s
    val sb = new StringBuilder(s.length + 8)
    s.foreach { c =>
      if (c <= ' ' || c == 0x7f) sb.append(f"%%${c.toInt}%02x")
      else sb.append(c)
    }
    sb.toString
  }
}
