package graft.functions

/** robots.txt parsing and URI-path matching per RFC 9309 (Robots
  * Exclusion Protocol) — the politeness gate between a crawl frontier
  * and the fetcher. In a training-data pipeline this runs as a pure
  * per-row function: join each candidate URL with its host's cached
  * robots.txt body and filter on `isAllowed` — no state, no shuffle
  * beyond the host join.
  *
  * Semantics implemented (each is an RFC MUST or the de-facto
  * behavior of the reference open-source matcher):
  *   - groups: consecutive `User-agent` lines share the rule block
  *     that follows; a `User-agent` line after rules starts a new
  *     group; rules before any `User-agent` are ignored;
  *   - group selection: the crawler's product token picks the group
  *     whose agent value is the LONGEST case-insensitive prefix of
  *     the token; `*` applies only when no named group matches; all
  *     groups sharing the winning agent value are COMBINED (RFC
  *     §2.2.1);
  *   - rule matching: `Allow`/`Disallow` values match path prefixes
  *     octet-wise, `*` matches any run, a trailing `$` anchors the
  *     end of the path; the rule with the LONGEST pattern wins; an
  *     allow and disallow of equal length → allow (least
  *     restrictive, RFC §2.2.2); no matching rule → allowed; an
  *     empty `Disallow:` value is a no-op rule;
  *   - `#` starts a comment; field names are case-insensitive;
  *     unknown fields are ignored; `Sitemap` is collected globally
  *     and `Crawl-delay` (non-standard but ubiquitous) per group.
  *
  * Parsing never throws: robots.txt in the wild is malformed
  * constantly, and RFC 9309 §2.2 says to ignore what you can't
  * parse — a crawler that dies on a bad robots.txt fetches nothing.
  */
object RobotsTxt extends Serializable {

  /** One Allow/Disallow rule; `pattern` is the raw path pattern. */
  final case class Rule(allow: Boolean, pattern: String)

  /** A merged rule group for one agent value. */
  final case class Group(agent: String, rules: Vector[Rule],
      crawlDelay: Option[Double])

  final case class Robots(groups: Vector[Group], sitemaps: Vector[String])

  /** Parse a robots.txt body. Never throws (see class doc). */
  def parse(text: String): Robots = {
    val sitemaps = Vector.newBuilder[String]
    // collect raw groups first: (agents, rules, delay)
    final case class Raw(agents: Vector[String], rules: Vector[Rule],
        delay: Option[Double])
    val raws = scala.collection.mutable.ArrayBuffer.empty[Raw]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay: Option[Double] = None
    var sawRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) raws += Raw(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None; sawRules = false
    }
    // a UTF-8 BOM survives decoding as U+FEFF, which String.trim does
    // NOT strip — left in place it turns the first field name into
    // "<BOM>user-agent", the whole first group is skipped as unknown,
    // and every disallowed path silently becomes allowed
    val body = if (text.nonEmpty && text.charAt(0) == '\uFEFF') text.substring(1) else text
    body.split("\r?\n", -1).foreach { line0 =>
      val line = {
        val h = line0.indexOf('#')
        (if (h >= 0) line0.substring(0, h) else line0).trim
      }
      val c = line.indexOf(':')
      if (line.nonEmpty && c > 0) {
        val field = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (sawRules) flush()
            agents :+= value.toLowerCase
          case "allow" if agents.nonEmpty =>
            sawRules = true
            if (value.nonEmpty) rules :+= Rule(allow = true, value)
          case "disallow" if agents.nonEmpty =>
            sawRules = true
            if (value.nonEmpty) rules :+= Rule(allow = false, value)
          case "crawl-delay" if agents.nonEmpty =>
            sawRules = true
            delay = delay.orElse(value.toDoubleOption.filter(_ >= 0))
          case "sitemap" =>
            if (value.nonEmpty) sitemaps += value
          case _ => () // unknown field: ignored per RFC
        }
      }
    }
    flush()
    // merge groups per distinct agent value (RFC §2.2.1 combination)
    val byAgent = scala.collection.mutable.LinkedHashMap.empty[String, (Vector[Rule], Option[Double])]
    raws.foreach { r =>
      r.agents.distinct.foreach { a =>
        val (rs, dl) = byAgent.getOrElse(a, (Vector.empty[Rule], None))
        byAgent(a) = (rs ++ r.rules, dl.orElse(r.delay))
      }
    }
    Robots(byAgent.iterator.map { case (a, (rs, dl)) => Group(a, rs, dl) }.toVector,
      sitemaps.result())
  }

  /** The group governing `userAgentToken`: longest agent value that is
    * a case-insensitive prefix of the token; `*` only as fallback.
    */
  def groupFor(robots: Robots, userAgentToken: String): Option[Group] = {
    val tok = userAgentToken.toLowerCase
    val named = robots.groups.filter(g => g.agent != "*" && tok.startsWith(g.agent))
    if (named.nonEmpty) Some(named.maxBy(_.agent.length))
    else robots.groups.find(_.agent == "*")
  }

  /** `pattern` matches a PREFIX of `path` with `*` wildcards; a
    * trailing `$` anchors the end of the path. Octet-wise (the RFC
    * matches percent-encoded bytes; callers pass paths in the same
    * encoding the rules use).
    */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    val pat = if (anchored) pattern.dropRight(1) else pattern
    var p = 0; var s = 0
    var starP = -1; var starS = -1
    while (true) {
      if (p == pat.length) {
        if (!anchored || s == path.length) return true
        // anchored but path remains: stretch the last '*' if any
        if (starP < 0) return false
        p = starP + 1; starS += 1
        if (starS > path.length) return false
        s = starS
      } else if (pat.charAt(p) == '*') {
        starP = p; starS = s; p += 1
      } else if (s < path.length && pat.charAt(p) == path.charAt(s)) {
        p += 1; s += 1
      } else if (starP >= 0) {
        p = starP + 1; starS += 1
        if (starS > path.length) return false
        s = starS
      } else return false
    }
    false // unreachable
  }

  /** RFC 9309 decision for (crawler token, path): longest matching
    * pattern wins; equal lengths → allow; no match → allowed; no
    * governing group → allowed.
    */
  def isAllowed(robots: Robots, userAgentToken: String, path: String): Boolean =
    groupFor(robots, userAgentToken) match {
      case None => true
      case Some(g) =>
        var bestLen = -1
        var bestAllow = true
        g.rules.foreach { r =>
          if (matches(r.pattern, path)) {
            val len = r.pattern.length
            if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
              bestLen = len; bestAllow = r.allow
            }
          }
        }
        if (bestLen < 0) true else bestAllow
    }

  /** Convenience for the frontier join: decision straight from the
    * robots.txt body (parse result should be cached per host when the
    * caller filters many URLs of one host — `parse` is O(body)).
    */
  def isAllowed(robotsTxt: String, userAgentToken: String, path: String): Boolean =
    isAllowed(parse(robotsTxt), userAgentToken, path)
}
