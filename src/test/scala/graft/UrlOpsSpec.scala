package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlOps

/** URL canonicalization: parse, dot segments, escapes, tracking params,
  * default ports, registrable domain.
  */
class UrlOpsSpec extends AnyFunSuite {

  test("parse splits scheme/host/port/path/query/fragment") {
    val u = UrlOps.parse("HTTPS://Example.COM:8443/a/b?x=1&y=2#frag")
    assert(u.scheme == "https" && u.host == "example.com" && u.port == 8443)
    assert(u.path == "/a/b" && u.query == "x=1&y=2" && u.fragment == "frag")
    assert(UrlOps.parse("http://h").path == "")
    intercept[IllegalArgumentException](UrlOps.parse("no-scheme.com/path"))
    intercept[IllegalArgumentException](UrlOps.parse("http:///nohost"))
  }

  test("remove_dot_segments follows RFC 3986 §5.2.4") {
    assert(UrlOps.resolveDotSegments("/a/./b/../c") == "/a/c")
    assert(UrlOps.resolveDotSegments("/a/b/c/./../../g") == "/a/g")
    assert(UrlOps.resolveDotSegments("/a/..") == "/")
    assert(UrlOps.resolveDotSegments("/../a") == "/a")
    assert(UrlOps.resolveDotSegments("/a/.") == "/a/")
    assert(UrlOps.resolveDotSegments("") == "/")
    // empty segments are preserved, not collapsed
    assert(UrlOps.resolveDotSegments("/a//b") == "/a//b")
    assert(UrlOps.resolveDotSegments("mid/content=5/../6") == "mid/6")
  }

  test("escape normalization: unreserved decoded, rest uppercased") {
    assert(UrlOps.normalizeEscapes("%41%2f%7e") == "A%2F~")
    assert(UrlOps.normalizeEscapes("%e2%82%ac") == "%E2%82%AC")
    // malformed escapes pass through
    assert(UrlOps.normalizeEscapes("100%") == "100%")
    assert(UrlOps.normalizeEscapes("%zz") == "%zz")
  }

  test("query: tracking params stripped, order preserved, empties dropped") {
    assert(UrlOps.normalizeQuery("utm_source=f&id=3&fbclid=x&b=2") == "id=3&b=2")
    assert(UrlOps.normalizeQuery("UTM_CAMPAIGN=x&gclid=1&msclkid=2") == "")
    assert(UrlOps.normalizeQuery("b=2&a=1") == "b=2&a=1") // NOT sorted
  }

  test("normalize end to end") {
    assert(UrlOps.normalize("HTTP://WWW.Site.COM:80/a/./b/../Page.HTML?utm_source=x&id=1#f")
      == "http://www.site.com/a/Page.HTML?id=1")
    assert(UrlOps.normalize("https://h.org:443/") == "https://h.org/")
    assert(UrlOps.normalize("https://h.org:8080/x") == "https://h.org:8080/x")
    assert(UrlOps.normalize("http://h.org:443/x") == "http://h.org:443/x") // not http's default
    assert(UrlOps.normalize("http://h.org") == "http://h.org/")
    assert(UrlOps.normalize("http://h.org/p?utm_source=x") == "http://h.org/p")
  }

  test("registrable domain: multi-label suffixes, fallback, edge shapes") {
    assert(UrlOps.registrableDomain("www.example.com") == "example.com")
    assert(UrlOps.registrableDomain("a.b.example.co.uk") == "example.co.uk")
    assert(UrlOps.registrableDomain("user.github.io") == "user.github.io")
    assert(UrlOps.registrableDomain("deep.user.github.io") == "user.github.io")
    assert(UrlOps.registrableDomain("example.com") == "example.com")
    assert(UrlOps.registrableDomain("com") == "com")          // bare suffix
    assert(UrlOps.registrableDomain("co.uk") == "co.uk")      // host IS a suffix
    assert(UrlOps.registrableDomain("LOCALHOST") == "localhost")
    assert(UrlOps.registrableDomain("192.168.0.1") == "192.168.0.1")
  }

  test("a host that IS a listed 3-label suffix is returned unchanged") {
    // the pre-r12 loop stopped at k < labels.length and shortened these
    assert(UrlOps.registrableDomain("s3.amazonaws.com") == "s3.amazonaws.com")
    assert(UrlOps.registrableDomain("bucket.s3.amazonaws.com") == "bucket.s3.amazonaws.com")
    assert(UrlOps.registrableDomain("github.io") == "github.io")
  }

  // the published test battery from publicsuffix.org/list/tests, for
  // every case our embedded snapshot covers; where the published
  // expectation is null (no registrable domain) our convention is to
  // return the host unchanged
  test("PSL published cases: mixed case, unlisted TLD, jp/ck families") {
    def rd(h: String): String = UrlOps.registrableDomain(h)
    // Mixed case
    assert(rd("COM") == "com")
    assert(rd("example.COM") == "example.com")
    assert(rd("WwW.example.COM") == "example.com")
    // Unlisted TLD (implicit * rule)
    assert(rd("example") == "example")
    assert(rd("example.example") == "example.example")
    assert(rd("b.example.example") == "example.example")
    assert(rd("a.b.example.example") == "example.example")
    // TLD with only 1 (implicit) rule
    assert(rd("biz") == "biz")
    assert(rd("domain.biz") == "domain.biz")
    assert(rd("b.domain.biz") == "domain.biz")
    assert(rd("a.b.domain.biz") == "domain.biz")
    // TLD with some 2-level rules
    assert(rd("example.com") == "example.com")
    assert(rd("b.example.com") == "example.com")
    assert(rd("a.b.example.com") == "example.com")
    assert(rd("uk.com") == "uk.com")
    // jp: plain second levels
    assert(rd("jp") == "jp")
    assert(rd("test.jp") == "test.jp")
    assert(rd("www.test.jp") == "test.jp")
    assert(rd("ac.jp") == "ac.jp")
    assert(rd("test.ac.jp") == "test.ac.jp")
    assert(rd("www.test.ac.jp") == "test.ac.jp")
    // jp: wildcard city families with exceptions
    assert(rd("kawasaki.jp") == "kawasaki.jp")
    assert(rd("test.kawasaki.jp") == "test.kawasaki.jp") // *.kawasaki.jp → whole host is a suffix
    assert(rd("www.test.kawasaki.jp") == "www.test.kawasaki.jp")
    assert(rd("city.kawasaki.jp") == "city.kawasaki.jp") // !city.kawasaki.jp
    assert(rd("www.city.kawasaki.jp") == "city.kawasaki.jp")
    // ck: fully wildcarded with exception
    assert(rd("ck") == "ck")
    assert(rd("test.ck") == "test.ck")
    assert(rd("b.test.ck") == "b.test.ck")
    assert(rd("a.b.test.ck") == "b.test.ck")
    assert(rd("www.ck") == "www.ck")           // !www.ck
    assert(rd("www.www.ck") == "www.ck")
    // US K12-style not in snapshot; trailing dot canonicalized
    assert(rd("example.com.") == "example.com")
  }

  test("PublicSuffixList.parse handles the .dat format") {
    val psl = UrlOps.PublicSuffixList.parse(Seq(
      "// ===BEGIN ICANN DOMAINS===",
      "", "com", "  uk ", "co.uk", "*.sch.uk", "!known.sch.uk",
      "jp  // trailing comment ends at whitespace",
      "// ===END==="))
    assert(psl.publicSuffix("a.co.uk") == "co.uk")
    assert(psl.registrableDomain("x.y.sch.uk") == "x.y.sch.uk") // *.sch.uk
    assert(psl.registrableDomain("a.known.sch.uk") == "known.sch.uk") // exception
    assert(psl.registrableDomain("foo.jp") == "foo.jp")
  }

  test("legacy flat suffix-set overload still works") {
    assert(UrlOps.registrableDomain("a.b.site.co.uk", Set("co.uk")) == "site.co.uk")
    assert(UrlOps.registrableDomain("co.uk", Set("co.uk")) == "co.uk")
  }

  test("the FULL embedded public_suffix_list.dat passes the complete publicsuffix.org battery") {
    val psl = UrlOps.fullPsl
    // the battery's contract: registrable domain, or null when the
    // host is itself a public suffix, a single unlisted label, or
    // syntactically invalid (leading dot / empty label)
    def check(input: String): String = {
      if (input == null) return null
      val h = input.toLowerCase
      if (h.split("\\.", -1).exists(_.isEmpty)) return null
      if (psl.publicSuffix(h) == h) return null
      psl.registrableDomain(h)
    }
    val in = getClass.getResourceAsStream("/graft/test_psl.txt")
    assert(in != null, "test battery resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val Case = """checkPublicSuffix\((null|'[^']*'), (null|'[^']*')\);""".r
    var n = 0
    try src.getLines().map(_.trim).filterNot(_.startsWith("//")).foreach { line =>
      Case.findFirstMatchIn(line).foreach { m =>
        def arg(s: String): String = if (s == "null") null else s.substring(1, s.length - 1)
        val (input, expected) = (arg(m.group(1)), arg(m.group(2)))
        assert(check(input) == expected,
          s"checkPublicSuffix('$input') gave '${check(input)}', battery expects '$expected'")
        n += 1
      }
    } finally src.close()
    assert(n >= 75, s"battery should exercise 75+ active cases, parsed only $n")
  }

  test("full list covers ccTLD registries the in-source snapshot misses") {
    def rd(h: String): String = UrlOps.registrableDomain(h)
    // second-level registries absent from defaultPslRules
    assert(rd("www.example.com.sg") == "example.com.sg")
    assert(rd("shop.example.co.th") == "example.co.th")
    assert(rd("x.example.com.tr") == "example.com.tr")
    assert(rd("a.b.example.com.ua") == "example.com.ua")
    assert(rd("www.example.org.nz") == "example.org.nz")
    assert(rd("site.example.com.ar") == "example.com.ar")
    assert(rd("host.example.co.il") == "example.co.il")
    assert(rd("x.example.com.my") == "example.com.my")
    assert(rd("a.example.com.eg") == "example.com.eg")
    // US state K12 chains (three-label suffixes)
    assert(rd("www.test.k12.ak.us") == "test.k12.ak.us")
    assert(rd("k12.ak.us") == "k12.ak.us") // host IS the suffix
    // PRIVATE-section hosting domains beyond the snapshot
    assert(rd("myapp.fly.dev") == "myapp.fly.dev")
    assert(rd("x.myshop.myshopify.com") == "myshop.myshopify.com")
    // IDN registry in both spellings
    assert(rd("example.xn--55qx5d.cn") == "example.xn--55qx5d.cn")
  }
}
