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
}
