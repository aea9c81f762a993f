package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Punycode, UrlOps}

/** RFC 3492 punycode + IDNA-lite host folding, cross-verified against
  * the JDK's independent implementation (java.net.IDN, IDNA2003).
  */
class PunycodeSpec extends AnyFunSuite {

  test("known label encodings") {
    assert(Punycode.encode("bücher") == "bcher-kva")
    assert(Punycode.encode("münchen") == "mnchen-3ya")
    assert(Punycode.decode("bcher-kva") == "bücher")
    assert(Punycode.decode("mnchen-3ya") == "münchen")
    // pure ASCII round-trips with the trailing delimiter form
    assert(Punycode.encode("abc") == "abc-")
    assert(Punycode.decode("abc-") == "abc")
  }

  test("cross-check vs java.net.IDN on a unicode label corpus") {
    // alphabet avoids IDNA2003 nameprep-mapped characters (ß→ss,
    // uppercase, ZWJ) so both implementations see identity mapping
    val alphabet = "abcxyzäöüéàλπжшच日本語中文한글"
    val rnd = new scala.util.Random(4242)
    (1 to 300).foreach { _ =>
      val label = (1 to (1 + rnd.nextInt(12)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val mine = UrlOps.toAsciiHost(label)
      val jdk = java.net.IDN.toASCII(label)
      assert(mine == jdk, s"label '$label': mine=$mine jdk=$jdk")
      // and decode inverts encode
      if (mine.startsWith("xn--"))
        assert(Punycode.decode(mine.substring(4)) == label)
    }
  }

  test("multi-label hosts fold per label; xn-- and ASCII pass through") {
    assert(UrlOps.toAsciiHost("BÜCHER.example") == "xn--bcher-kva.example")
    assert(UrlOps.toAsciiHost("münchen.de") == "xn--mnchen-3ya.de")
    assert(UrlOps.toAsciiHost("日本語.jp") == java.net.IDN.toASCII("日本語.jp"))
    assert(UrlOps.toAsciiHost("Plain.Example.COM") == "plain.example.com")
    assert(UrlOps.toAsciiHost("xn--mnchen-3ya.de") == "xn--mnchen-3ya.de")
  }

  test("normalize folds unicode hosts: both spellings become one URL key") {
    val a = UrlOps.normalize("https://MÜNCHEN.de/p?utm_source=x&id=1")
    val b = UrlOps.normalize("https://xn--mnchen-3ya.de/p?id=1")
    assert(a == b && a == "https://xn--mnchen-3ya.de/p?id=1")
  }

  test("malformed punycode fails loudly") {
    intercept[IllegalArgumentException](Punycode.decode("!!bad!!"))
    intercept[IllegalArgumentException](Punycode.decode("abc-ü"))
    // truncated variable-length integer
    intercept[IllegalArgumentException](Punycode.decode("a-zzzzzzzzzzzzzzzzzzzz"))
  }
}
