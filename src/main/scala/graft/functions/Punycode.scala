package graft.functions

/** Punycode (RFC 3492) — the bootstring encoding behind IDNA `xn--`
  * hostname labels. Crawl links name the same host both ways
  * (`münchen.de` in page text, `xn--mnchen-3ya.de` on the wire);
  * without folding them to one form, URL dedup and per-domain stats
  * split every internationalized site in two.
  *
  * This is the RFC's algorithm verbatim (base 36, tmin 1, tmax 26,
  * skew 38, damp 700, initial bias 72, initial n 128), operating on
  * code points. [[UrlOps.toAsciiHost]] applies it per label with a
  * simple case fold — full IDNA2008 mapping (bidi rules, contextual
  * joiners) is out of scope and documented as such; the case-fold +
  * punycode pair covers the overwhelming majority of crawl hostnames.
  */
object Punycode extends Serializable {

  private final val Base = 36
  private final val TMin = 1
  private final val TMax = 26
  private final val Skew = 38
  private final val Damp = 700
  private final val InitialBias = 72
  private final val InitialN = 128

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + (Base - TMin + 1) * delta / (delta + Skew)
  }

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def digitValue(c: Int): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else throw new IllegalArgumentException(s"punycode: invalid digit '${c.toChar}'")

  /** Encode a unicode label to its punycode form (WITHOUT the `xn--`
    * prefix). Pure ASCII input round-trips as itself + `-`.
    */
  def encode(label: String): String = {
    val cps = label.codePoints().toArray
    val out = new StringBuilder
    cps.foreach(cp => if (cp < InitialN) out.append(cp.toChar))
    val b = out.length
    var h = b
    if (b > 0) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    while (h < cps.length) {
      var m = Int.MaxValue
      cps.foreach(cp => if (cp >= n && cp < m) m = cp)
      if (m - n > (Int.MaxValue - delta) / (h + 1))
        throw new IllegalArgumentException("punycode: overflow")
      delta += (m - n) * (h + 1)
      n = m
      cps.foreach { c =>
        if (c < n) {
          delta += 1
          // JVM ints wrap to NEGATIVE, not zero — the RFC's unsigned
          // wrap check translates to a sign check here
          if (delta < 0) throw new IllegalArgumentException("punycode: overflow")
        }
        if (c == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) done = true
            else {
              out.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out.append(digitChar(q))
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
      }
      delta += 1
      n += 1
    }
    out.toString
  }

  /** Decode a punycode label (WITHOUT the `xn--` prefix) back to
    * unicode. Throws IllegalArgumentException on malformed input.
    */
  def decode(label: String): String = {
    val d = label.lastIndexOf('-')
    val output = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (d > 0) label.substring(0, d).foreach { c =>
      if (c >= InitialN) throw new IllegalArgumentException("punycode: non-basic in basic part")
      output += c.toInt
    }
    var pos = if (d < 0) 0 else d + 1
    var n = InitialN
    var i = 0
    var bias = InitialBias
    while (pos < label.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (pos >= label.length) throw new IllegalArgumentException("punycode: truncated")
        val digit = digitValue(label.charAt(pos)); pos += 1
        if (digit > (Int.MaxValue - i) / w) throw new IllegalArgumentException("punycode: overflow")
        i += digit * w
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (digit < t) done = true
        else {
          if (w > Int.MaxValue / (Base - t)) throw new IllegalArgumentException("punycode: overflow")
          w *= Base - t
          k += Base
        }
      }
      bias = adapt(i - oldi, output.length + 1, oldi == 0)
      n += i / (output.length + 1)
      i %= output.length + 1
      if (!Character.isValidCodePoint(n)) throw new IllegalArgumentException("punycode: bad code point")
      output.insert(i, n)
      i += 1
    }
    new String(output.toArray, 0, output.length)
  }
}
