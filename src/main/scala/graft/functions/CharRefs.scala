package graft.functions

/** Character-reference decoding shared by every markup reader here
  * (HTML extraction, sitemap XML): named references from a
  * caller-supplied table, `&#NNN;` decimal and `&#xHH;` hex numeric
  * forms. One policy everywhere — unknown or malformed references
  * pass through verbatim (crawl text is full of bare ampersands),
  * numeric references in the surrogate block decode to U+FFFD (a lone
  * surrogate is ill-formed UTF-16 that would corrupt downstream UTF-8
  * encoding; browsers substitute U+FFFD), out-of-range code points
  * pass through verbatim.
  */
object CharRefs extends Serializable {

  /** XML's five predefined entities — all a sitemap may use. */
  val xmlEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'")

  private def codePointText(cp: Int): Option[String] =
    if (cp >= 0xD800 && cp <= 0xDFFF) Some("�")
    else if (Character.isValidCodePoint(cp)) Some(new String(Character.toChars(cp)))
    else None

  /** Decode references in `s` against `named`. Reference bodies longer
    * than `maxBody` characters are treated as plain text (no real
    * entity name approaches that; the cap bounds the semicolon scan).
    */
  def decode(s: String, named: Map[String, String], maxBody: Int = 12): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > maxBody) { out.append('&'); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try codePointText(Integer.parseInt(body.substring(2), 16))
              catch { case _: NumberFormatException => None }
            else if (body.startsWith("#"))
              try codePointText(Integer.parseInt(body.substring(1)))
              catch { case _: NumberFormatException => None }
            else named.get(body)
          decoded match {
            case Some(d) => out.append(d); i = semi + 1
            case None => out.append('&'); i += 1
          }
        }
      }
    }
    out.toString
  }
}
