package graft.sources

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer
import org.scalatest.funsuite.AnyFunSuite

/** JSONB storage decode: the spec carries its own independent encoder
  * of the public layout (sql/json_binary.h) — scalars, small/large
  * objects/arrays with correct inline/out-of-line entry rules, varint
  * string lengths, opaque decimal/temporal payloads — and asserts
  * [[JsonBinary.decode]] reproduces the canonical text.
  */
object JsonbBytes {
  sealed trait J
  case object JNull extends J
  case object JTrue extends J
  case object JFalse extends J
  final case class JI16(v: Int) extends J
  final case class JU16(v: Int) extends J
  final case class JI32(v: Int) extends J
  final case class JU32(v: Long) extends J
  final case class JI64(v: Long) extends J
  final case class JU64(v: Long) extends J
  final case class JDbl(v: Double) extends J
  final case class JStr(s: String) extends J
  final case class JObj(fields: Seq[(String, J)], large: Boolean = false) extends J
  final case class JArr(items: Seq[J], large: Boolean = false) extends J
  final case class JOpaque(fieldType: Int, data: Array[Byte]) extends J

  private def typeOf(v: J): Int = v match {
    case JNull | JTrue | JFalse => 0x04
    case _: JI16 => 0x05
    case _: JU16 => 0x06
    case _: JI32 => 0x07
    case _: JU32 => 0x08
    case _: JI64 => 0x09
    case _: JU64 => 0x0a
    case _: JDbl => 0x0b
    case _: JStr => 0x0c
    case JObj(_, large) => if (large) 0x01 else 0x00
    case JArr(_, large) => if (large) 0x03 else 0x02
    case _: JOpaque => 0x0f
  }

  private class W {
    val b = ArrayBuffer.empty[Byte]
    def u8(v: Int): W = { b += (v & 0xff).toByte; this }
    def u16(v: Int): W = { u8(v); u8(v >> 8); this }
    def u32(v: Long): W = { u16(v.toInt); u16((v >> 16).toInt); this }
    def i64(v: Long): W = { u32(v); u32(v >>> 32); this }
    def raw(bs: Array[Byte]): W = { b ++= bs; this }
    def varlen(v: Int): W =
      if (v < 0x80) u8(v) else { u8(0x80 | (v & 0x7f)); u8(v >> 7); this }
    def result: Array[Byte] = b.toArray
  }

  /** Scalar payload bytes (no type byte). */
  private def scalarBytes(v: J): Array[Byte] = v match {
    case JNull => Array(0x00.toByte)
    case JTrue => Array(0x01.toByte)
    case JFalse => Array(0x02.toByte)
    case JI16(x) => new W().u16(x).result
    case JU16(x) => new W().u16(x).result
    case JI32(x) => new W().u32(x.toLong & 0xffffffffL).result
    case JU32(x) => new W().u32(x).result
    case JI64(x) => new W().i64(x).result
    case JU64(x) => new W().i64(x).result
    case JDbl(x) => new W().i64(java.lang.Double.doubleToLongBits(x)).result
    case JStr(s) =>
      val bs = s.getBytes(StandardCharsets.UTF_8)
      new W().varlen(bs.length).raw(bs).result
    case JOpaque(ft, data) => new W().u8(ft).varlen(data.length).raw(data).result
    case _: JObj | _: JArr => containerBytes(v)
  }

  private def inlineable(v: J, large: Boolean): Boolean = v match {
    case JNull | JTrue | JFalse | _: JI16 | _: JU16 => true
    case _: JI32 | _: JU32 => large
    case _ => false
  }

  /** Container body (count/size/entries/keys/values), offsets from the
    * count field per the public layout.
    */
  private def containerBytes(v: J): Array[Byte] = {
    val (isObj, large, n) = v match {
      case JObj(f, l) => (true, l, f.length)
      case JArr(a, l) => (false, l, a.length)
      case _ => throw new IllegalArgumentException
    }
    val w = if (large) 4 else 2
    val keys: Seq[Array[Byte]] = v match {
      case JObj(f, _) => f.map(_._1.getBytes(StandardCharsets.UTF_8))
      case _ => Nil
    }
    val values: Seq[J] = v match {
      case JObj(f, _) => f.map(_._2)
      case JArr(a, _) => a
      case _ => Nil
    }
    val headerLen = 2 * w + (if (isObj) n * (w + 2) else 0) + n * (1 + w)
    // lay out tail: keys first, then out-of-line values
    var off = headerLen
    val keyOffs = keys.map { k => val o = off; off += k.length; o }
    val valOffs = values.map { x =>
      if (inlineable(x, large)) -1
      else { val o = off; off += scalarBytes(x).length; o }
    }
    val size = off
    val out = new W()
    def field(x: Int): Unit = if (large) out.u32(x.toLong) else out.u16(x)
    field(n); field(size)
    if (isObj) keys.indices.foreach { i => field(keyOffs(i)); out.u16(keys(i).length) }
    values.indices.foreach { i =>
      val x = values(i)
      out.u8(typeOf(x))
      if (valOffs(i) >= 0) field(valOffs(i))
      else {
        val sb = scalarBytes(x)
        out.raw(sb)
        (sb.length until w).foreach(_ => out.u8(0)) // pad inline entry
      }
    }
    keys.foreach(out.raw)
    values.indices.foreach(i => if (valOffs(i) >= 0) out.raw(scalarBytes(values(i))))
    out.result
  }

  /** Full document: type byte + payload. */
  def doc(v: J): Array[Byte] = new W().u8(typeOf(v)).raw(scalarBytes(v)).result

  // packed-longlong temporal forms (TIME_to_longlong_packed layout)
  def packedDate(y: Int, m: Int, d: Int): Array[Byte] = {
    val ymd = ((y * 13 + m).toLong << 5) | d
    new W().i64((ymd << 17) << 24).result
  }
  def packedDatetime(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int, micros: Long): Array[Byte] = {
    val ymd = ((y * 13 + mo).toLong << 5) | d
    val hms = (h.toLong << 12) | (mi << 6) | s
    new W().i64((((ymd << 17) | hms) << 24) | micros).result
  }
  def packedTime(neg: Boolean, h: Int, mi: Int, s: Int, micros: Long): Array[Byte] = {
    val hms = (h.toLong << 12) | (mi << 6) | s
    val p = (hms << 24) | micros
    new W().i64(if (neg) -p else p).result
  }
}

class JsonBinarySpec extends AnyFunSuite {
  import JsonbBytes._

  test("scalar documents: every numeric width, literals, double, string") {
    assert(JsonBinary.decode(doc(JNull)) == "null")
    assert(JsonBinary.decode(doc(JTrue)) == "true")
    assert(JsonBinary.decode(doc(JFalse)) == "false")
    assert(JsonBinary.decode(doc(JI16(-5))) == "-5")
    assert(JsonBinary.decode(doc(JU16(65535))) == "65535")
    assert(JsonBinary.decode(doc(JI32(-2147483648))) == "-2147483648")
    assert(JsonBinary.decode(doc(JU32(4294967295L))) == "4294967295")
    assert(JsonBinary.decode(doc(JI64(Long.MinValue))) == "-9223372036854775808")
    assert(JsonBinary.decode(doc(JU64(-1L))) == "18446744073709551615")
    assert(JsonBinary.decode(doc(JDbl(3.25))) == "3.25")
    assert(JsonBinary.decode(doc(JStr("héllo"))) == "\"héllo\"")
  }

  test("string escaping and varint lengths past one byte") {
    assert(JsonBinary.decode(doc(JStr("a\"b\\c\n\t\u0001"))) ==
      "\"a\\\"b\\\\c\\n\\t\\u0001\"")
    val long = "x" * 300 // needs a 2-byte varint
    assert(JsonBinary.decode(doc(JStr(long))) == "\"" + long + "\"")
  }

  test("small object: inline int16/literal, out-of-line string/double, stored key order") {
    val j = JObj(Seq(
      "a" -> JI16(1),
      "bc" -> JStr("héllo\n"),
      "d" -> JNull,
      "e" -> JDbl(3.25)))
    assert(JsonBinary.decode(doc(j)) == """{"a":1,"bc":"héllo\n","d":null,"e":3.25}""")
  }

  test("small array: 32/64-bit values go out-of-line") {
    val j = JArr(Seq(JNull, JTrue, JFalse, JI16(7), JI32(2147483647),
      JI64(9223372036854775807L), JU64(-1L), JStr("x")))
    assert(JsonBinary.decode(doc(j)) ==
      "[null,true,false,7,2147483647,9223372036854775807,18446744073709551615,\"x\"]")
  }

  test("large object inlines int32 in its 4-byte entries") {
    val j = JObj(Seq("big" -> JI32(123456789), "neg" -> JI32(-42)), large = true)
    assert(JsonBinary.decode(doc(j)) == """{"big":123456789,"neg":-42}""")
  }

  test("nested containers, empty containers") {
    val j = JObj(Seq(
      "k" -> JArr(Seq(JI16(1), JObj(Seq("m" -> JStr("v"))))),
      "z" -> JArr(Nil),
      "o" -> JObj(Nil)))
    assert(JsonBinary.decode(doc(j)) == """{"k":[1,{"m":"v"}],"z":[],"o":{}}""")
  }

  test("large array of strings (4-byte offsets)") {
    val items = (0 until 5).map(i => JStr(s"s$i"))
    val j = JArr(items, large = true)
    assert(JsonBinary.decode(doc(j)) == items.map(s => "\"" + s.s + "\"").mkString("[", ",", "]"))
  }

  test("opaque decimal decodes as a bare number") {
    // decimal(10,2) = 1234567.89, same BCD packing the row decoder uses
    val bcd = graft.sources.BinlogBytes.packDecimal10_2(1234567L, 89, negative = false)
    val payload = Array[Byte](10, 2) ++ bcd
    val j = JObj(Seq("price" -> JOpaque(0xf6, payload)))
    assert(JsonBinary.decode(doc(j)) == """{"price":1234567.89}""")
    val neg = Array[Byte](10, 2) ++ graft.sources.BinlogBytes.packDecimal10_2(1234567L, 89, negative = true)
    assert(JsonBinary.decode(doc(JOpaque(0xf6, neg))) == "-1234567.89")
  }

  test("opaque temporals: date, datetime with micros, negative time") {
    assert(JsonBinary.decode(doc(JOpaque(0x0a, packedDate(2024, 3, 5)))) == "\"2024-03-05\"")
    assert(JsonBinary.decode(doc(JOpaque(0x0c, packedDatetime(2024, 3, 5, 12, 34, 56, 789000L))))
      == "\"2024-03-05 12:34:56.789000\"")
    assert(JsonBinary.decode(doc(JOpaque(0x0c, packedDatetime(1999, 12, 31, 23, 59, 59, 0L))))
      == "\"1999-12-31 23:59:59\"")
    assert(JsonBinary.decode(doc(JOpaque(0x0b, packedTime(neg = true, 101, 2, 3, 0L))))
      == "\"-101:02:03\"")
  }

  test("unknown types fail loudly") {
    intercept[IllegalArgumentException](JsonBinary.decode(Array(0x17.toByte, 0, 0)))
    intercept[IllegalArgumentException](
      JsonBinary.decode(doc(JOpaque(0xff, Array[Byte](1, 2, 3)))))
  }

  test("property: random documents decode to the independent renderer's text") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // an independent canonical renderer over the same ADT — decode must
    // agree with it on arbitrary nesting, key shapes, and value widths
    def render(v: J): String = v match {
      case JNull => "null"
      case JTrue => "true"
      case JFalse => "false"
      case JI16(x) => x.toString
      case JU16(x) => x.toString
      case JI32(x) => x.toString
      case JU32(x) => x.toString
      case JI64(x) => x.toString
      case JU64(x) => java.lang.Long.toUnsignedString(x)
      case JDbl(x) => x.toString
      case JStr(s) => esc(s)
      case JObj(fs, _) => fs.map { case (k, x) => esc(k) + ":" + render(x) }.mkString("{", ",", "}")
      case JArr(xs, _) => xs.map(render).mkString("[", ",", "]")
      case JOpaque(_, _) => throw new IllegalArgumentException("not generated")
    }
    def esc(s: String): String = {
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b"); case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n"); case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"').toString
    }
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf('"', '\\', '\n', '\t', 'é', '中', '\u0001')
    )).map(_.mkString)
    val scalarGen: Gen[J] = Gen.oneOf(
      Gen.const(JNull), Gen.const(JTrue), Gen.const(JFalse),
      Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt).map(JI16(_)),
      Gen.chooseNum(0, 65535).map(JU16(_)),
      Gen.chooseNum(Int.MinValue, Int.MaxValue).map(JI32(_)),
      Gen.chooseNum(0L, 4294967295L).map(JU32(_)),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(JI64(_)),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(JU64(_)),
      Gen.chooseNum(-1e9, 1e9).map(JDbl(_)),
      strGen.map(JStr(_)))
    def jGen(depth: Int): Gen[J] =
      if (depth <= 0) scalarGen
      else Gen.frequency(
        4 -> scalarGen,
        2 -> (for {
          n <- Gen.chooseNum(0, 4)
          ks <- Gen.listOfN(n, strGen)
          vs <- Gen.listOfN(n, jGen(depth - 1))
          large <- Gen.oneOf(true, false)
          // JSONB keys are unique per object; dedupe preserving order
        } yield JObj(ks.zip(vs).distinctBy(_._1), large)),
        2 -> (for {
          n <- Gen.chooseNum(0, 5)
          vs <- Gen.listOfN(n, jGen(depth - 1))
          large <- Gen.oneOf(true, false)
        } yield JArr(vs, large)))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(jGen(3)) { j =>
        val bytes = doc(j)
        // the streaming sink and the DOM builder share one byte-walk;
        // this pins that the two sinks cannot drift apart anyway
        JsonBinary.decode(bytes) == render(j) &&
          JsonBinary.render(JsonBinary.decodeTree(bytes)) == render(j)
      })
    assert(res.passed, res.status.toString)
  }
}
