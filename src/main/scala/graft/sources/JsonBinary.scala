package graft.sources

import java.nio.charset.StandardCharsets

/** Decoder for MySQL's JSONB column storage — the binary format JSON
  * columns travel in inside ROWS events (public layout: MySQL source
  * `sql/json_binary.h`; the reference consumes it through go-mysql's
  * JSON decoder and forwards the text form to the applier). The binlog
  * carries the *storage* bytes, so a replication source must decode
  * them itself; this is the missing 0xf5 arm of
  * [[BinlogParser.decodeValue]].
  *
  * Format summary (all little-endian):
  *   - byte 0: type. 0x00/0x01 small/large object, 0x02/0x03 small/large
  *     array, 0x04 literal, 0x05 int16, 0x06 uint16, 0x07 int32,
  *     0x08 uint32, 0x09 int64, 0x0a uint64, 0x0b double, 0x0c utf8mb4
  *     string (varint length), 0x0f opaque (field-type byte + varint
  *     length + payload).
  *   - objects/arrays: element count + total size (2 bytes each when
  *     small, 4 when large), then key entries (objects only: offset +
  *     2-byte key length), then value entries (type byte + offset or
  *     inlined value), then the out-of-line payloads. Offsets count
  *     from the start of the count field. Literals and 16-bit ints are
  *     always inlined in the value entry; 32-bit ints are inlined only
  *     in the large format (4-byte entry field).
  *
  * ONE byte-walk serves two consumers through a small visitor:
  * [[decode]] streams straight into a StringBuilder (the hot CDC path
  * — every ordinary JSON column in every rows event, zero intermediate
  * allocation), and [[decodeTree]] builds the small [[Jv]] DOM that
  * MySQL 8 partial-JSON diffs ([[JsonDiff]]) patch structurally;
  * [[render]] serializes a DOM to the identical canonical text (no
  * whitespace, keys in stored order — MySQL stores them sorted by
  * length then bytes). Sharing the walk means the two outputs cannot
  * drift (also pinned by a differential test). Strings decode as real
  * UTF-8 — JSON columns are always utf8mb4, so unlike CHAR/TEXT they
  * do NOT ride the ISO-8859-1 carrier and the C9 transcode stage must
  * leave them alone (it does: JSON columns carry no charset tag in the
  * SchemaRegistry).
  *
  * Unknown types and opaque subtypes fail loudly, same policy as
  * [[BinlogParser]]: a silent wrong decode is unacceptable in a
  * replication source.
  */
object JsonBinary {

  /** Minimal JSON DOM. `VRaw` carries a verbatim token (numbers,
    * null/true/false, decimals) so rendering cannot re-format what the
    * storage already fixed; `VStr` is escaped+quoted at render time
    * (plain strings and opaque temporals alike).
    */
  sealed trait Jv
  final case class VRaw(token: String) extends Jv
  final case class VStr(s: String) extends Jv
  final case class VArr(items: Vector[Jv]) extends Jv
  final case class VObj(fields: Vector[(String, Jv)]) extends Jv

  /** Visitor the single byte-walk feeds; the two sinks below are the
    * streaming renderer and the DOM builder.
    */
  private trait Sink {
    def raw(token: String): Unit
    def str(s: String): Unit
    def beginContainer(isObj: Boolean): Unit
    def key(k: String): Unit
    def endContainer(isObj: Boolean): Unit
  }

  private final class TextSink extends Sink {
    val sb = new java.lang.StringBuilder
    private var needComma = List(false)
    private def element(): Unit = {
      if (needComma.head) sb.append(',')
      needComma = true :: needComma.tail
    }
    def raw(token: String): Unit = { element(); sb.append(token) }
    def str(s: String): Unit = { element(); appendJsonString(s, sb) }
    def beginContainer(isObj: Boolean): Unit = {
      element(); sb.append(if (isObj) '{' else '[')
      needComma = false :: needComma
    }
    def key(k: String): Unit = {
      if (needComma.head) sb.append(',')
      needComma = true :: needComma.tail
      appendJsonString(k, sb); sb.append(':')
      // the value call's element() must not re-emit the comma
      needComma = false :: needComma.tail
    }
    def endContainer(isObj: Boolean): Unit = {
      needComma = needComma.tail
      sb.append(if (isObj) '}' else ']')
    }
  }

  private final class TreeSink extends Sink {
    // each frame remembers the parent-object key it will be inserted
    // under (captured at beginContainer — the child's own key() calls
    // must not clobber it)
    private final case class Frame(isObj: Boolean, insertKey: String,
                                   buf: scala.collection.mutable.ArrayBuffer[(String, Jv)])
    private var stack: List[Frame] = Nil
    private var pendingKey: String = null
    private var rootResult: Jv = null
    private def push(v: Jv, k: String): Unit = stack match {
      case Nil => rootResult = v
      case f :: _ => f.buf += ((k, v))
    }
    def raw(token: String): Unit = { push(VRaw(token), pendingKey); pendingKey = null }
    def str(s: String): Unit = { push(VStr(s), pendingKey); pendingKey = null }
    def beginContainer(isObj: Boolean): Unit = {
      stack = Frame(isObj, pendingKey,
        scala.collection.mutable.ArrayBuffer.empty[(String, Jv)]) :: stack
      pendingKey = null
    }
    def key(k: String): Unit = pendingKey = k
    def endContainer(isObj: Boolean): Unit = {
      val f = stack.head
      stack = stack.tail
      val v = if (f.isObj) VObj(f.buf.toVector) else VArr(f.buf.map(_._2).toVector)
      push(v, f.insertKey)
    }
    def result: Jv = rootResult
  }

  def decode(data: Array[Byte]): String = {
    if (data.isEmpty) return "null" // empty value = SQL null payload
    val s = new TextSink
    walk(data, data(0) & 0xff, 1, s)
    s.sb.toString
  }

  def decodeTree(data: Array[Byte]): Jv = {
    if (data.isEmpty) return VRaw("null")
    val s = new TreeSink
    walk(data, data(0) & 0xff, 1, s)
    s.result
  }

  def render(v: Jv): String = {
    val sb = new java.lang.StringBuilder
    renderTo(v, sb)
    sb.toString
  }

  private def renderTo(v: Jv, sb: java.lang.StringBuilder): Unit = v match {
    case VRaw(t) => sb.append(t)
    case VStr(s) => appendJsonString(s, sb)
    case VArr(items) =>
      sb.append('[')
      var i = 0
      while (i < items.length) {
        if (i > 0) sb.append(',')
        renderTo(items(i), sb)
        i += 1
      }
      sb.append(']')
    case VObj(fields) =>
      sb.append('{')
      var i = 0
      while (i < fields.length) {
        if (i > 0) sb.append(',')
        appendJsonString(fields(i)._1, sb)
        sb.append(':')
        renderTo(fields(i)._2, sb)
        i += 1
      }
      sb.append('}')
  }

  // ---- fixed-width little-endian reads ----
  private def u16(b: Array[Byte], p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def i16(b: Array[Byte], p: Int): Int = u16(b, p).toShort.toInt
  private def u32(b: Array[Byte], p: Int): Long =
    (u16(b, p).toLong | (u16(b, p + 2).toLong << 16)) & 0xffffffffL
  private def i32(b: Array[Byte], p: Int): Int = u32(b, p).toInt
  private def i64(b: Array[Byte], p: Int): Long = u32(b, p) | (u32(b, p + 4) << 32)

  /** Variable-length size: 7 bits per byte, high bit = continuation. */
  private def varlen(b: Array[Byte], p: Int): (Int, Int) = {
    var len = 0L; var shift = 0; var pos = p
    while (true) {
      val v = b(pos) & 0xff
      len |= (v & 0x7f).toLong << shift
      pos += 1
      if ((v & 0x80) == 0) return (len.toInt, pos)
      shift += 7
    }
    throw new IllegalStateException("unreachable")
  }

  private def walk(b: Array[Byte], typ: Int, pos: Int, s: Sink): Unit = typ match {
    case 0x00 => container(b, pos, small = true, isObj = true, s)
    case 0x01 => container(b, pos, small = false, isObj = true, s)
    case 0x02 => container(b, pos, small = true, isObj = false, s)
    case 0x03 => container(b, pos, small = false, isObj = false, s)
    case 0x04 => s.raw((b(pos) & 0xff) match {
      case 0x00 => "null"
      case 0x01 => "true"
      case 0x02 => "false"
      case other => throw new IllegalArgumentException(s"bad JSONB literal $other")
    })
    case 0x05 => s.raw(i16(b, pos).toString)
    case 0x06 => s.raw(u16(b, pos).toString)
    case 0x07 => s.raw(i32(b, pos).toString)
    case 0x08 => s.raw(u32(b, pos).toString)
    case 0x09 => s.raw(i64(b, pos).toString)
    case 0x0a => s.raw(java.lang.Long.toUnsignedString(i64(b, pos)))
    case 0x0b =>
      // whole doubles keep Java's shortest round-trip repr (see the
      // canonical-text contract in the scaladoc)
      s.raw(java.lang.Double.longBitsToDouble(i64(b, pos)).toString)
    case 0x0c =>
      val (len, p2) = varlen(b, pos)
      s.str(new String(b, p2, len, StandardCharsets.UTF_8))
    case 0x0f => opaque(b, pos, s)
    case other =>
      throw new IllegalArgumentException(f"unsupported JSONB type 0x$other%02x")
  }

  private def container(b: Array[Byte], pos: Int, small: Boolean, isObj: Boolean,
                        s: Sink): Unit = {
    val w = if (small) 2 else 4
    def field(p: Int): Int = if (small) u16(b, p) else i32(b, p)
    val count = field(pos)
    // size field at pos + w is only needed for bounds checks; offsets
    // below are self-describing
    val keyEntries = pos + 2 * w
    val valueEntries = keyEntries + (if (isObj) count * (w + 2) else 0)
    s.beginContainer(isObj)
    var i = 0
    while (i < count) {
      if (isObj) {
        val ke = keyEntries + i * (w + 2)
        val keyOff = field(ke)
        val keyLen = u16(b, ke + w)
        s.key(new String(b, pos + keyOff, keyLen, StandardCharsets.UTF_8))
      }
      val ve = valueEntries + i * (1 + w)
      val vtyp = b(ve) & 0xff
      val inlined = vtyp match {
        case 0x04 | 0x05 | 0x06 => true // literal / int16 / uint16
        case 0x07 | 0x08 => !small      // int32 / uint32 fit a 4-byte entry
        case _ => false
      }
      if (inlined) walk(b, vtyp, ve + 1, s)
      else walk(b, vtyp, pos + field(ve + 1), s)
      i += 1
    }
    s.endContainer(isObj)
  }

  /** Opaque scalar: MYSQL field-type byte + varint length + payload.
    * DECIMAL emits as a bare number; DATE/TIME/DATETIME decode the
    * packed-longlong temporal form (TIME_to_longlong_packed layout:
    * `((ymd << 17 | hms) << 24) | microseconds`) and emit quoted.
    */
  private def opaque(b: Array[Byte], pos: Int, s: Sink): Unit = {
    val fieldType = b(pos) & 0xff
    val (len, p2) = varlen(b, pos + 1)
    fieldType match {
      case 0xf6 => // NEWDECIMAL: precision u8 + scale u8 + packed BCD
        val precision = b(p2) & 0xff
        val scale = b(p2 + 1) & 0xff
        val r = new BinlogParser.Reader(b, p2 + 2)
        s.raw(BinlogParser.decodeNewDecimal(r, precision, scale))
      case 0x0a | 0x0c | 0x07 | 0x0b => // DATE / DATETIME / TIMESTAMP / TIME
        val packedRaw = i64(b, p2)
        val neg = packedRaw < 0
        val packed = math.abs(packedRaw)
        val micros = packed & 0xffffffL
        val ymdhms = packed >> 24
        // TIME has no date part: the whole upper field is hms (hour can
        // exceed 5 bits, up to 838); DATE/DATETIME split at bit 17
        val hms = if (fieldType == 0x0b) ymdhms else ymdhms & 0x1ffffL
        val h = hms >> 12; val mi = (hms >> 6) & 0x3f; val sec = hms & 0x3f
        val frac = if (micros != 0) f".$micros%06d" else ""
        val sb = new java.lang.StringBuilder
        if (fieldType == 0x0b) { // TIME
          if (neg) sb.append('-')
          sb.append(f"$h%02d:$mi%02d:$sec%02d$frac")
        } else {
          val ymd = ymdhms >> 17
          val ym = ymd >> 5
          sb.append(f"${ym / 13}%04d-${ym % 13}%02d-${ymd & 0x1f}%02d")
          if (fieldType != 0x0a) sb.append(f" $h%02d:$mi%02d:$sec%02d$frac")
        }
        s.str(sb.toString)
      case other =>
        throw new IllegalArgumentException(
          f"unsupported JSONB opaque field type 0x$other%02x (len=$len)")
    }
  }

  /** RFC 8259 string escape — shared by the JSONB renderer and the WAT
    * envelope writer ([[WarcIo.toWat]]) so the two cannot drift.
    */
  private[sources] def appendJsonString(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case ctrl if ctrl < 0x20 => sb.append(f"\\u${ctrl.toInt}%04x")
        case other => sb.append(other)
      }
      i += 1
    }
    sb.append('"')
  }
}
