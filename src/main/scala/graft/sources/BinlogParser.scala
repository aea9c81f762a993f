package graft.sources

import java.nio.charset.StandardCharsets
import graft.model.{ChangeEvent, Op}

/** S1 core — a from-scratch decoder for the MySQL binary-log EVENT
  * FORMAT (binlog v4), the byte layer the reference consumes through
  * the go-mysql library (`driver/mysql/binlog/binlog_reader.go:450-496`
  * handleEvent receives already-decoded events; this module supplies
  * that decoding for byte streams — relay files, captured dumps, or a
  * future socket reader). The live replica handshake remains the only
  * missing piece of S1 in this sandbox; everything after the socket —
  * headers, checksums, GTID/QUERY/TABLE_MAP/ROWS/XID bodies, row
  * images, column-value decoding — is here, from the public binlog
  * format layout (MySQL internals docs), not copied code.
  *
  * Supported column types: all integer widths (TINY/SHORT/INT24/LONG/
  * LONGLONG), FLOAT/DOUBLE, NEWDECIMAL (packed BCD), VARCHAR, CHAR
  * (STRING), ENUM, SET, BIT, BLOB/TEXT (all four length widths), JSON
  * (JSONB storage decoded to canonical text by [[JsonBinary]]), DATE,
  * YEAR, DATETIME2/TIMESTAMP2/TIME2 (with fractional seconds).
  * Unsupported types fail loudly with the type byte — a silent wrong
  * decode is the one unacceptable outcome for a replication source.
  *
  * Text/blob values are emitted as ISO-8859-1-mangled strings (the
  * repo's lossless byte↔char carrier; see JobRunner.ddlBarrierHandler):
  * the C9 charset stage owns the real decode, driven by the
  * SchemaRegistry's column charsets — same division of labor as the
  * reference (raw bytes off the wire, ConvertArg at apply time).
  */
object BinlogParser {

  /** One framed event: v4 common header + body (checksum stripped). */
  final case class RawEvent(typeCode: Int, timestamp: Long, serverId: Long,
                            logPos: Long, flags: Int, body: Array[Byte])

  // event type codes (public binlog layout)
  val QUERY_EVENT = 0x02
  val ROTATE_EVENT = 0x04
  val FORMAT_DESCRIPTION_EVENT = 0x0f
  val XID_EVENT = 0x10
  val TABLE_MAP_EVENT = 0x13
  val WRITE_ROWS_V2 = 0x1e
  val UPDATE_ROWS_V2 = 0x1f
  val DELETE_ROWS_V2 = 0x20
  val GTID_EVENT = 0x21
  val PREVIOUS_GTIDS_EVENT = 0x23
  val PARTIAL_UPDATE_ROWS = 0x27 // MySQL 8 binlog_row_value_options=PARTIAL_JSON

  /** `value_options` bit: after-images may store JSON columns as diff
    * sequences against the before-image (public layout
    * `libbinlogevents/include/rows_event.h`).
    */
  private val OptPartialJson = 1

  private val Magic = Array[Byte](0xfe.toByte, 'b', 'i', 'n')

  /** Frame a binlog byte stream into events. The FDE's checksum
    * algorithm byte governs the whole file: with CRC32 on, every
    * event's last 4 body bytes are the checksum and are stripped here
    * (verification optional — a relay file you wrote yourself is the
    * main input; a wire reader should verify).
    */
  def splitEvents(bytes: Array[Byte], verifyCrc: Boolean = false): Seq[RawEvent] = {
    require(bytes.length >= 4 && bytes.take(4).sameElements(Magic),
      "not a binlog stream: bad magic")
    val out = Seq.newBuilder[RawEvent]
    var pos = 4
    var checksummed = false
    while (pos < bytes.length) {
      require(bytes.length - pos >= 19, s"truncated event header at $pos")
      val b = new Reader(bytes, pos)
      val ts = b.u32()
      val typeCode = b.u8()
      val serverId = b.u32()
      val eventSize = b.u32().toInt
      val logPos = b.u32()
      val flags = b.u16()
      require(eventSize >= 19 && pos + eventSize <= bytes.length,
        s"truncated event body at $pos (size=$eventSize)")
      var body = java.util.Arrays.copyOfRange(bytes, pos + 19, pos + eventSize)
      if (typeCode == FORMAT_DESCRIPTION_EVENT) {
        // alg byte sits 5 bytes from the end (alg u8 + CRC32 u32)
        checksummed = body.length >= 5 && body(body.length - 5) == 1
        if (checksummed) body = java.util.Arrays.copyOfRange(body, 0, body.length - 4)
      } else if (checksummed) {
        if (verifyCrc) {
          val crc = new java.util.zip.CRC32()
          crc.update(bytes, pos, eventSize - 4)
          val stored = new Reader(body, body.length - 4).u32()
          require(crc.getValue == stored,
            s"CRC mismatch for event type $typeCode at $pos")
        }
        body = java.util.Arrays.copyOfRange(body, 0, body.length - 4)
      }
      out += RawEvent(typeCode, ts, serverId, logPos, flags, body)
      pos += eventSize
    }
    out.result()
  }

  /** Table metadata from a TABLE_MAP event: the binlog carries types
    * and per-type metadata but NOT column names — names come from the
    * schema registry (the reference reads them from its sqle tracker /
    * information_schema at the same point, `binlog_reader.go:1406-1447`).
    */
  final case class TableMapEntry(db: String, table: String,
                                 types: Array[Int], metas: Array[Int])

  def parseTableMap(body: Array[Byte]): (Long, TableMapEntry) = {
    val r = new Reader(body, 0)
    val tableId = r.u48()
    r.skip(2) // flags
    val dbLen = r.u8(); val db = r.str(dbLen); r.skip(1)
    val tbLen = r.u8(); val table = r.str(tbLen); r.skip(1)
    val n = r.lenenc().toInt
    val types = Array.fill(n)(r.u8())
    r.lenenc() // metadata block length (we read per-type below)
    val metas = types.map {
      case 0x0f /*VARCHAR*/ => r.u16()
      case 0x04 | 0x05 /*FLOAT/DOUBLE*/ => r.u8()
      case 0xfc /*BLOB*/ | 0xf5 /*JSON: length-bytes count*/ => r.u8()
      case 0xf6 /*NEWDECIMAL*/ => { val p = r.u8(); val s = r.u8(); (p << 8) | s }
      case 0xfe | 0xf7 | 0xf8 /*STRING/ENUM/SET*/ => { val m0 = r.u8(); val m1 = r.u8(); (m0 << 8) | m1 }
      case 0x11 | 0x12 | 0x13 /*TIMESTAMP2/DATETIME2/TIME2*/ => r.u8()
      case 0x10 /*BIT: bits%8 then whole bytes*/ => r.u16()
      case _ => 0
    }
    (tableId, TableMapEntry(db, table, types, metas))
  }

  /** ROTATE event body → (next position, next binlog file name). A live
    * reader uses this to name the next relay segment and to carry the
    * (file, pos) coordinate pair across files.
    */
  def parseRotate(body: Array[Byte]): (Long, String) = {
    val r = new Reader(body, 0)
    val pos = r.i64()
    (pos, r.strToEnd())
  }

  /** PREVIOUS_GTIDS event body → the executed GTID set at the start of
    * this binlog file, in the same SID-block layout the dump command
    * sends (n_sids, then per sid: 16 bytes + n_intervals + [start, end)
    * pairs). Returned with INCLUSIVE interval ends to match
    * [[graft.functions.IntervalSet]] — a resuming reader checks its
    * ledger covers this set before trusting the file (reference resume
    * validation in go-mysql's sync startup).
    */
  def parsePreviousGtids(body: Array[Byte]): Seq[(String, Seq[(Long, Long)])] = {
    val r = new Reader(body, 0)
    val nSids = r.i64()
    (0L until nSids).map { _ =>
      val sid = r.bytes(16)
      val uuid = f"${hex(sid, 0, 4)}-${hex(sid, 4, 2)}-${hex(sid, 6, 2)}-${hex(sid, 8, 2)}-${hex(sid, 10, 6)}"
      val nIv = r.i64()
      uuid -> (0L until nIv).map { _ =>
        val lo = r.i64(); val hiExcl = r.i64()
        (lo, hiExcl - 1)
      }
    }
  }

  /** GTID event body → (sid-uuid, gno, lastCommitted, sequenceNumber). */
  def parseGtid(body: Array[Byte]): (String, Long, Long, Long) = {
    val r = new Reader(body, 0)
    r.skip(1) // commit flag
    val sid = r.bytes(16)
    val gno = r.i64()
    val uuid = f"${hex(sid, 0, 4)}-${hex(sid, 4, 2)}-${hex(sid, 6, 2)}-${hex(sid, 8, 2)}-${hex(sid, 10, 6)}"
    // logical-clock block: type byte (2) + last_committed + sequence_number
    if (r.remaining >= 17 && r.peekU8() == 2) {
      r.skip(1)
      val lc = r.i64(); val sn = r.i64()
      (uuid, gno, lc, sn)
    } else (uuid, gno, 0L, 0L)
  }

  /** QUERY event body → (schema, sql, character_set_client id). The
    * Q_CHARSET_CODE status var (0x04) carries the session charset the
    * C9 DDL decode needs (`binlog_reader.go:543-548`).
    */
  def parseQuery(body: Array[Byte]): (String, String, Int) = {
    val r = new Reader(body, 0)
    r.skip(4 + 4) // thread id, exec time
    val dbLen = r.u8()
    r.skip(2) // error code
    val statusLen = r.u16()
    val statusEnd = r.pos + statusLen
    var charsetClient = 0
    // the full status-var length table (MySQL log_event layout; the
    // reference walks the same codes in ParseQueryEventFlags,
    // `common/binlog.go`). Getting 0x03 right matters: it is
    // Q_AUTO_INCREMENT (4 fixed bytes, NOT a catalog string) and sorts
    // BEFORE Q_CHARSET — a session with non-default auto_increment
    // settings would otherwise derail the walk and lose the C9
    // charset (caught against the reference's raw hex vectors).
    while (r.pos < statusEnd) {
      r.u8() match {
        case 0x00 => r.skip(4)              // Q_FLAGS2
        case 0x01 => r.skip(8)              // Q_SQL_MODE
        case 0x02 => val l = r.u8(); r.skip(l + 1) // Q_CATALOG (nul-terminated)
        case 0x03 => r.skip(4)              // Q_AUTO_INCREMENT: increment u16, offset u16
        case 0x04 => charsetClient = r.u16(); r.skip(4) // Q_CHARSET: client, conn, server
        case 0x05 => val l = r.u8(); r.skip(l) // Q_TIME_ZONE
        case 0x06 => val l = r.u8(); r.skip(l) // Q_CATALOG_NZ (len+str, NO nul)
        case 0x07 => r.skip(2)              // Q_LC_TIME_NAMES
        case 0x08 => r.skip(2)              // Q_CHARSET_DATABASE
        case 0x09 => r.skip(8)              // Q_TABLE_MAP_FOR_UPDATE
        case 0x0a => r.skip(4)              // Q_MASTER_DATA_WRITTEN
        case 0x0b =>                        // Q_INVOKER: two len-prefixed strings
          val ul = r.u8(); r.skip(ul); val hl = r.u8(); r.skip(hl)
        case 0x0c =>                        // Q_UPDATED_DB_NAMES: count + nul-terminated names
          val n = r.u8()
          if (n < 254) {                    // 254 = OVER_MAX marker: no names follow
            var i = 0
            while (i < n && r.pos < statusEnd) {
              while (r.pos < statusEnd && r.u8() != 0) {}
              i += 1
            }
          }
        case 0x0d => r.skip(3)              // Q_MICROSECONDS
        case 0x11 => r.skip(1)              // Q_EXPLICIT_DEFAULTS_FOR_TIMESTAMP
        case 0x12 => r.skip(8)              // Q_DDL_LOGGED_WITH_XID
        case 0x13 => r.skip(2)              // Q_DEFAULT_COLLATION_FOR_UTF8MB4
        case 0x14 => r.skip(1)              // Q_SQL_REQUIRE_PRIMARY_KEY
        case 0x15 => r.skip(1)              // Q_DEFAULT_TABLE_ENCRYPTION
        case other => // unknown status var: cannot know its length — stop scanning
          r.seek(statusEnd)
      }
    }
    r.seek(statusEnd)
    val db = r.str(dbLen); r.skip(1)
    val sql = r.strToEnd()
    (db, sql, charsetClient)
  }

  /** binlog charset-id → MySQL charset name, for the C9 decode chain
    * (ids from the public collation table; only the charsets the C9
    * map knows are distinguished — everything else is passed through
    * as utf8mb4, the modern default).
    */
  def charsetName(id: Int): String = id match {
    case 8 | 5 | 15 | 31 | 47 | 48 | 49 | 94 => "latin1"
    case 9 | 2 | 21 | 27 | 77 => "latin2"
    case 28 | 87 => "gbk"
    case 24 | 86 => "gb2312"
    case 248 | 249 => "gb18030"
    case 54 | 55 | 101 => "utf16"
    case 56 | 62 => "utf16le"
    case 60 | 61 => "utf32"
    case 33 | 83 | 192 => "utf8"
    case _ => "utf8mb4"
  }

  /** One decoded row image: values by column ordinal (null = None). */
  type RowImage = IndexedSeq[Option[String]]

  /** ROWS v2 body → (tableId, images). UPDATE emits (before, after)
    * pairs flattened in order; WRITE/DELETE emit single images.
    *
    * PARTIAL_UPDATE_ROWS (0x27): each after-image is preceded by a
    * lenenc `value_options`; with the PARTIAL_JSON bit set a bitmap
    * follows — one bit per JSON column present in the after-image —
    * marking columns whose stored value is a [[JsonDiff]] sequence
    * against the paired before-image instead of full JSONB. The diffs
    * are applied HERE so every downstream consumer keeps seeing full
    * row images (the reference applier's contract).
    */
  def parseRows(body: Array[Byte], typeCode: Int,
                tm: Long => TableMapEntry): (Long, Seq[RowImage]) = {
    val isUpdate = typeCode == UPDATE_ROWS_V2 || typeCode == PARTIAL_UPDATE_ROWS
    val r = new Reader(body, 0)
    val tableId = r.u48()
    r.skip(2) // flags
    val extraLen = r.u16()
    r.skip(math.max(0, extraLen - 2))
    val n = r.lenenc().toInt
    val present1 = r.bitmap(n)
    val present2 = if (isUpdate) r.bitmap(n) else present1
    val entry = tm(tableId)
    require(entry != null, s"ROWS event for unmapped table id $tableId")
    val images = Seq.newBuilder[RowImage]
    var isAfter = false // alternates for UPDATE
    // before-image JSON DOMs by column ordinal — the base documents the
    // paired after-image's diffs patch (reset per row pair)
    var beforeJson = Map.empty[Int, JsonBinary.Jv]
    while (r.remaining > 0) {
      val present = if (isUpdate && isAfter) present2 else present1
      // one bit per JSON column IN THE TABLE, in definition order —
      // not per present column: with a MINIMAL/NOBLOB row image the
      // server still writes a bit for every JSON column, so sizing or
      // indexing by presence would shear the whole row parse
      val partialJson: IndexedSeq[Boolean] =
        if (typeCode == PARTIAL_UPDATE_ROWS && isAfter) {
          val valueOptions = r.lenenc()
          if ((valueOptions & OptPartialJson) != 0)
            r.bitmap(entry.types.count(_ == 0xf5))
          else IndexedSeq.empty
        } else IndexedSeq.empty
      val presentCount = present.count(identity)
      val nulls = r.bitmap(presentCount)
      val img = Array.fill[Option[String]](n)(None)
      var pi = 0
      var jsonOrdinal = 0
      var c = 0
      while (c < n) {
        val isJson = entry.types(c) == 0xf5
        if (present(c)) {
          if (!nulls(pi)) {
            if (isJson && typeCode == PARTIAL_UPDATE_ROWS) {
              val payload = r.bytes(blobLen(r, entry.metas(c)))
              if (!isAfter) {
                val tree = JsonBinary.decodeTree(payload)
                beforeJson += c -> tree
                img(c) = Some(JsonBinary.render(tree))
              } else if (jsonOrdinal < partialJson.length && partialJson(jsonOrdinal)) {
                val base = beforeJson.getOrElse(c, throw new IllegalStateException(
                  s"partial JSON diff for column $c with no before-image value " +
                    "(partial updates require the column in the before image)"))
                val patched = JsonDiff.applyDiffs(base, JsonDiff.readDiffs(payload))
                img(c) = Some(JsonBinary.render(patched))
              } else img(c) = Some(JsonBinary.decode(payload))
            } else img(c) = Some(decodeValue(r, entry.types(c), entry.metas(c)))
          }
          pi += 1
        }
        // the partial bit index advances for EVERY table JSON column,
        // present in this image or not (table-definition order)
        if (isJson && isAfter) jsonOrdinal += 1
        c += 1
      }
      images += img.toIndexedSeq
      if (isUpdate) {
        if (isAfter) beforeJson = Map.empty // next pair starts fresh
        isAfter = !isAfter
      }
    }
    (tableId, images.result())
  }

  /** BLOB-style length: `meta` little-endian length bytes. */
  private def blobLen(r: Reader, meta: Int): Int = {
    var len = 0L; var i = 0
    while (i < meta) { len |= r.u8().toLong << (8 * i); i += 1 }
    len.toInt
  }

  // ---- value decoding (public column storage formats) ----

  private def decodeValue(r: Reader, typ: Int, meta: Int): String = typ match {
    case 0x01 => r.i8().toString
    case 0x02 => r.i16().toString
    case 0x09 => r.i24().toString
    case 0x03 => r.i32().toString
    case 0x08 => r.i64().toString
    case 0x04 => java.lang.Float.intBitsToFloat(r.i32().toInt).toString
    case 0x05 => java.lang.Double.longBitsToDouble(r.i64()).toString
    case 0x0f => // VARCHAR: 1- or 2-byte length by declared max
      val len = if (meta < 256) r.u8() else r.u16()
      r.str(len)
    case 0xfe | 0xf7 | 0xf8 => // STRING meta packs (real type, length)
      val m0 = (meta >> 8) & 0xff; val m1 = meta & 0xff
      var realType = m0; var maxLen = m1
      if (m0 != 0 && (m0 & 0x30) != 0x30) {
        maxLen = m1 | (((m0 & 0x30) ^ 0x30) << 4)
        realType = m0 | 0x30
      }
      realType match {
        case 0xf7 /*ENUM*/ => (if (maxLen == 1) r.u8() else r.u16()).toString
        case 0xf8 /*SET*/  => // bitmask, maxLen bytes
          var v = 0L; var i = 0
          while (i < maxLen) { v |= r.u8().toLong << (8 * i); i += 1 }
          v.toString
        case _ => // CHAR
          val len = if (maxLen < 256) r.u8() else r.u16()
          r.str(len)
      }
    case 0xfc => // BLOB/TEXT: meta = number of length bytes
      r.str(blobLen(r, meta))
    case 0xf5 => // JSON: length like BLOB, payload = JSONB storage bytes.
      // Decoded to canonical JSON text HERE (not deferred to C9): JSON
      // is always utf8mb4, so the text is a real string, not a carrier.
      JsonBinary.decode(r.bytes(blobLen(r, meta)))
    case 0x10 => // BIT: meta = (bytes << 8) | bits%8, value big-endian
      val nbits = ((meta >> 8) & 0xff) * 8 + (meta & 0xff)
      java.lang.Long.toUnsignedString(r.beN((nbits + 7) / 8))
    case 0x0a => // DATE: u24 = day | month<<5 | year<<9
      val v = r.u24().toInt
      f"${v >> 9}%04d-${(v >> 5) & 0xf}%02d-${v & 0x1f}%02d"
    case 0x0d => // YEAR: byte + 1900 (0 = zero-year)
      val v = r.u8(); if (v == 0) "0" else (1900 + v).toString
    case 0x12 => // DATETIME2: 5B big-endian packed + fsp frac
      val p = r.beN(5) - 0x8000000000L
      val ymd = (p >> 17) & 0x1ffffL
      val ym = ymd >> 5
      val hms = p & 0x1ffffL
      val frac = readFrac(r, meta)
      f"${ym / 13}%04d-${ym % 13}%02d-${ymd & 0x1f}%02d " +
        f"${hms >> 12}%02d:${(hms >> 6) & 0x3f}%02d:${hms & 0x3f}%02d" + fracStr(frac, meta)
    case 0x11 => // TIMESTAMP2: 4B big-endian epoch seconds + frac
      val secs = r.beN(4)
      val frac = readFrac(r, meta)
      secs.toString + fracStr(frac, meta)
    case 0x13 => // TIME2: 3B big-endian, biased at 0x800000
      val p = r.beN(3) - 0x800000L
      val neg = p < 0
      val a = math.abs(p)
      val frac = readFrac(r, meta)
      (if (neg) "-" else "") +
        f"${(a >> 12) & 0x3ff}%02d:${(a >> 6) & 0x3f}%02d:${a & 0x3f}%02d" + fracStr(frac, meta)
    case 0xf6 => decodeNewDecimal(r, (meta >> 8) & 0xff, meta & 0xff)
    case other =>
      throw new IllegalArgumentException(
        f"unsupported binlog column type 0x$other%02x — extend BinlogParser.decodeValue")
  }

  private def readFrac(r: Reader, fsp: Int): Long = fsp match {
    case 1 | 2 => r.beN(1)
    case 3 | 4 => r.beN(2)
    case 5 | 6 => r.beN(3)
    case _ => 0L
  }
  private def fracStr(frac: Long, fsp: Int): String =
    if (fsp <= 0) "" else "." + ("%0" + ((fsp + 1) / 2 * 2) + "d").format(frac).take(fsp)

  /** NEWDECIMAL packed-BCD: digits in 9-digit groups of 4 bytes (plus a
    * shorter head/tail group), big-endian, sign = top bit of the first
    * byte (flipped; negative values are stored bitwise-inverted).
    */
  private val dig2bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)
  private[sources] def decodeNewDecimal(r: Reader, precision: Int, scale: Int): String = {
    val intg = precision - scale
    val intg0 = intg / 9; val intgx = intg % 9
    val frac0 = scale / 9; val fracx = scale % 9
    val binSize = intg0 * 4 + dig2bytes(intgx) + frac0 * 4 + dig2bytes(fracx)
    val raw = r.bytes(binSize)
    val negative = (raw(0) & 0x80) == 0
    raw(0) = (raw(0) ^ 0x80).toByte
    if (negative) { var i = 0; while (i < raw.length) { raw(i) = (~raw(i)).toByte; i += 1 } }
    var p = 0
    def group(nBytes: Int): Long = {
      var v = 0L; var i = 0
      while (i < nBytes) { v = (v << 8) | (raw(p + i) & 0xffL); i += 1 }
      p += nBytes; v
    }
    val sb = new StringBuilder
    if (negative) sb.append('-')
    if (intgx > 0) sb.append(group(dig2bytes(intgx)).toString)
    var i = 0
    while (i < intg0) {
      val g = group(4)
      if (sb.isEmpty || (negative && sb.length == 1)) sb.append(g.toString)
      else sb.append(f"$g%09d")
      i += 1
    }
    if (sb.isEmpty || (negative && sb.length == 1)) sb.append('0')
    if (scale > 0) {
      sb.append('.')
      i = 0
      while (i < frac0) { sb.append(f"${group(4)}%09d"); i += 1 }
      if (fracx > 0) sb.append(("%0" + fracx + "d").format(group(dig2bytes(fracx))))
    }
    sb.toString
  }

  private def hex(b: Array[Byte], off: Int, len: Int): String =
    b.slice(off, off + len).map(x => f"${x & 0xff}%02x").mkString

  /** The handleEvent state machine over a framed stream (reference
    * `binlog_reader.go:450-496`): GTID opens a transaction and pins the
    * logical clock, TABLE_MAP registers the row layout, ROWS events emit
    * one [[ChangeEvent]] per row image (before+after paired for
    * UPDATE), QUERY emits a DDL event with the statement decoded via
    * the session charset (C9, Q_CHARSET_CODE), XID emits the commit
    * marker [[graft.streaming.CdcPipeline.assembleTransactions]] closes
    * on. Column NAMES come from the registry (binlog carries none) —
    * unregistered tables fall back to positional `col_N` names.
    */
  def toChangeEvents(events: Seq[RawEvent],
                     registry: graft.ddl.SchemaRegistry): Seq[ChangeEvent] = {
    val out = Seq.newBuilder[ChangeEvent]
    val tables = scala.collection.mutable.Map.empty[Long, TableMapEntry]
    var gtid = ""; var lastCommitted = 0L; var seqNo = 0L
    def names(e: TableMapEntry): IndexedSeq[String] =
      registry.get(e.db, e.table) match {
        case Some(st) if st.fields.length == e.types.length => st.fieldNames.toIndexedSeq
        case _ => IndexedSeq.tabulate(e.types.length)(i => s"col_$i")
      }
    def rowMap(e: TableMapEntry, img: RowImage): Map[String, String] = {
      val ns = names(e)
      img.zipWithIndex.collect { case (Some(v), i) => ns(i) -> v }.toMap
    }
    events.foreach { ev =>
      ev.typeCode match {
        case GTID_EVENT =>
          val (sid, gno, lc, sn) = parseGtid(ev.body)
          gtid = s"$sid:$gno"; lastCommitted = lc; seqNo = sn
        case TABLE_MAP_EVENT =>
          val (id, entry) = parseTableMap(ev.body)
          tables(id) = entry
        case QUERY_EVENT =>
          val (db, sql, csId) = parseQuery(ev.body)
          val decoded = graft.functions.TypeConversions.ddlToUtf8(
            sql.getBytes(StandardCharsets.ISO_8859_1), charsetName(csId))
          if (!decoded.equalsIgnoreCase("BEGIN"))
            out += ChangeEvent(db, "", Op.Ddl, "", Map.empty, Map("sql" -> decoded),
              ev.timestamp * 1000, gtid, ev.logPos, lastCommitted, ev.serverId.toString)
        case WRITE_ROWS_V2 | DELETE_ROWS_V2 | UPDATE_ROWS_V2 | PARTIAL_UPDATE_ROWS =>
          val (tid, images) = parseRows(ev.body, ev.typeCode,
            id => tables.getOrElse(id, null))
          val e = tables(tid)
          val ns = names(e)
          def key(img: RowImage): String = img.headOption.flatten.getOrElse("")
          ev.typeCode match {
            case WRITE_ROWS_V2 => images.foreach { img =>
              out += ChangeEvent(e.db, e.table, Op.Insert, key(img),
                Map.empty, rowMap(e, img),
                ev.timestamp * 1000, gtid, ev.logPos, lastCommitted, ev.serverId.toString)
            }
            case DELETE_ROWS_V2 => images.foreach { img =>
              out += ChangeEvent(e.db, e.table, Op.Delete, key(img),
                rowMap(e, img), Map.empty,
                ev.timestamp * 1000, gtid, ev.logPos, lastCommitted, ev.serverId.toString)
            }
            case _ => images.grouped(2).foreach {
              case Seq(before, after) =>
                out += ChangeEvent(e.db, e.table, Op.Update, key(before),
                  rowMap(e, before), rowMap(e, after),
                  ev.timestamp * 1000, gtid, ev.logPos, lastCommitted, ev.serverId.toString)
              case other =>
                throw new IllegalStateException(
                  s"UPDATE_ROWS with odd image count (${other.length})")
            }
          }
        case XID_EVENT =>
          out += ChangeEvent("", "", "commit", "", Map.empty, Map.empty,
            ev.timestamp * 1000, gtid, ev.logPos, lastCommitted, ev.serverId.toString)
        case _ => // FDE / ROTATE / heartbeats: framing only
      }
    }
    out.result()
  }

  /** Decode a binlog file (e.g. a relay file the reference's disk-relay
    * mode writes, S10) straight to ChangeEvents — the bridge from raw
    * binlog bytes into [[CdcFileSource]]'s event frame: write the
    * result as the source's backing data and the whole S2→K pipeline
    * runs off real binlog bytes.
    */
  def readBinlogFile(path: String, registry: graft.ddl.SchemaRegistry,
                     verifyCrc: Boolean = true): Seq[ChangeEvent] =
    toChangeEvents(splitEvents(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), verifyCrc), registry)

  /** Little-endian byte reader over one event body. */
  private[sources] final class Reader(val buf: Array[Byte], var pos: Int) {
    def remaining: Int = buf.length - pos
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def peekU8(): Int = buf(pos) & 0xff
    def i8(): Int = { val v = buf(pos).toInt; pos += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def i16(): Int = u16().toShort.toInt
    def u24(): Long = u8().toLong | (u8().toLong << 8) | (u8().toLong << 16)
    def i24(): Int = { val v = u24().toInt; if ((v & 0x800000) != 0) v | 0xff000000 else v }
    def u32(): Long = u24() | (u8().toLong << 24)
    def i32(): Long = u32().toInt.toLong
    def u48(): Long = u32() | (u8().toLong << 32) | (u8().toLong << 40)
    def i64(): Long = u32() | (u32() << 32)
    def beN(n: Int): Long = { var v = 0L; var i = 0; while (i < n) { v = (v << 8) | (buf(pos + i) & 0xffL); i += 1 }; pos += n; v }
    def lenenc(): Long = u8() match {
      case v if v < 0xfb => v.toLong
      case 0xfc => u16().toLong
      case 0xfd => u24()
      case 0xfe => i64()
      case other => throw new IllegalArgumentException(s"bad lenenc prefix $other")
    }
    def bytes(n: Int): Array[Byte] = { val v = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; v }
    def str(n: Int): String = new String(bytes(n), StandardCharsets.ISO_8859_1)
    def strToEnd(): String = str(remaining)
    def skip(n: Int): Unit = pos += n
    def seek(p: Int): Unit = pos = p
    def bitmap(nBits: Int): IndexedSeq[Boolean] = {
      val bs = bytes((nBits + 7) / 8)
      IndexedSeq.tabulate(nBits)(i => (bs(i / 8) & (1 << (i % 8))) != 0)
    }
  }
}
