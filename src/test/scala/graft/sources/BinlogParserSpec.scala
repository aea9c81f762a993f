package graft.sources

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Op

/** S1 byte layer: the spec builds spec-compliant binlog v4 byte streams
  * with an independent little encoder (components → packed forms by the
  * public layout) and asserts the parser recovers the original values —
  * including the packed types (DATE, DATETIME2, NEWDECIMAL BCD), CRC32
  * stripping/verification, the Q_CHARSET_CODE status var, and the
  * handleEvent mapping into ChangeEvents.
  */
object BinlogBytes {
  import BinlogParser._

  final class W {
    val b = ArrayBuffer.empty[Byte]
    def u8(v: Int): W = { b += (v & 0xff).toByte; this }
    def u16(v: Int): W = { u8(v); u8(v >> 8); this }
    def u24(v: Int): W = { u8(v); u8(v >> 8); u8(v >> 16); this }
    def u32(v: Long): W = { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt); this }
    def u48(v: Long): W = { u32(v); u8((v >> 32).toInt); u8((v >> 40).toInt); this }
    def i64(v: Long): W = { u32(v); u32(v >>> 32); this }
    def beN(v: Long, n: Int): W = { var i = n - 1; while (i >= 0) { u8(((v >> (8 * i)) & 0xff).toInt); i -= 1 }; this }
    def raw(bs: Array[Byte]): W = { b ++= bs; this }
    def str(s: String): W = raw(s.getBytes(StandardCharsets.ISO_8859_1))
    def lenenc(v: Long): W = if (v < 0xfb) u8(v.toInt) else { u8(0xfc); u16(v.toInt) }
    def result: Array[Byte] = b.toArray
  }

  /** One framed event with CRC32 (header fields + body, crc appended). */
  def event(typeCode: Int, body: Array[Byte], logPos: Long, serverId: Long = 7L,
            ts: Long = 1700000000L): Array[Byte] = {
    val size = 19 + body.length + 4
    val h = new W().u32(ts).u8(typeCode).u32(serverId).u32(size).u32(logPos).u16(0)
    val crc = new java.util.zip.CRC32()
    crc.update(h.result); crc.update(body)
    new W().raw(h.result).raw(body).u32(crc.getValue).result
  }

  def fde(): Array[Byte] = {
    val core = new W().u16(4).raw(Array.fill[Byte](50)(0)).u32(0).u8(19)
      .raw(Array.fill[Byte](39)(1)) // post-header length table (content unused)
      .u8(1) // checksum alg = CRC32
    // FDE's own CRC covers header + body-minus-crc; build like event()
    val bodyNoCrc = core.result
    val size = 19 + bodyNoCrc.length + 4
    val h = new W().u32(1700000000L).u8(FORMAT_DESCRIPTION_EVENT).u32(7L).u32(size).u32(size + 4).u16(0)
    val crc = new java.util.zip.CRC32()
    crc.update(h.result); crc.update(bodyNoCrc)
    new W().raw(h.result).raw(bodyNoCrc).u32(crc.getValue).result
  }

  def gtid(sid: Array[Byte], gno: Long, lastCommitted: Long, seqNo: Long): Array[Byte] =
    new W().u8(1).raw(sid).i64(gno).u8(2).i64(lastCommitted).i64(seqNo).result

  /** QUERY with Q_CHARSET_CODE status var. */
  def query(db: String, sql: String, charsetClient: Int): Array[Byte] = {
    val status = new W().u8(0x04).u16(charsetClient).u16(45).u16(45).result
    new W().u32(99).u32(0).u8(db.length).u16(0).u16(status.length)
      .raw(status).str(db).u8(0).str(sql).result
  }

  def tableMap(tableId: Long, db: String, table: String,
               types: Seq[Int], metaBytes: Array[Byte]): Array[Byte] = {
    val w = new W().u48(tableId).u16(1).u8(db.length).str(db).u8(0)
      .u8(table.length).str(table).u8(0).lenenc(types.length)
    types.foreach(w.u8)
    w.lenenc(metaBytes.length).raw(metaBytes)
    w.raw(Array.fill[Byte]((types.length + 7) / 8)(0)) // nullability bits (unused)
    w.result
  }

  /** ROWS v2 body from pre-encoded row images. */
  def rows(tableId: Long, nCols: Int, images: Seq[Array[Byte]]): Array[Byte] = {
    val w = new W().u48(tableId).u16(0).u16(2).lenenc(nCols)
    w.u8((1 << nCols) - 1) // all columns present (nCols <= 8 in tests)
    images.foreach(w.raw)
    w.result
  }
  def rowsUpdate(tableId: Long, nCols: Int, images: Seq[Array[Byte]]): Array[Byte] = {
    val w = new W().u48(tableId).u16(0).u16(2).lenenc(nCols)
    w.u8((1 << nCols) - 1); w.u8((1 << nCols) - 1)
    images.foreach(w.raw)
    w.result
  }

  def xid(v: Long): Array[Byte] = new W().i64(v).result

  // packed-form encoders (independent arithmetic, per the public layout)
  def packDate(y: Int, m: Int, d: Int): Array[Byte] = new W().u24((y << 9) | (m << 5) | d).result
  def packDatetime2(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int): Array[Byte] = {
    val ym = y * 13 + mo
    val packed = 0x8000000000L + ((ym.toLong << 5 | d) << 17) + (h << 12 | mi << 6 | s)
    new W().beN(packed, 5).result
  }
  /** decimal(10,2): intg=8 → one 4-byte group; frac 2 digits → 1 byte. */
  def packDecimal10_2(intPart: Long, fracPart: Int, negative: Boolean): Array[Byte] = {
    val pos = new W().beN(intPart, 4).u8(fracPart).result
    pos(0) = (pos(0) | 0x80).toByte
    if (negative) pos.map(b => (~b).toByte) else pos
  }

  def file(events: Array[Byte]*): Array[Byte] =
    (Array[Byte](0xfe.toByte, 'b', 'i', 'n') +: events).reduce(_ ++ _)
}

class BinlogParserSpec extends AnyFunSuite {
  import BinlogBytes._
  import BinlogParser._

  test("query-event status vars: the reference's raw hex vectors walk cleanly") {
    // the two capture blobs from the reference's ParseQueryEventFlags
    // test (`common/binlog_test.go:18-20`) — real-server status-var
    // blocks with Q_AUTO_INCREMENT (4 fixed bytes sorting BEFORE
    // Q_CHARSET), Q_CATALOG_NZ (no nul), Q_UPDATED_DB_NAMES, and the
    // 0xfe OVER_MAX db-count marker
    def body(statusHex: String, db: String, sql: String): Array[Byte] = {
      val status = statusHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      val bb = new java.io.ByteArrayOutputStream()
      bb.write(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)) // thread id + exec time
      bb.write(db.length)                            // db len
      bb.write(Array[Byte](0, 0))                    // error code
      bb.write(status.length & 0xff); bb.write((status.length >> 8) & 0xff)
      bb.write(status)
      bb.write(db.getBytes("US-ASCII")); bb.write(0)
      bb.write(sql.getBytes("US-ASCII"))
      bb.toByteArray
    }
    val bs1 = "0000000000012000a0550000000006037374640302000100042d002d002d000c01706d5f69616d5f6964656e746974795f6462001000"
    val bs2 = "0000000000012000a055000000000603737464042d002d0008000cfe"
    val (db1, sql1, cs1) = parseQuery(body(bs1, "d1", "CREATE TABLE t (id INT)"))
    assert(db1 == "d1" && sql1 == "CREATE TABLE t (id INT)")
    assert(cs1 == 45 && charsetName(cs1) == "utf8mb4") // reference golden
    val (db2, sql2, cs2) = parseQuery(body(bs2, "d2", "DROP TABLE t"))
    assert(db2 == "d2" && sql2 == "DROP TABLE t")
    assert(cs2 == 45 && charsetName(cs2) == "utf8mb4")
  }

  private val sid = Array.tabulate[Byte](16)(i => (i + 1).toByte)
  private val cp1252 = java.nio.charset.Charset.forName("windows-1252")

  // table: id INT, name VARCHAR(20), big BIGINT, d DATE, dec DECIMAL(10,2), t TINYINT
  private val types = Seq(0x03, 0x0f, 0x08, 0x0a, 0xf6, 0x01)
  private val metas = new W().u16(20).u8(10).u8(2).result // varchar max=20; decimal(10,2)

  private def img(id: Long, name: Option[String], big: Long,
                  date: Array[Byte], dec: Array[Byte], tiny: Int): Array[Byte] = {
    val w = new W()
    w.u8(if (name.isEmpty) 0x02 else 0x00) // null bitmap: bit1 = name
    w.u32(id)
    name.foreach { n => val bs = n.getBytes(cp1252); w.u8(bs.length).raw(bs) }
    w.i64(big); w.raw(date); w.raw(dec); w.u8(tiny & 0xff)
    w.result
  }

  private def fixture(): Array[Byte] = {
    val tm = tableMap(23L, "src", "t", types, metas)
    val row1 = img(1L, Some("café"), 123456789012L, packDate(2024, 3, 5),
      packDecimal10_2(1234567L, 89, negative = false), -5)
    val row2 = img(2L, None, -1L, packDate(1999, 12, 31),
      packDecimal10_2(1234567L, 89, negative = true), 127)
    val row1b = img(1L, Some("carol"), 123456789012L, packDate(2024, 3, 5),
      packDecimal10_2(1234567L, 89, negative = false), -5)
    file(
      fde(),
      event(GTID_EVENT, gtid(sid, 42L, 7L, 8L), 100),
      event(QUERY_EVENT, query("src", "BEGIN", 8), 110),
      event(TABLE_MAP_EVENT, tm, 120),
      event(WRITE_ROWS_V2, rows(23L, 6, Seq(row1, row2)), 130),
      event(UPDATE_ROWS_V2, rowsUpdate(23L, 6, Seq(row1, row1b)), 140),
      event(DELETE_ROWS_V2, rows(23L, 6, Seq(row2)), 150),
      event(XID_EVENT, xid(77L), 160),
      event(GTID_EVENT, gtid(sid, 43L, 8L, 9L), 200),
      event(QUERY_EVENT,
        query("src", new String("ALTER TABLE t COMMENT '€9.99'".getBytes(cp1252),
          StandardCharsets.ISO_8859_1), 8), 210),
      event(XID_EVENT, xid(78L), 220))
  }

  test("framing: magic, headers, CRC32 strip + verify") {
    val evs = splitEvents(fixture(), verifyCrc = true)
    assert(evs.map(_.typeCode) == Seq(FORMAT_DESCRIPTION_EVENT, GTID_EVENT, QUERY_EVENT,
      TABLE_MAP_EVENT, WRITE_ROWS_V2, UPDATE_ROWS_V2, DELETE_ROWS_V2, XID_EVENT,
      GTID_EVENT, QUERY_EVENT, XID_EVENT))
    // corrupting a byte must fail CRC verification
    val bad = fixture(); bad(bad.length - 10) = (bad(bad.length - 10) ^ 0x1).toByte
    intercept[IllegalArgumentException](splitEvents(bad, verifyCrc = true))
  }

  test("value decode goldens: ints, varchar bytes, DATE, NEWDECIMAL, TINY") {
    val reg = new graft.ddl.SchemaRegistry
    reg.applyDdl("src",
      "CREATE TABLE t (id INT, name VARCHAR(20) CHARSET latin1, big BIGINT, d DATE, dec DECIMAL(10,2), t TINYINT)")
    val ces = BinlogParser.toChangeEvents(splitEvents(fixture()), reg)
    val ins = ces.filter(_.op == Op.Insert)
    assert(ins.length == 2)
    val r1 = ins.head.after
    assert(r1("id") == "1" && r1("big") == "123456789012" && r1("t") == "-5")
    assert(r1("d") == "2024-03-05")
    assert(r1("dec") == "1234567.89")
    // raw cp1252 bytes ride the ISO-8859-1 carrier; C9 decodes them
    assert(new String(r1("name").getBytes(StandardCharsets.ISO_8859_1), cp1252) == "café")
    val r2 = ins(1).after
    assert(!r2.contains("name")) // NULL column absent from the map
    assert(r2("big") == "-1" && r2("d") == "1999-12-31" && r2("dec") == "-1234567.89" && r2("t") == "127")
  }

  test("handleEvent mapping: tx boundaries, update pairing, DDL charset decode") {
    val reg = new graft.ddl.SchemaRegistry
    val ces = BinlogParser.toChangeEvents(splitEvents(fixture()), reg)
    // first tx: 2 inserts + 1 update + 1 delete + commit, gtid :42
    val tx1 = ces.filter(_.gtid.endsWith(":42"))
    assert(tx1.map(_.op) == Seq("c", "c", "u", "d", "commit"))
    assert(tx1.forall(_.lastCommitted == 7L))
    val sidHex = "01020304-0506-0708-090a-0b0c0d0e0f10"
    assert(tx1.head.gtid == s"$sidHex:42")
    val up = tx1.find(_.op == "u").get
    // unregistered table → positional names; before/after pair split
    assert(up.before("col_1") != up.after("col_1"))
    // second tx: the DDL, decoded via Q_CHARSET_CODE (latin1 id 8 → cp1252)
    val ddl = ces.find(_.op == Op.Ddl).get
    assert(ddl.after("sql").contains("€9.99"))
    assert(ddl.db == "src" && ddl.gtid == s"$sidHex:43")
  }

  test("JSON and BIT columns decode inside a ROWS event") {
    import JsonbBytes._
    // table: id INT, j JSON (meta = 4 length bytes), b BIT(12)
    val jTypes = Seq(0x03, 0xf5, 0x10)
    val jMetas = new W().u8(4).u8(12 % 8).u8(12 / 8).result
    val jsonDoc = JsonbBytes.doc(JObj(Seq(
      "k" -> JArr(Seq(JI16(1), JStr("v"))), "n" -> JNull)))
    val rowImg = {
      val w = new W()
      w.u8(0x00) // no nulls
      w.u32(9L)
      w.u32(jsonDoc.length.toLong).raw(jsonDoc) // 4-byte length + JSONB
      w.u8(0x0a).u8(0xbc) // BIT(12) big-endian: 0x0abc = 2748
      w.result
    }
    val stream = file(
      fde(),
      event(GTID_EVENT, gtid(sid, 50L, 1L, 2L), 300),
      event(TABLE_MAP_EVENT, tableMap(31L, "src", "tj", jTypes, jMetas), 310),
      event(WRITE_ROWS_V2, rows(31L, 3, Seq(rowImg)), 320),
      event(XID_EVENT, xid(99L), 330))
    val reg = new graft.ddl.SchemaRegistry
    val ces = BinlogParser.toChangeEvents(splitEvents(stream, verifyCrc = true), reg)
    val ins = ces.find(_.op == Op.Insert).get
    assert(ins.after("col_0") == "9")
    assert(ins.after("col_1") == """{"k":[1,"v"],"n":null}""")
    assert(ins.after("col_2") == "2748")
  }

  test("ROTATE and PREVIOUS_GTIDS decode: file handoff + resume set") {
    val rot = new W().i64(4L).str("mysql-bin.000042").result
    assert(BinlogParser.parseRotate(rot) == (4L, "mysql-bin.000042"))
    // PREVIOUS_GTIDS uses the protocol's end-exclusive pairs; the parser
    // returns the inclusive form IntervalSet speaks. Round-trip via the
    // dump command's encoder layout.
    val body = new W()
      .i64(1L).raw(sid).i64(2L)
      .i64(1L).i64(6L)  // [1,6) -> [1,5]
      .i64(7L).i64(8L)  // [7,8) -> [7,7]
      .result
    val got = BinlogParser.parsePreviousGtids(body)
    assert(got == Seq("01020304-0506-0708-090a-0b0c0d0e0f10" -> Seq((1L, 5L), (7L, 7L))))
    // and it agrees with the repo's interval algebra text form
    val set = graft.functions.IntervalSet(got.head._2.toList)
    assert(set.render == "1-5:7")
  }

  test("PARTIAL_UPDATE_ROWS: JSON diffs patch the before image; full columns untouched") {
    import JsonbBytes.{JArr, JI16, JObj, JStr}
    // table: id INT, j JSON (meta = 4 length bytes, the server default)
    val entry = TableMapEntry("db", "t", Array(0x03, 0xf5), Array(0, 4))
    val beforeDoc = JsonbBytes.doc(JObj(Seq(
      "a" -> JI16(1), "b" -> JStr("x"),
      "cc" -> JArr(Seq(JI16(1), JI16(2), JI16(3))))))
    // diff sequence: REPLACE $.b=42, REMOVE $.cc[1], INSERT $.ab="new"
    val v42 = JsonbBytes.doc(JI16(42)); val vNew = JsonbBytes.doc(JStr("new"))
    val diffs = new W()
      .u8(0).lenenc(3).str("$.b").lenenc(v42.length).raw(v42)
      .u8(2).lenenc(7).str("$.cc[1]")
      .u8(1).lenenc(4).str("$.ab").lenenc(vNew.length).raw(vNew)
      .result
    val body = new W().u48(9L).u16(0).u16(2).lenenc(2)
      .u8(0x03).u8(0x03) // before + after present bitmaps (both cols)
      // before image: no nulls, id=7, full JSONB
      .u8(0).u32(7L).u32(beforeDoc.length).raw(beforeDoc)
      // after image: value_options=PARTIAL_JSON, partial bit set for
      // the one JSON column, no nulls, id=7, diff-sequence value
      .u8(1).u8(0x01)
      .u8(0).u32(7L).u32(diffs.length).raw(diffs)
      .result
    val (tid, images) = BinlogParser.parseRows(body, PARTIAL_UPDATE_ROWS, _ => entry)
    assert(tid == 9L && images.length == 2)
    assert(images(0)(1).get == """{"a":1,"b":"x","cc":[1,2,3]}""")
    assert(images(1)(0).get == "7")
    assert(images(1)(1).get == """{"a":1,"b":42,"ab":"new","cc":[1,3]}""")
  }

  test("PARTIAL_UPDATE_ROWS: clear partial bit means a full JSONB after-image") {
    import JsonbBytes.{JI16, JObj}
    val entry = TableMapEntry("db", "t", Array(0x03, 0xf5), Array(0, 4))
    val before = JsonbBytes.doc(JObj(Seq("a" -> JI16(1))))
    val after = JsonbBytes.doc(JObj(Seq("a" -> JI16(2))))
    val body = new W().u48(9L).u16(0).u16(2).lenenc(2)
      .u8(0x03).u8(0x03)
      .u8(0).u32(7L).u32(before.length).raw(before)
      .u8(1).u8(0x00) // PARTIAL_JSON on, but this column's bit is clear
      .u8(0).u32(7L).u32(after.length).raw(after)
      .result
    val (_, images) = BinlogParser.parseRows(body, PARTIAL_UPDATE_ROWS, _ => entry)
    assert(images(1)(1).get == """{"a":2}""")
    // and an EMPTY diff sequence with the bit set = unchanged column
    val body2 = new W().u48(9L).u16(0).u16(2).lenenc(2)
      .u8(0x03).u8(0x03)
      .u8(0).u32(7L).u32(before.length).raw(before)
      .u8(1).u8(0x01)
      .u8(0).u32(7L).u32(0L) // zero-length diff payload
      .result
    val (_, images2) = BinlogParser.parseRows(body2, PARTIAL_UPDATE_ROWS, _ => entry)
    assert(images2(1)(1).get == """{"a":1}""")
  }

  test("PARTIAL_UPDATE_ROWS: partial bits index by TABLE JSON order, not presence") {
    import JsonbBytes.{JI16, JObj}
    // table: id INT, j1 JSON, j2 JSON — minimal-style after image
    // carries only (id, j2); the partial bitmap still has one bit per
    // TABLE JSON column, so j2's bit is bit 1
    val entry = TableMapEntry("db", "t", Array(0x03, 0xf5, 0xf5), Array(0, 4, 4))
    val j1 = JsonbBytes.doc(JObj(Seq("a" -> JI16(1))))
    val j2 = JsonbBytes.doc(JObj(Seq("b" -> JI16(5))))
    val v9 = JsonbBytes.doc(JI16(9))
    val diffs = new W().u8(0).lenenc(3).str("$.b").lenenc(v9.length).raw(v9).result
    val body = new W().u48(9L).u16(0).u16(2).lenenc(3)
      .u8(0x07)          // before: all three columns present
      .u8(0x05)          // after: id + j2 only (bits 0 and 2)
      // before image
      .u8(0).u32(7L).u32(j1.length).raw(j1).u32(j2.length).raw(j2)
      // after image: PARTIAL_JSON on; table has 2 JSON cols -> 1 bitmap
      // byte; j2 is JSON ordinal 1 -> bit 0x02 (bit 0 covers absent j1)
      .u8(1).u8(0x02)
      .u8(0).u32(7L).u32(diffs.length).raw(diffs)
      .result
    val (_, images) = BinlogParser.parseRows(body, PARTIAL_UPDATE_ROWS, _ => entry)
    assert(images(0)(1).get == """{"a":1}""" && images(0)(2).get == """{"b":5}""")
    assert(images(1)(1).isEmpty, "j1 absent from the minimal after image")
    assert(images(1)(2).get == """{"b":9}""")
  }

  test("decoded stream drives S2 transaction assembly end-to-end") {
    // the commit marker and gtid grouping line up with
    // CdcPipeline.assembleTransactions' contract
    val reg = new graft.ddl.SchemaRegistry
    val ces = BinlogParser.toChangeEvents(splitEvents(fixture()), reg)
    val byGtid = ces.groupBy(_.gtid)
    val tx1 = byGtid("01020304-0506-0708-090a-0b0c0d0e0f10:42")
    val (commits, rowsEvs) = tx1.partition(_.op == "commit")
    assert(commits.length == 1 && rowsEvs.length == 4)
    assert(rowsEvs.map(_.seq).sorted == rowsEvs.map(_.seq)) // log_pos ordered
  }
}
