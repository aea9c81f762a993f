package graft

import org.apache.spark.sql.functions._
import graft.functions.TypeConversions

/** C1-C12 — golden conversions mirroring the reference's Kafka/Debezium
  * encoders (`driver/kafka/kafka2_test.go:8`, kafka3 tests).
  */
class TypeConversionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, v: String)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(v).toDF("v").select(c.as("r")).as[T].head()

  test("C2: TIME string → signed microseconds") {
    assert(one[Long](TypeConversions.timeToMicros(col("v")), "01:02:03") == 3723000000L)
    assert(one[Long](TypeConversions.timeToMicros(col("v")), "-01:02:03.5") == -3723500000L)
    assert(one[Long](TypeConversions.timeToMicros(col("v")), "00:00:00.000001") == 1L)
    assert(one[Long](TypeConversions.timeToMicros(col("v")), "838:59:59") == 3020399000000L)
    // reference TestTimeValue vector (kafka2_test.go:14): negative
    // multi-hundred-hour TIME with fraction
    assert(one[Long](TypeConversions.timeToMicros(col("v")), "-800:02:03.100000") ==
      -((800L * 3600 + 2 * 60 + 3) * 1000000L + 100000L))
  }

  test("C3/C4/C5: datetime/date/timestamp conversions") {
    assert(one[Long](TypeConversions.datetimeToMillis(col("v")), "2020-01-01 01:02:03") == 1577840523000L)
    assert(one[Int](TypeConversions.dateToEpochDays(col("v")), "1970-01-02") == 1)
    assert(one[String](TypeConversions.timestampToIso(col("v")), "2020-06-05 10:20:30") == "2020-06-05T10:20:30Z")
  }

  test("C6: enum ordinal → label; set bitmask → csv") {
    val d = Seq((2, 5L)).toDF("e", "m")
    val out = d.select(
      TypeConversions.enumLabel(col("e"), Seq("red", "green", "blue")).as("en"),
      TypeConversions.setLabels(col("m"), Seq("r", "w", "x")).as("s"))
      .as[(String, String)].head()
    assert(out == ("green", "r,x")) // 5 = 0b101
  }

  test("C7: binary base64 with zero padding") {
    val d = Seq("AB").toDF("v")
    val plain = d.select(TypeConversions.binaryToBase64(col("v")).as("r")).as[String].head()
    assert(plain == java.util.Base64.getEncoder.encodeToString("AB".getBytes))
    val padded = d.select(TypeConversions.binaryToBase64(col("v"), Some(4)).as("r")).as[String].head()
    assert(padded == java.util.Base64.getEncoder.encodeToString(Array[Byte]('A', 'B', 0, 0)))
  }

  test("C7b: BIT(n) little-endian base64 — reference kafka3 goldens") {
    val d = Seq((0L, 9L)).toDF("zero", "nine")
    def bit(c: String, bits: Int): String =
      d.select(TypeConversions.bitToDebezium(col(c), bits).as("r")).as[String].head()
    assert(bit("zero", 8) == "AA==")   // bit(8) 0
    assert(bit("nine", 8) == "CQ==")   // bit(8) 9
    assert(bit("nine", 16) == "CQA=")  // bit(16) 9: LITTLE-endian 09 00
    assert(bit("nine", 1) == "CQ==")   // sub-byte widths round up to one byte
    // a value crossing the byte boundary: 0x0102 → 02 01 on the wire
    val two = Seq(0x0102L).toDF("v")
    assert(two.select(TypeConversions.bitToDebezium(col("v"), 16).as("r"))
      .as[String].head() ==
      java.util.Base64.getEncoder.encodeToString(Array[Byte](0x02, 0x01)))
  }

  test("C8: unsigned widening incl. mediumint mask") {
    val d = Seq((-1, -1L)).toDF("i", "l")
    assert(d.select(TypeConversions.unsignedWiden(col("i"), "tinyint")).as[Short].head() == 255)
    assert(d.select(TypeConversions.unsignedWiden(col("i"), "smallint")).as[Int].head() == 65535)
    assert(d.select(TypeConversions.unsignedWiden(col("i"), "mediumint")).as[Int].head() == 0xFFFFFF)
    assert(d.select(TypeConversions.unsignedWiden(col("i"), "int")).as[Long].head() == 0xFFFFFFFFL)
    assert(d.select(TypeConversions.unsignedWiden(col("l"), "bigint").cast("string")).as[String].head()
      == "18446744073709551615")
  }

  test("C1: decimal → Debezium unscaled base64") {
    // 123.45 scale 2 → unscaled 12345 = 0x3039 → 8-byte BE
    val d = Seq(123.45).toDF("v")
    val got = d.select(TypeConversions.decimalToDebezium(col("v"), 12, 2).as("r")).as[String].head()
    val expected = java.util.Base64.getEncoder.encodeToString(
      Array[Byte](0, 0, 0, 0, 0, 0, 0x30, 0x39))
    assert(got == expected)
  }

  test("C9: table-metadata-driven stage decodes each column by its charset") {
    // reference ConvertArg applies the per-column charset map from table
    // metadata (`mysqlconfig/types.go:93-112`); matrix over 4 charsets +
    // passthrough kinds in ONE projection
    val latin1 = "café €uro".getBytes("windows-1252")
    val gbk = "你好世界".getBytes("GBK")
    val utf16 = "Straße".getBytes("UTF-16LE")
    val utf8 = "plain ütf8".getBytes("UTF-8")
    val blob = Array[Byte](0, 1, 2, -1)
    val df = Seq((1L, latin1, gbk, utf16, utf8, blob))
      .toDF("id", "c_latin1", "c_gbk", "c_utf16le", "c_utf8", "c_blob")
    val out = TypeConversions.transcodeRow(df, Map(
      "c_latin1" -> "latin1", "c_gbk" -> "gbk", "c_utf16le" -> "utf16le",
      "c_utf8" -> "utf8mb4", "c_blob" -> "binary")).head()
    assert(out.getAs[String]("c_latin1") == "café €uro")
    assert(out.getAs[String]("c_gbk") == "你好世界")
    assert(out.getAs[String]("c_utf16le") == "Straße")
    assert(out.getAs[String]("c_utf8") == "plain ütf8")
    // unknown charset: binary passthrough, byte-identical (reference Nop)
    assert(out.getAs[Array[Byte]]("c_blob").toSeq == blob.toSeq)
  }

  test("C9: registry-captured charsets drive the decode stage end to end") {
    // DDL text -> SchemaRegistry field metadata -> transcodeRow: the
    // full table-metadata path, no hand-written charset map
    val reg = new graft.ddl.SchemaRegistry
    reg.applyDdl("db1", "CREATE TABLE t (k INT, txt VARCHAR(20)) DEFAULT CHARSET=gbk")
    val df = Seq((1L, "你好世界".getBytes("GBK"))).toDF("k", "txt")
    val out = TypeConversions.transcodeRow(df, reg.columnCharsets("db1", "t")).head()
    assert(out.getAs[String]("txt") == "你好世界")
  }

  test("C9: MySQL latin1 is cp1252 — the 0x80 Euro sign survives") {
    // decoding as ISO-8859-1 would map 0x80 to a C1 control character
    assert(TypeConversions.ddlToUtf8(Array(0x80.toByte), "latin1") == "€")
  }

  test("C9: DDL text decodes via character_set_client before rewrite") {
    // reference transcodes the query event before resolveQuery
    // (`binlog_reader.go:543-548`)
    val ddl = "CREATE TABLE t (c VARCHAR(10) DEFAULT 'café €')"
    val sql = TypeConversions.ddlToUtf8(ddl.getBytes("windows-1252"), "latin1")
    assert(sql == ddl)
    assert(graft.ddl.DdlRewriter.classify(sql) == graft.ddl.DdlRewriter.CreateTable)
    assert(TypeConversions.ddlToUtf8("DROP TABLE t".getBytes("UTF-16LE"), "utf16le")
      == "DROP TABLE t")
    // utf8/utf8mb4 skip the decode stage (reference IsUTF8OrMB4)
    assert(TypeConversions.ddlToUtf8("DROP TABLE ü".getBytes("UTF-8"), "utf8mb4")
      == "DROP TABLE ü")
  }

  test("C9: latin1 bytes transcode to UTF-8 strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val latin1 = "café señor".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val df = Seq(Tuple1(latin1)).toDF("raw")
    val out = df.select(TypeConversions.transcodeToUtf8(col("raw"), "ISO-8859-1").as("s"))
      .as[String].head()
    assert(out == "café señor")
  }
}
