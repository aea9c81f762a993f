package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.ddl.{SchemaRegistry, TypeMapper}

/** §1.2 type matrix + K5 dynamic-schema tracking. */
class SchemaRegistrySpec extends AnyFunSuite {

  test("C9 feed: per-column charsets from DDL text, table default fallback") {
    val reg = new SchemaRegistry
    reg.applyDdl("db1",
      """CREATE TABLE t (
        |  id INT PRIMARY KEY,
        |  name VARCHAR(20) CHARACTER SET gbk NOT NULL,
        |  note TEXT CHARSET latin2,
        |  plain VARCHAR(10),
        |  payload BLOB
        |) ENGINE=InnoDB DEFAULT CHARSET=latin1""".stripMargin)
    // column-level wins; unlabeled text columns inherit the table
    // default; non-text columns carry no charset
    assert(reg.columnCharsets("db1", "t") ==
      Map("name" -> "gbk", "note" -> "latin2", "plain" -> "latin1"))
    // ALTER keeps the feed current: added/modified columns capture theirs
    reg.applyDdl("db1", "ALTER TABLE t ADD COLUMN extra VARCHAR(5) CHARACTER SET utf16le")
    assert(reg.columnCharsets("db1", "t")("extra") == "utf16le")
    reg.applyDdl("db1", "ALTER TABLE t MODIFY COLUMN plain VARCHAR(10) CHARSET utf8mb4")
    assert(reg.columnCharsets("db1", "t")("plain") == "utf8mb4")
    // an added text column with NO explicit charset inherits the table's
    // DEFAULT CHARSET (the reference reads the effective charset from
    // information_schema, which folds the table default in)
    reg.applyDdl("db1", "ALTER TABLE t ADD COLUMN inherited VARCHAR(8)")
    assert(reg.columnCharsets("db1", "t")("inherited") == "latin1")
    // ALTER ... DEFAULT CHARSET=x updates the recorded default for later adds
    reg.applyDdl("db1", "ALTER TABLE t DEFAULT CHARSET=gbk")
    reg.applyDdl("db1", "ALTER TABLE t ADD COLUMN later VARCHAR(8)")
    assert(reg.columnCharsets("db1", "t")("later") == "gbk")
    // CONVERT TO CHARACTER SET retags EVERY text column (MySQL converts
    // the data of all string columns, not just the default)
    assert(reg.applyDdl("db1", "ALTER TABLE t CONVERT TO CHARACTER SET utf8mb4"))
    val cs = reg.columnCharsets("db1", "t")
    assert(Set("name", "note", "plain", "extra", "inherited", "later").forall(cs(_) == "utf8mb4"))
    // and later adds inherit the new default
    reg.applyDdl("db1", "ALTER TABLE t ADD COLUMN post_cvt VARCHAR(8)")
    assert(reg.columnCharsets("db1", "t")("post_cvt") == "utf8mb4")
  }

  test("JSON columns never charset-tag: table default, ALTER ADD, CONVERT TO") {
    // JSON is always utf8mb4 and BinlogParser emits it as a REAL decoded
    // string, not the ISO-8859-1 carrier — a charset tag would make
    // transcodeRow mangle the document text
    val reg = new SchemaRegistry
    reg.applyDdl("db1",
      "CREATE TABLE t (id INT, doc JSON, name VARCHAR(10)) DEFAULT CHARSET=latin1")
    assert(reg.columnCharsets("db1", "t") == Map("name" -> "latin1"))
    reg.applyDdl("db1", "ALTER TABLE t ADD COLUMN doc2 JSON")
    assert(!reg.columnCharsets("db1", "t").contains("doc2"))
    reg.applyDdl("db1", "ALTER TABLE t CONVERT TO CHARACTER SET gbk")
    assert(reg.columnCharsets("db1", "t") == Map("name" -> "gbk"))
  }

  test("save/load round-trips schemas, charset metadata, and table defaults") {
    val reg = new SchemaRegistry
    reg.applyDdl("db1",
      "CREATE TABLE t (id INT, name VARCHAR(20) CHARACTER SET gbk, plain TEXT) DEFAULT CHARSET=latin1")
    reg.applyDdl("db2", "CREATE TABLE u (k BIGINT NOT NULL, v DECIMAL(10,2))")
    val path = java.nio.file.Paths.get(graft.TempDirs.scratch("graft-reg")).resolve("registry.json").toString
    reg.save(path)
    val back = SchemaRegistry.load(path)
    assert(back.tables.toSet == Set(("db1", "t"), ("db2", "u")))
    assert(back.get("db2", "u") == reg.get("db2", "u"))
    // the C9 feed survives the round trip exactly
    assert(back.columnCharsets("db1", "t") == Map("name" -> "gbk", "plain" -> "latin1"))
    // and so does the table default (a post-restart ALTER ADD inherits it)
    back.applyDdl("db1", "ALTER TABLE t ADD COLUMN post VARCHAR(4)")
    assert(back.columnCharsets("db1", "t")("post") == "latin1")
    // missing file = empty registry (first run)
    assert(SchemaRegistry.load(path + ".nope").tables.isEmpty)
  }

  test("literal-blind parsing: charset text and parens inside COMMENTs are inert") {
    val reg = new SchemaRegistry
    // ')' inside a trailing comment must not truncate the body parse or
    // hide the real DEFAULT CHARSET
    reg.applyDdl("db1",
      "CREATE TABLE t (id INT, txt VARCHAR(8)) DEFAULT CHARSET=latin1 COMMENT 'see (notes)'")
    assert(reg.get("db1", "t").get.fieldNames.toSeq == Seq("id", "txt"))
    assert(reg.tableDefaultCharset("db1", "t").contains("latin1"))
    // charset-looking text inside a comment literal is not a conversion
    assert(!reg.applyDdl("db1",
      "ALTER TABLE t COMMENT 'we convert to character set utf8mb4 next sprint'"))
    assert(reg.columnCharsets("db1", "t")("txt") == "latin1")
    // and a bogus charset in a CREATE comment records no default
    reg.applyDdl("db1", "CREATE TABLE u (x TEXT) COMMENT 'legacy charset=gbk data'")
    assert(reg.tableDefaultCharset("db1", "u").isEmpty)
  }

  test("ALTER dispatch is keyword-bounded: DROP COLUMN address really drops") {
    val reg = new SchemaRegistry
    reg.applyDdl("db1", "CREATE TABLE t (id INT, address VARCHAR(40), padding TEXT)")
    assert(reg.applyDdl("db1", "ALTER TABLE t DROP COLUMN address"))
    assert(reg.get("db1", "t").get.fieldNames.toSeq == Seq("id", "padding"))
    assert(reg.applyDdl("db1", "ALTER TABLE t MODIFY COLUMN padding VARCHAR(99)"))
    assert(reg.get("db1", "t").get("padding").dataType == StringType)
  }

  test("default-charset-only ALTER signals schemaChanged; untracked tables never leak one") {
    val reg = new SchemaRegistry
    reg.applyDdl("db1", "CREATE TABLE t (x VARCHAR(4))")
    // tracked: the new default is registry state → true (persist + replan)
    assert(reg.applyDdl("db1", "ALTER TABLE t DEFAULT CHARSET=gbk"))
    assert(reg.tableDefaultCharset("db1", "t").contains("gbk"))
    // same default again: no state change
    assert(!reg.applyDdl("db1", "ALTER TABLE t DEFAULT CHARSET=gbk"))
    // untracked: must not record anything — a later bare CREATE would
    // wrongly inherit it
    assert(!reg.applyDdl("db1", "ALTER TABLE ghost DEFAULT CHARSET=gbk"))
    reg.applyDdl("db1", "CREATE TABLE ghost (txt VARCHAR(8))")
    assert(reg.columnCharsets("db1", "ghost").isEmpty)
    // re-CREATE without a charset clause clears a stale default
    reg.applyDdl("db1", "DROP TABLE t")
    reg.applyDdl("db1", "CREATE TABLE t (x VARCHAR(4))")
    assert(reg.tableDefaultCharset("db1", "t").isEmpty)
  }

  test("multi-table DROP untracks every listed table") {
    val reg = new SchemaRegistry
    reg.applyDdl("db1", "CREATE TABLE a (id INT)")
    reg.applyDdl("db1", "CREATE TABLE b (id INT)")
    reg.applyDdl("db2", "CREATE TABLE c (id INT)")
    assert(reg.applyDdl("db1", "DROP TABLE IF EXISTS a, b, db2.c"))
    assert(reg.get("db1", "a").isEmpty && reg.get("db1", "b").isEmpty &&
      reg.get("db2", "c").isEmpty)
    // a re-CREATE after the drop starts from a clean slate (no stale default)
    reg.applyDdl("db1", "CREATE TABLE a (txt VARCHAR(4)) DEFAULT CHARSET=latin1")
    assert(reg.tableDefaultCharset("db1", "a").contains("latin1"))
    reg.applyDdl("db1", "DROP TABLE a")
    assert(reg.tableDefaultCharset("db1", "a").isEmpty)
  }

  test("MySQL type matrix maps the 25 column types") {
    import TypeMapper.mysqlToSpark
    assert(mysqlToSpark("TINYINT(1)") == BooleanType)
    assert(mysqlToSpark("tinyint") == ByteType)
    assert(mysqlToSpark("tinyint unsigned") == ShortType)
    assert(mysqlToSpark("smallint") == ShortType)
    assert(mysqlToSpark("smallint unsigned") == IntegerType)
    assert(mysqlToSpark("mediumint") == IntegerType)
    assert(mysqlToSpark("int") == IntegerType)
    assert(mysqlToSpark("int unsigned") == LongType)
    assert(mysqlToSpark("bigint") == LongType)
    assert(mysqlToSpark("bigint unsigned") == DecimalType(20, 0))
    assert(mysqlToSpark("float") == FloatType)
    assert(mysqlToSpark("double") == DoubleType)
    assert(mysqlToSpark("decimal(12,2)") == DecimalType(12, 2))
    assert(mysqlToSpark("bit(1)") == BooleanType)
    assert(mysqlToSpark("bit(8)") == BinaryType)
    assert(mysqlToSpark("date") == DateType)
    assert(mysqlToSpark("datetime(6)") == TimestampType)
    assert(mysqlToSpark("timestamp") == TimestampType)
    assert(mysqlToSpark("time") == DayTimeIntervalType())
    assert(mysqlToSpark("year") == IntegerType)
    assert(mysqlToSpark("varchar(64)") == StringType)
    assert(mysqlToSpark("text") == StringType)
    assert(mysqlToSpark("json") == StringType)
    assert(mysqlToSpark("enum('a','b')") == StringType)
    assert(mysqlToSpark("varbinary(16)") == BinaryType)
    assert(mysqlToSpark("blob") == BinaryType)
  }

  test("enum/set label extraction for C6 conversions") {
    assert(TypeMapper.enumSetLabels("enum('red','green','bl''ue')") == Seq("red", "green", "bl'ue"))
    assert(TypeMapper.enumSetLabels("set('r','w','x')") == Seq("r", "w", "x"))
  }

  test("create/alter/drop lifecycle updates tracked schemas") {
    val r = new SchemaRegistry
    assert(r.applyDdl("db1",
      "CREATE TABLE db1.t1 (id INT NOT NULL, name VARCHAR(64), bal DECIMAL(10,2), PRIMARY KEY (id))"))
    val st = r.get("db1", "t1").get
    assert(st.fieldNames.toSeq == Seq("id", "name", "bal"))
    assert(st("id").dataType == IntegerType && !st("id").nullable)
    assert(st("bal").dataType == DecimalType(10, 2))

    assert(r.applyDdl("db1", "ALTER TABLE t1 ADD COLUMN created DATETIME"))
    assert(r.get("db1", "t1").get.fieldNames.contains("created"))

    assert(r.applyDdl("db1", "ALTER TABLE t1 MODIFY COLUMN name TEXT"))
    assert(r.get("db1", "t1").get("name").dataType == StringType)

    assert(r.applyDdl("db1", "ALTER TABLE t1 DROP COLUMN bal"))
    assert(!r.get("db1", "t1").get.fieldNames.contains("bal"))

    assert(r.applyDdl("db1", "DROP TABLE db1.t1"))
    assert(r.get("db1", "t1").isEmpty)
  }

  test("drop schema removes all tables under it") {
    val r = new SchemaRegistry
    r.applyDdl("db2", "CREATE TABLE db2.a (id INT)")
    r.applyDdl("db2", "CREATE TABLE db2.b (id INT)")
    r.applyDdl("other", "CREATE TABLE other.c (id INT)")
    assert(r.applyDdl("db2", "DROP DATABASE db2"))
    assert(r.tables.toSet == Set(("other", "c")))
  }

  test("unknown DDL kinds leave the registry untouched") {
    val r = new SchemaRegistry
    assert(!r.applyDdl("db", "TRUNCATE TABLE t"))
    assert(!r.applyDdl("db", "GRANT ALL ON *.* TO x"))
  }
}
