package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ddl.DdlRewriter
import graft.ddl.DdlRewriter._
import graft.model._

/** F4/F5/F8 — DDL classification / rewrite golden tests, mirroring the
  * reference's table-driven style (`binlog_reader_test.go:304`
  * resolveQuery, `:560` skipQueryDDL; rewrite `binlog_reader.go:847-957`).
  */
class DdlRewriterSpec extends AnyFunSuite {

  test("classify statement kinds") {
    assert(classify("CREATE DATABASE db1") == CreateSchema)
    assert(classify("create schema if not exists db1") == CreateSchema)
    assert(classify("DROP DATABASE db1") == DropSchema)
    assert(classify("CREATE TABLE t (id int)") == CreateTable)
    assert(classify("DROP TABLE a.b") == DropTable)
    assert(classify("ALTER TABLE t ADD COLUMN c int") == AlterTable)
    assert(classify("RENAME TABLE a TO b") == RenameTable)
    assert(classify("TRUNCATE TABLE t") == Truncate)
    assert(classify("CREATE INDEX i ON t(c)") == CreateIndex)
    assert(classify("DROP INDEX i ON t") == DropIndex)
  }

  test("always-skip statements (trigger/event/view/grant/user)") {
    // reference skip regexes `binlog_reader.go:1228-1265`
    assert(classify("CREATE DEFINER=`u`@`h` TRIGGER trg BEFORE INSERT ON t FOR EACH ROW BEGIN END") == SkippedStmt)
    assert(classify("CREATE EVENT ev ON SCHEDULE EVERY 1 DAY DO BEGIN END") == SkippedStmt)
    assert(classify("create view v as select 1") == SkippedStmt)
    assert(classify("GRANT ALL ON *.* TO 'u'@'h'") == SkippedStmt)
    assert(classify("DROP TRIGGER trg") == SkippedStmt)
    assert(classify("CREATE USER 'u'@'h' IDENTIFIED BY 'x'") == SkippedStmt)
    assert(classify("FLUSH PRIVILEGES") == SkippedStmt)
  }

  test("alter sub-kind classification") {
    assert(alterKind("ALTER TABLE t ADD COLUMN c INT") == Some("AddColumn"))
    assert(alterKind("ALTER TABLE t DROP COLUMN c") == Some("DropColumn"))
    assert(alterKind("ALTER TABLE t MODIFY COLUMN c BIGINT") == Some("ModifyColumn"))
    assert(alterKind("ALTER TABLE t RENAME TO t2") == Some("Rename"))
    assert(alterKind("SELECT 1") == None)
  }

  test("qualified identifier rewrite with schema/table maps") {
    val out = DdlRewriter.rewrite(
      "ALTER TABLE db1.tb1 ADD COLUMN c INT",
      renameSchema = Map("db1" -> "db1_r"),
      renameTable = Map(("db1", "tb1") -> ("db1_r", "tb1_r")))
    assert(out == "ALTER TABLE `db1_r`.`tb1_r` ADD COLUMN c INT")
  }

  test("backticked identifiers rewrite") {
    val out = DdlRewriter.rewrite(
      "DROP TABLE `db1`.`tb1`",
      renameSchema = Map("db1" -> "x"),
      renameTable = Map(("db1", "tb1") -> ("x", "y")))
    assert(out == "DROP TABLE `x`.`y`")
  }

  test("schema-only rename applies when table is unmapped") {
    val out = DdlRewriter.rewrite(
      "CREATE TABLE db1.other (id INT)",
      renameSchema = Map("db1" -> "db2"),
      renameTable = Map.empty)
    assert(out == "CREATE TABLE `db2`.`other` (id INT)")
  }

  test("string literals are not rewritten") {
    val out = DdlRewriter.rewrite(
      "ALTER TABLE db1.t COMMENT = 'about db1.t stuff'",
      renameSchema = Map("db1" -> "zz"),
      renameTable = Map.empty)
    assert(out.contains("`zz`.`t`"))
    assert(out.contains("'about db1.t stuff'"))
  }

  test("CREATE TABLE column-map pruning keeps mapped cols + constraints") {
    // reference `base/utils.go:737-750`
    val sql = "CREATE TABLE t (id INT, name VARCHAR(10), extra DECIMAL(5,2), PRIMARY KEY (id))"
    val out = DdlRewriter.pruneCreateTableColumns(sql, Seq("id", "name"))
    assert(out.contains("id INT") && out.contains("name VARCHAR(10)"))
    assert(!out.contains("extra"))
    assert(out.contains("PRIMARY KEY (id)"))
  }

  test("shouldApply honors do/ignore lists and system schemas") {
    val spec = ReplicationSpec(
      doDb = Seq(SchemaSpec("db1")),
      ignoreDb = Seq(IgnoreSpec("db1", Seq("secret"))))
    assert(DdlRewriter.shouldApply("CREATE TABLE db1.t (id int)", "db1", "t", spec))
    assert(!DdlRewriter.shouldApply("CREATE TABLE db1.secret (id int)", "db1", "secret", spec))
    assert(!DdlRewriter.shouldApply("CREATE TABLE mysql.x (id int)", "mysql", "x", spec))
    assert(!DdlRewriter.shouldApply("CREATE TABLE db9.t (id int)", "db9", "t", spec))
  }

  test("collation downgrade in DDL text") {
    import graft.functions.TypeConversions
    val out = TypeConversions.downgradeCollations(
      "CREATE TABLE t (s VARCHAR(5) COLLATE utf8mb4_0900_ai_ci)")
    assert(out.contains("utf8mb4_general_ci") && !out.toLowerCase.contains("0900"))
  }
}
