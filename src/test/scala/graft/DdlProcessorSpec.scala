package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ddl.{DdlProcessor, DdlRewriter, SchemaRegistry}
import graft.model._

/** The composed K5 DDL control-path: decode → skip → route → drop-list
  * filter → registry → rename/downgrade, in the reference's order.
  */
class DdlProcessorSpec extends AnyFunSuite {

  private val spec = ReplicationSpec(
    doDb = Seq(SchemaSpec("src")),
    ignoreDb = Seq(IgnoreSpec("src", Seq("secret"))))
  private val renames = Map("src" -> "dst")

  test("routed CREATE TABLE: registry updated, idents renamed, collation downgraded") {
    val reg = new SchemaRegistry
    val out = DdlProcessor.process("src", "t1",
      "CREATE TABLE src.t1 (id INT, s VARCHAR(5) COLLATE utf8mb4_0900_ai_ci) DEFAULT CHARSET=latin1",
      spec, reg, renameSchema = renames)
    assert(out.kind == DdlRewriter.CreateTable && out.schemaChanged)
    assert(out.sql.get.contains("`dst`.`t1`"))
    assert(out.sql.get.contains("utf8mb4_general_ci"))
    // registry tracked the SOURCE-side table with its charset feed
    assert(reg.get("src", "t1").isDefined)
    assert(reg.columnCharsets("src", "t1")("s") == "latin1")
  }

  test("unrouted schema and always-skip statements are dropped") {
    val reg = new SchemaRegistry
    assert(DdlProcessor.process("other", "t",
      "CREATE TABLE other.t (id INT)", spec, reg).sql.isEmpty)
    assert(DdlProcessor.process("src", "secret",
      "CREATE TABLE src.secret (id INT)", spec, reg).sql.isEmpty)
    val trig = DdlProcessor.process("src", "t",
      "CREATE DEFINER=`u`@`h` TRIGGER trg BEFORE INSERT ON t FOR EACH ROW BEGIN END",
      spec, reg)
    assert(trig.sql.isEmpty && trig.kind == DdlRewriter.SkippedStmt)
    assert(reg.tables.isEmpty)
  }

  test("ExpandSyntaxSupport off (default): grants/user admin/procedures skip") {
    val reg = new SchemaRegistry
    val stmts = Seq(
      "GRANT SELECT ON db.* TO 'u'@'h'",
      "CREATE USER 'u'@'h' IDENTIFIED BY 'x'",
      "SET PASSWORD FOR 'u'@'h' = 'x'",
      "FLUSH PRIVILEGES",
      "DROP PROCEDURE p1")
    stmts.foreach { s =>
      val out = DdlProcessor.process("mysql", "user", s, spec, reg)
      assert(out.sql.isEmpty && out.kind == DdlRewriter.ExpandStmt, s)
      assert(!out.schemaChanged)
    }
    assert(reg.tables.isEmpty)
  }

  test("ExpandSyntaxSupport on: expand statements forward VERBATIM") {
    // reference: the flag flips skipSql for isExpand statements and the
    // original query text is forwarded (`binlog_reader.go:560-604`);
    // no registry replay, no rename rewrite applies to them
    val reg = new SchemaRegistry
    val expandSpec = spec.copy(expandSyntaxSupport = true)
    val grant = "GRANT SELECT ON db.* TO 'u'@'h'"
    val out = DdlProcessor.process("mysql", "user", grant, expandSpec, reg,
      renameSchema = Map("db" -> "dst"))
    assert(out.sql.contains(grant)) // verbatim — rename maps don't touch it
    assert(out.kind == DdlRewriter.ExpandStmt && !out.schemaChanged)
    assert(reg.tables.isEmpty)
    // triggers stay dead even with the flag on (reference always-skip)
    val trig = DdlProcessor.process("src", "t",
      "CREATE DEFINER=`u`@`h` TRIGGER trg BEFORE INSERT ON t FOR EACH ROW BEGIN END",
      expandSpec, reg)
    assert(trig.sql.isEmpty && trig.kind == DdlRewriter.SkippedStmt)
  }

  test("multi-table DROP filters skipped tables; all-skipped drops the statement") {
    val reg = new SchemaRegistry
    reg.applyDdl("src", "CREATE TABLE src.a (id INT)")
    reg.applyDdl("src", "CREATE TABLE src.secret (id INT)")
    val out = DdlProcessor.process("src", "a",
      "DROP TABLE src.a, src.secret", spec, reg, renameSchema = renames)
    // the skipped table vanished from the statement BEFORE renaming
    assert(out.sql.get == "DROP TABLE `dst`.`a`")
    // registry dropped only the surviving table (secret stays tracked:
    // the target never saw it, and the source-side drop of a
    // route-excluded table is not our state)
    assert(reg.get("src", "a").isEmpty)
    val all = DdlProcessor.process("src", "secret",
      "DROP TABLE src.secret", spec, reg)
    assert(all.sql.isEmpty && !all.schemaChanged)
  }

  test("lowerCaseTableNames normalizes before routing and rename") {
    val reg = new SchemaRegistry
    val out = DdlProcessor.process("SRC", "T9",
      "TRUNCATE TABLE SRC.T9", spec, reg, renameSchema = renames,
      lowerCaseTableNames = true)
    assert(out.sql.contains("TRUNCATE TABLE `dst`.`t9`"))
    // without normalization the uppercase schema misses the route
    val miss = DdlProcessor.process("SRC", "T9",
      "TRUNCATE TABLE SRC.T9", spec, reg, renameSchema = renames)
    assert(miss.sql.isEmpty)
  }

  test("bare idents resolve against the event's schema before rename") {
    val reg = new SchemaRegistry
    val out = DdlProcessor.process("src", "t2",
      "TRUNCATE TABLE t2", spec, reg, renameSchema = renames)
    assert(out.sql.get == "TRUNCATE TABLE `dst`.`t2`")
    assert(!out.schemaChanged) // truncate: rows change, schema does not
  }
}
