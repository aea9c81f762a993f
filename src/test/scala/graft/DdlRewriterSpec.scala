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

  test("always-skip statements (trigger/event/view) — regardless of expand") {
    // reference isSkip ∪ isSkipQuery (`binlog_reader.go:561-563,1236-1249`)
    assert(classify("CREATE DEFINER=`u`@`h` TRIGGER trg BEFORE INSERT ON t FOR EACH ROW BEGIN END") == SkippedStmt)
    assert(classify("CREATE EVENT ev ON SCHEDULE EVERY 1 DAY DO BEGIN END") == SkippedStmt)
    assert(classify("create view v as select 1") == SkippedStmt)
    assert(classify("DROP TRIGGER trg") == SkippedStmt)
    assert(classify("ALTER VIEW v AS SELECT 2") == SkippedStmt)
  }

  test("expand-syntax statements classify ExpandStmt (gated, not dead)") {
    // reference isExpand cases (`binlog_reader.go:1107-1156,1251-1263`)
    assert(classify("GRANT ALL ON *.* TO 'u'@'h'") == ExpandStmt)
    assert(classify("REVOKE SELECT ON db.* FROM 'u'@'h'") == ExpandStmt)
    assert(classify("CREATE USER 'u'@'h' IDENTIFIED BY 'x'") == ExpandStmt)
    assert(classify("rename user 'a'@'%' to 'b'@'%'") == ExpandStmt)
    assert(classify("SET PASSWORD FOR 'u'@'h' = 'x'") == ExpandStmt)
    assert(classify("FLUSH PRIVILEGES") == ExpandStmt)
    assert(classify("CREATE DEFINER=`u`@`h` PROCEDURE p() BEGIN END") == ExpandStmt)
    assert(classify("DROP PROCEDURE p") == ExpandStmt)
    assert(classify("DROP FUNCTION f") == ExpandStmt)
    // FLUSH TABLES with a table list still maps idents, not expand
    assert(classify("FLUSH TABLES db1.tb1, tb2") == FlushTables)
  }

  test("shouldApply: expand statements ride the flag; mysql schema opens with it") {
    import graft.model.ReplicationSpec
    val off = ReplicationSpec()
    val on = ReplicationSpec(expandSyntaxSupport = true)
    val grant = "GRANT SELECT ON db.* TO 'u'@'h'"
    assert(!shouldApply(grant, "mysql", "user", off))
    assert(shouldApply(grant, "mysql", "user", on))
    // mysql.* DDL (e.g. ALTER on a grant table) opens only under the flag
    assert(!shouldApply("ALTER TABLE mysql.user ADD COLUMN c INT", "mysql", "user", off))
    assert(shouldApply("ALTER TABLE mysql.user ADD COLUMN c INT", "mysql", "user", on))
    // the other system schemas never open (`binlog_reader.go:1209-1210`)
    assert(!shouldApply("CREATE TABLE sys.t (id INT)", "sys", "t", on))
    // always-skip stays skipped even with expand on
    assert(!shouldApply("DROP TRIGGER trg", "db1", "t", on))
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

  // ---- loadMapping statement-kind goldens (`binlog_reader.go:896-945`):
  // the reference maps idents across 13 statement kinds via the TiDB AST;
  // these pin the same behaviors through the tokenizing rewriter. GRANT/
  // REVOKE are a documented subset (ExpandSyntaxSupport-gated in the
  // reference, default off — always skipped here).

  private val rs = Map("db1" -> "db1_r")
  private val rt = Map(
    ("db1", "tb1") -> ("db1_r", "tb1_r"),
    ("db1", "tb2") -> ("db1_r", "tb2_r"))

  test("golden: multi-table DROP TABLE renames every listed table") {
    assert(DdlRewriter.rewrite("DROP TABLE db1.tb1, db1.tb2, other.t", rs, rt) ==
      "DROP TABLE `db1_r`.`tb1_r`, `db1_r`.`tb2_r`, `other`.`t`")
    // bare names resolve against the event's current schema, and the
    // mapped form comes back qualified (reference renameAstTableFn)
    assert(DdlRewriter.rewrite("DROP TABLE IF EXISTS tb1, tb2", rs, rt,
      defaultSchema = "db1") ==
      "DROP TABLE IF EXISTS `db1_r`.`tb1_r`, `db1_r`.`tb2_r`")
  }

  test("golden: multi-pair RENAME TABLE maps both sides of every pair") {
    assert(DdlRewriter.rewrite(
      "RENAME TABLE db1.tb1 TO db1.tb2, other.a TO other.b", rs, rt) ==
      "RENAME TABLE `db1_r`.`tb1_r` TO `db1_r`.`tb2_r`, `other`.`a` TO `other`.`b`")
    assert(DdlRewriter.rewrite("RENAME TABLE tb1 TO archive", rs, rt,
      defaultSchema = "db1") ==
      "RENAME TABLE `db1_r`.`tb1_r` TO `db1_r`.`archive`")
  }

  test("golden: TRUNCATE / CREATE TABLE (incl. LIKE) / bare table resolution") {
    assert(DdlRewriter.rewrite("TRUNCATE TABLE tb1", rs, rt, "db1") ==
      "TRUNCATE TABLE `db1_r`.`tb1_r`")
    assert(DdlRewriter.rewrite("CREATE TABLE tb2 (id INT)", rs, rt, "db1") ==
      "CREATE TABLE `db1_r`.`tb2_r` (id INT)")
    // CreateTableStmt.ReferTable (CREATE TABLE ... LIKE) maps too
    assert(DdlRewriter.rewrite("CREATE TABLE copy1 LIKE tb1", rs, rt, "db1") ==
      "CREATE TABLE `db1_r`.`copy1` LIKE `db1_r`.`tb1_r`")
  }

  test("golden: ALTER TABLE RENAME TO maps the target; RENAME COLUMN does not") {
    assert(DdlRewriter.rewrite("ALTER TABLE tb1 RENAME TO tb2", rs, rt, "db1") ==
      "ALTER TABLE `db1_r`.`tb1_r` RENAME TO `db1_r`.`tb2_r`")
    assert(DdlRewriter.rewrite("ALTER TABLE db1.tb1 RENAME AS db1.tb2", rs, rt) ==
      "ALTER TABLE `db1_r`.`tb1_r` RENAME AS `db1_r`.`tb2_r`")
    // RENAME COLUMN/INDEX operands are not tables (reference renames
    // only spec.NewTable)
    assert(DdlRewriter.rewrite("ALTER TABLE db1.tb1 RENAME COLUMN a TO b", rs, rt) ==
      "ALTER TABLE `db1_r`.`tb1_r` RENAME COLUMN a TO b")
    assert(DdlRewriter.rewrite("ALTER TABLE db1.tb1 RENAME INDEX i1 TO i2", rs, rt) ==
      "ALTER TABLE `db1_r`.`tb1_r` RENAME INDEX i1 TO i2")
  }

  test("golden: CREATE/DROP INDEX map the ON table, never the index ident") {
    assert(DdlRewriter.rewrite("CREATE UNIQUE INDEX tb1 ON db1.tb1 (c)", rs, rt) ==
      "CREATE UNIQUE INDEX tb1 ON `db1_r`.`tb1_r` (c)")
    assert(DdlRewriter.rewrite("DROP INDEX idx1 ON tb1", rs, rt, "db1") ==
      "DROP INDEX idx1 ON `db1_r`.`tb1_r`")
    assert(classify("CREATE FULLTEXT INDEX ft ON t(c)") == CreateIndex)
  }

  test("golden: schema statements rename the schema ident") {
    assert(DdlRewriter.rewrite("CREATE DATABASE db1", rs, rt) ==
      "CREATE DATABASE `db1_r`")
    assert(DdlRewriter.rewrite("DROP DATABASE IF EXISTS db1", rs, rt) ==
      "DROP DATABASE IF EXISTS `db1_r`")
    assert(DdlRewriter.rewrite(
      "ALTER DATABASE db1 DEFAULT CHARACTER SET utf8mb4", rs, rt) ==
      "ALTER DATABASE `db1_r` DEFAULT CHARACTER SET utf8mb4")
    assert(classify("ALTER SCHEMA db1 DEFAULT CHARACTER SET utf8") == AlterSchema)
    // unmapped schema stays byte-identical
    assert(DdlRewriter.rewrite("CREATE DATABASE other", rs, rt) ==
      "CREATE DATABASE other")
  }

  test("golden: FLUSH TABLES list maps; global FLUSH forms are expand-gated") {
    assert(classify("FLUSH TABLES db1.tb1, tb2") == FlushTables)
    // reference FlushStmt → isExpand (`binlog_reader.go:1113-1119`):
    // skipped by default, forwarded under ExpandSyntaxSupport
    assert(classify("FLUSH TABLES") == ExpandStmt)
    assert(classify("FLUSH TABLES WITH READ LOCK") == ExpandStmt)
    assert(classify("FLUSH LOGS") == ExpandStmt)
    assert(DdlRewriter.rewrite("FLUSH TABLES db1.tb1, tb2 WITH READ LOCK", rs, rt,
      defaultSchema = "db1") ==
      "FLUSH TABLES `db1_r`.`tb1_r`, `db1_r`.`tb2_r` WITH READ LOCK")
  }

  test("golden: five ALTER gates classify independently") {
    assert(alterKind("ALTER TABLE t MODIFY c BIGINT") == Some("ModifyColumn"))
    assert(alterKind("ALTER TABLE t CHANGE c d INT") == Some("ChangeColumn"))
    assert(alterKind("ALTER TABLE t ALTER COLUMN c SET DEFAULT 1") == Some("AlterColumn"))
    assert(alterKind("ALTER TABLE t RENAME COLUMN a TO b") == Some("Rename"))
  }

  test("golden: multi-table DROP filters routed-away tables (resolveQuery)") {
    // reference goldens `binlog_reader_test.go:304` drop-table-1/-2 with
    // skipFunc = schema=="skip" || table=="skip"
    val skip = (s: String, t: String) => s == "skip" || t == "skip"
    val (sql1, kept1) = DdlRewriter.filterDropTables("drop table a.b, skip.c, d", "", skip)
    assert(sql1 == "drop table a.b, d")
    assert(kept1 == Seq(("a", "b"), ("", "d")))
    // every table skipped: first table survives textually, kept list is
    // empty — the caller drops the whole statement
    val (sql2, kept2) =
      DdlRewriter.filterDropTables("drop table if exists skip.b, skip.c", "", skip)
    assert(sql2 == "drop table if exists skip.b")
    assert(kept2.isEmpty)
    // bare names resolve against the current schema before the skip test
    val (sql3, kept3) = DdlRewriter.filterDropTables("DROP TABLE b, c CASCADE", "skip", skip)
    assert(kept3.isEmpty && sql3 == "DROP TABLE b CASCADE")
    val (sql4, kept4) = DdlRewriter.filterDropTables("DROP TABLE `skip`.`x`, ok.y", "db", skip)
    assert(sql4 == "DROP TABLE ok.y" && kept4 == Seq(("ok", "y")))
  }

  test("golden: lower_case_table_names normalization (mayLowerTable)") {
    // reference lowercases schema/table idents when
    // lower_case_table_names != 0, BEFORE the rename maps apply
    assert(DdlRewriter.lowerIdents("DROP TABLE Db1.Tb1, `Db2`.`TB2`, Bare") ==
      "DROP TABLE db1.tb1, `db2`.`tb2`, bare")
    assert(DdlRewriter.lowerIdents("RENAME TABLE A TO B, C.D TO C.E") ==
      "RENAME TABLE a TO b, c.d TO c.e")
    // strings, keywords, and column idents keep their case
    assert(DdlRewriter.lowerIdents("CREATE TABLE T (MyCol INT) COMMENT 'Keep Case'") ==
      "CREATE TABLE t (MyCol INT) COMMENT 'Keep Case'")
    // backticked COLUMN idents keep case too — only table-name positions
    // lower (reference lowers TableName AST nodes only)
    assert(DdlRewriter.lowerIdents("ALTER TABLE `MyTab` ADD COLUMN `MyCol` INT") ==
      "ALTER TABLE `mytab` ADD COLUMN `MyCol` INT")
    assert(DdlRewriter.lowerIdents("CREATE TABLE `T2` (`Mixed` INT, KEY `IdxName` (`Mixed`))") ==
      "CREATE TABLE `t2` (`Mixed` INT, KEY `IdxName` (`Mixed`))")
    // CREATE INDEX: the index ident keeps case, the ON-table lowers
    assert(DdlRewriter.lowerIdents("CREATE INDEX `MyIdx` ON `MyTab` (`MyCol`)") ==
      "CREATE INDEX `MyIdx` ON `mytab` (`MyCol`)")
    // composes before rewrite, so maps stay keyed in lowercase
    val out = DdlRewriter.rewrite(
      DdlRewriter.lowerIdents("ALTER TABLE DB1.TB1 ADD COLUMN c INT"),
      Map("db1" -> "db1_r"), Map(("db1", "tb1") -> ("db1_r", "tb1_r")))
    assert(out == "ALTER TABLE `db1_r`.`tb1_r` ADD COLUMN c INT")
  }

  test("CREATE TABLE column-map pruning keeps mapped cols + constraints, in MAP order") {
    // reference `base/utils.go:737-750`
    val sql = "CREATE TABLE t (id INT, name VARCHAR(10), extra DECIMAL(5,2), PRIMARY KEY (id))"
    val out = DdlRewriter.pruneCreateTableColumns(sql, Seq("id", "name"))
    assert(out.contains("id INT") && out.contains("name VARCHAR(10)"))
    assert(!out.contains("extra"))
    assert(out.contains("PRIMARY KEY (id)"))
    // the columnMap dictates ORDER (reference RenameCreateTable golden
    // `utils_test.go:323`: columnMap [val, id] puts val FIRST) — the
    // reference applier binds row values by that ordinal order
    val reordered = DdlRewriter.pruneCreateTableColumns(
      "create table s.t (id int primary key, val int)", Seq("val", "id"))
    assert(reordered == "create table s.t ( val int,id int primary key)")
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

  test("collation downgrade: the reference's own three vectors, verbatim") {
    // reference TestMySQL57CollationReplaceWorkaround (base/utils_test.go:362)
    // incl. the UPPERCASE form — the match is case-insensitive and the
    // replacement lands lowercase, exactly as the reference rewrites it
    import graft.functions.TypeConversions.downgradeCollations
    assert(downgradeCollations(
      "CREATE DATABASE `a` /*!40100 DEFAULT CHARACTER SET utf8mb4 COLLATE utf8mb4_0900_ai_ci */ /*!80016 DEFAULT ENCRYPTION='N' */") ==
      "CREATE DATABASE `a` /*!40100 DEFAULT CHARACTER SET utf8mb4 COLLATE utf8mb4_general_ci */ /*!80016 DEFAULT ENCRYPTION='N' */")
    assert(downgradeCollations(
      "CREATE TABLE `a` (\n  `id` int(11) NOT NULL AUTO_INCREMENT,\n  `val1` varchar(64) DEFAULT NULL,\n  PRIMARY KEY (`id`)\n) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_0900_ai_ci") ==
      "CREATE TABLE `a` (\n  `id` int(11) NOT NULL AUTO_INCREMENT,\n  `val1` varchar(64) DEFAULT NULL,\n  PRIMARY KEY (`id`)\n) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_general_ci")
    assert(downgradeCollations(
      "CREATE TABLE `test`.`char_columns` (`id` INT(11) NOT NULL,`c_char` CHAR(255) DEFAULT NULL,PRIMARY KEY(`id`)) ENGINE = InnoDB\nDEFAULT CHARACTER SET = UTF8MB4\nDEFAULT COLLATE = UTF8MB4_0900_AI_CI") ==
      "CREATE TABLE `test`.`char_columns` (`id` INT(11) NOT NULL,`c_char` CHAR(255) DEFAULT NULL,PRIMARY KEY(`id`)) ENGINE = InnoDB\nDEFAULT CHARACTER SET = UTF8MB4\nDEFAULT COLLATE = utf8mb4_general_ci")
  }
}
