package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.SqlBuilder
import graft.sinks.SqlBuilder.TableDef

/** Golden-string DML generation tests mirroring the reference's
  * table-driven style (`driver/mysql/sql/builder_test.go:31-746`):
  * normalize whitespace then compare statement text.
  */
class SqlBuilderSpec extends AnyFunSuite {

  private val t = TableDef("mydb", "tbl", Seq("id", "name", "rank", "position"), Seq("id"))
  private val noPk = t.copy(pkColumns = Nil)

  private def norm(s: String) = s.replaceAll("\\s+", " ").trim

  test("replace into single row") {
    assert(norm(SqlBuilder.replaceInto(t, 1)) ==
      "REPLACE INTO `mydb`.`tbl` (`id`, `name`, `rank`, `position`) VALUES (?, ?, ?, ?)")
  }

  test("replace into multi-row tiers") {
    val sql = SqlBuilder.replaceInto(t, 3)
    assert(norm(sql).endsWith("VALUES (?, ?, ?, ?), (?, ?, ?, ?), (?, ?, ?, ?)"))
  }

  test("tier plan decomposes batch size greedily (128/8/4/1)") {
    assert(SqlBuilder.tierPlan(300) == Seq(128 -> 2, 8 -> 5, 4 -> 1))
    assert(SqlBuilder.tierPlan(7) == Seq(4 -> 1, 1 -> 3))
    assert(SqlBuilder.tierPlan(1) == Seq(1 -> 1))
    assert(SqlBuilder.tierPlan(0) == Seq())
    // plan always reconstructs the batch size
    Seq(1, 5, 130, 1000).foreach { n =>
      assert(SqlBuilder.tierPlan(n).map { case (t, c) => t * c }.sum == n)
    }
  }

  test("custom tiers from job config: normalized and exact") {
    // config-order input, duplicates, missing terminal 1 — normalize
    assert(SqlBuilder.normalizeTiers(Seq(16, 64, 16, 0, -3)) == Seq(64, 16, 1))
    assert(SqlBuilder.normalizeTiers(Seq(64, 16, 1)) == Seq(64, 16, 1))
    val tiers = SqlBuilder.normalizeTiers(Seq(64, 16))
    assert(SqlBuilder.tierPlan(100, tiers) == Seq(64 -> 1, 16 -> 2, 1 -> 4))
    Seq(1, 5, 130, 1000).foreach { n =>
      assert(SqlBuilder.tierPlan(n, tiers).map { case (t, c) => t * c }.sum == n)
    }
  }

  test("delete targets PK with LIMIT 1") {
    assert(norm(SqlBuilder.delete(t)) ==
      "DELETE FROM `mydb`.`tbl` WHERE (`id` = ? OR (`id` IS NULL AND ? IS NULL)) LIMIT 1")
  }

  test("delete without PK matches all columns null-safely") {
    val sql = norm(SqlBuilder.delete(noPk))
    assert(sql.startsWith("DELETE FROM `mydb`.`tbl` WHERE"))
    Seq("id", "name", "rank", "position").foreach(c => assert(sql.contains(s"`$c` = ?")))
    assert(sql.endsWith("LIMIT 1"))
    assert(SqlBuilder.whereParamsPerRow(noPk) == 8)
  }

  test("update sets all columns, filters by PK, LIMIT 1") {
    assert(norm(SqlBuilder.update(t)) ==
      "UPDATE `mydb`.`tbl` SET `id` = ?, `name` = ?, `rank` = ?, `position` = ? " +
        "WHERE (`id` = ? OR (`id` IS NULL AND ? IS NULL)) LIMIT 1")
  }

  test("full-load prologue disables checks, optional create schema") {
    assert(SqlBuilder.fullLoadPrologue("db1", createSchemaIfNotExists = true)
      .exists(_.contains("CREATE SCHEMA IF NOT EXISTS `db1`")))
    assert(SqlBuilder.fullLoadPrologue("db1", createSchemaIfNotExists = false).size == 2)
  }

  test("ledger DDL and insert shapes") {
    assert(SqlBuilder.ledgerCreate("meta").contains("gtid_executed"))
    assert(norm(SqlBuilder.ledgerInsert("meta")) ==
      "INSERT INTO `meta`.`gtid_executed` (job_id, source_uuid, gtid, gtid_set) VALUES (?, ?, ?, ?)")
  }
}
