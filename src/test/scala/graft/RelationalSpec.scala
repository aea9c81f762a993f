package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.operators.Relational

/** F1-F10 — relational transform semantics on small frames. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0)
  ).toDF("id", "name", "v")

  test("whereFilter compiles a qlbridge-style predicate via expr") {
    assert(Relational.whereFilter(df, "v > 15 and upper(name) != 'CAROL'").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // 'true' fast path (reference IsDefault) keeps all rows
    assert(Relational.whereFilter(df, "true").count() == 3)
    assert(Relational.whereFilter(df, "  ").count() == 3)
  }

  test("columnMap projects and renames by ordinal-free name map") {
    val out = Relational.columnMap(df, Seq("id", "v"), Seq("pk", "value"))
    assert(out.columns.toSeq == Seq("pk", "value"))
    assert(out.count() == 3)
  }

  test("renameTable: literal and regex capture-group") {
    val lit = SchemaSpec("db1", renameSchema = Some("db1_r"),
      tables = Seq(TableSpec("db1", "t1", renameTable = Some("t1_r"))))
    assert(Relational.renameTable("db1", "t1", lit) == ("db1_r", "t1_r"))
    val re = SchemaSpec("", schemaRegex = Some("^sbtest(\\d+)$"), renameSchema = Some("bench_$1"))
    assert(Relational.renameTable("sbtest7", "t", re) == ("bench_7", "t"))
  }

  test("routeFilter: include regex, exclude table, system schemas") {
    val events = Seq(
      ("db1", "t1"), ("db1", "secret"), ("sbtest3", "x"), ("mysql", "user"), ("other", "t")
    ).toDF("db", "table")
    val spec = ReplicationSpec(
      doDb = Seq(SchemaSpec("db1"), SchemaSpec("", schemaRegex = Some("^sbtest\\d+$"))),
      ignoreDb = Seq(IgnoreSpec("db1", Seq("secret"))))
    val kept = events.filter(Relational.routeFilter(spec, col("db"), col("table")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == Set(("db1", "t1"), ("sbtest3", "x")))
  }

  test("routeFilter: ExpandSyntaxSupport admits mysql grant tables only") {
    // reference skipRowEvent mysql branch (`binlog_reader.go:1307-1313`)
    // + skipMysqlSchemaEvent table list (`:1267-1274`)
    val events = Seq(
      ("mysql", "user"), ("mysql", "proc"), ("mysql", "db"),
      ("sys", "t"), ("db1", "t1")
    ).toDF("db", "table")
    val spec = ReplicationSpec(doDb = Seq(SchemaSpec("db1")),
      expandSyntaxSupport = true)
    val kept = events.filter(Relational.routeFilter(spec, col("db"), col("table")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // grant tables user/proc open; mysql.db and sys.* stay closed;
    // normal routing is unaffected
    assert(kept == Set(("mysql", "user"), ("mysql", "proc"), ("db1", "t1")))
  }

  test("opFilter drops configured event kinds") {
    val ev = Seq(("1", "c"), ("2", "u"), ("3", "d")).toDF("id", "op")
    assert(Relational.opFilter(ev, Set("d")).count() == 2)
    assert(Relational.opFilter(ev, Set.empty).count() == 3)
  }

  test("cycleFilter drops self-originated rows") {
    val ev = Seq(("1", "s1"), ("2", "s2")).toDF("id", "originServerId")
    assert(Relational.cycleFilter(ev, "s1").collect().map(_.getString(0)).toSeq == Seq("2"))
  }

  test("idempotenceFilter anti-joins the applied ledger") {
    val ev = Seq("g1", "g2", "g3").toDF("gtid")
    val ledger = Seq("g2").toDF("gtid")
    assert(Relational.idempotenceFilter(ev, ledger, "gtid")
      .collect().map(_.getString(0)).toSet == Set("g1", "g3"))
  }

  test("discoverTables: regex expansion, $1 renames, first-match wins (S6)") {
    val catalog = Seq(
      ("src1", "users"), ("src2", "orders"), ("src3", "x"), ("src12", "y"),
      ("mysql", "user"), ("wiki", "pages")
    ).toDF("db", "table")
    val spec = ReplicationSpec(
      doDb = Seq(
        // regex spec first: matches src1/src2 (single digit), renames both levels
        SchemaSpec("", schemaRegex = Some("^src(\\d)$"), renameSchema = Some("shard_$1"),
          tables = Seq(TableSpec("", "^(.*)$", renameTable = Some("t_$1")))),
        // exact spec later: would also match src2 — must NOT win over the regex spec
        SchemaSpec("src2", renameSchema = Some("never")),
        SchemaSpec("src12")),
      ignoreDb = Seq(IgnoreSpec("src3")))
    val got = Relational.discoverTables(catalog, spec)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      ("src1", "users", "shard_1", "t_users"),
      ("src2", "orders", "shard_2", "t_orders"),
      ("src12", "y", "src12", "y")))
  }

  test("discoverTables: unanchored regex rename replaces the WHOLE name (ExpandString semantics)") {
    // reference extractor.go:485-498 — the rename is the expanded
    // template, not a substring substitution inside the original name
    val catalog = Seq(("db1", "prod_tbl42_x"), ("db1", "plain")).toDF("db", "table")
    val spec = ReplicationSpec(doDb = Seq(
      SchemaSpec("db1", tables = Seq(
        TableSpec("", "tbl(\\d+)", renameTable = Some("t_$1"), nameIsRegex = true)))))
    val got = Relational.discoverTables(catalog, spec)
      .collect().map(r => (r.getString(1), r.getString(3))).toSet
    assert(got == Set(("prod_tbl42_x", "t_42")))
  }

  test("discoverTables: empty doDb passes all non-system tables unrenamed") {
    val catalog = Seq(("a", "t"), ("sys", "x")).toDF("db", "table")
    val got = Relational.discoverTables(catalog, ReplicationSpec())
      .collect().map(r => (r.getString(0), r.getString(2), r.getString(3))).toSet
    assert(got == Set(("a", "a", "t")))
  }

  test("tableTransform composes filter + projection (§7.2 slice)") {
    val spec = TableSpec("db", "t", where = Some("v > 15"),
      columnMapFrom = Seq("id", "name"), columnMapTo = Seq("id", "customer"))
    val out = Relational.tableTransform(df, spec)
    assert(out.columns.toSeq == Seq("id", "customer"))
    assert(out.count() == 2)
  }
}
