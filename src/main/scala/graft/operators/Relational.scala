package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model._

/** Row-level filters / projections / renames / routing — SURVEY.md §2.3
  * (F1-F10) re-expressed as declarative Catalyst transforms so pushdown,
  * pruning and constant folding are free (SURVEY §4).
  *
  * All of these are `DataFrame => DataFrame` and keep the plan inside
  * whole-stage codegen: no UDFs, no collects.
  */
object Relational {

  /** F1 — per-table row predicate. The reference parses a qlbridge
    * expression and interprets it row-at-a-time on the extractor
    * (`driver/common/tabletypes.go:151-235`, applied
    * `binlog_reader.go:1927-1983`); Spark SQL is a superset of that
    * expression surface, so `expr` compiles it into codegen'd predicates
    * and pushes it into the scan (`dumper.go:150` equivalent for free).
    * The reference's `IsDefault` fast path for `"true"` is Catalyst
    * constant folding. F2: the reference's registered scalar functions
    * (pow, sqrt, replace, upper/lower/ucase/lcase, char_length,
    * unix_timestamp, now, uuid — `tabletypes.go:15-27`) are all Spark
    * built-ins, usable directly in the predicate.
    */
  def whereFilter(df: DataFrame, where: String): DataFrame =
    if (where == null || where.trim.isEmpty || where.trim == "true") df
    else df.filter(expr(where))

  /** F6 — projection by column map (`ColumnMapFrom`); the reference binds
    * names to ordinals and re-projects rows imperatively
    * (`driver/mysql/mysqlconfig/types.go:204-214`,
    * `binlog_reader.go:1985-1998`); here it is a `select`, which Catalyst
    * turns into parquet column pruning (`ReadSchema` shrinks).
    */
  def columnMap(df: DataFrame, from: Seq[String], to: Seq[String] = Nil): DataFrame = {
    val projected = df.select(from.map(col): _*)
    if (to.isEmpty) projected
    else projected.toDF(to: _*)
  }

  /** F7 — literal or regex capture-group rename of a (schema, table)
    * pair, reference `binlog_reader.go:1449-1565` / `reg.ExpandString`.
    * Go's `$1` templates map to Java's `$1` replacement syntax directly.
    * With `routeFilter` this is S6 table discovery: catalog names flow
    * through include/exclude lists and regex expansion
    * (reference inspectTables, `extractor.go:383-565`).
    */
  def renameTable(schema: String, table: String, spec: SchemaSpec): (String, String) = {
    val outSchema = spec.schemaRegex match {
      case Some(re) => schema.replaceAll(re, spec.renameSchema.getOrElse("$0"))
      case None     => spec.renameSchema.getOrElse(schema)
    }
    val tspec = spec.tables.find(t => tableMatches(t, table))
    val outTable = tspec.flatMap(_.renameTable).getOrElse(table)
    (outSchema, outTable)
  }

  private def tableMatches(t: TableSpec, table: String): Boolean =
    t.name == table || (t.name.nonEmpty && t.name.startsWith("^") && table.matches(t.name))

  /** F7 applied to a change-event DataFrame carrying `db`/`table` string
    * columns: regex rename as a codegen'd `regexp_replace`.
    */
  def renameColumns(df: DataFrame, dbRegex: String, dbTemplate: String,
                    tableRegex: String, tableTemplate: String): DataFrame =
    df.withColumn("db", regexp_replace(col("db"), dbRegex, dbTemplate))
      .withColumn("table", regexp_replace(col("table"), tableRegex, tableTemplate))

  /** F3 — do/ignore list routing. The reference walks include/exclude
    * lists per event (`binlog_reader.go:1276-1372` skipRowEvent /
    * matchTable); here the whole matrix folds into one boolean Column so
    * it evaluates inside the scan. System schemas are always excluded
    * (reference `binlog_reader.go:1200-1226`).
    */
  val systemSchemas: Seq[String] = Seq("mysql", "sys", "information_schema", "performance_schema")

  /** The `mysql.*` tables whose ROWS replicate under ExpandSyntaxSupport
    * — the grant/routine tables (reference `skipMysqlSchemaEvent`,
    * `binlog_reader.go:1267-1274`; row gate `:1307-1313`). Everything
    * else in `mysql.*` stays skipped even with the flag on.
    */
  val expandableMysqlTables: Seq[String] =
    Seq("event", "func", "proc", "tables_priv", "columns_priv", "procs_priv", "user")

  def routeFilter(spec: ReplicationSpec, dbCol: Column, tableCol: Column): Column = {
    // reference skipRowEvent switches on the schema FIRST: "mysql" under
    // the expand flag admits the grant tables regardless of doDb (the
    // branch returns before any doDb matching, `binlog_reader.go:1307-1313`)
    val mysqlOk =
      if (spec.expandSyntaxSupport)
        lower(dbCol) === "mysql" && lower(tableCol).isin(expandableMysqlTables: _*)
      else lit(false)
    val notSystem = !lower(dbCol).isin(systemSchemas: _*)
    val included: Column =
      if (spec.doDb.isEmpty) lit(true)
      else spec.doDb.map { s =>
        val schemaOk = s.schemaRegex match {
          case Some(re) => dbCol.rlike(re)
          case None     => dbCol === s.schema
        }
        val tableOk =
          if (s.tables.isEmpty) lit(true)
          else s.tables.map { t =>
            if (tableIsRegex(t)) tableCol.rlike(t.name) else tableCol === t.name
          }.reduce(_ || _)
        schemaOk && tableOk
      }.reduce(_ || _)
    val excluded: Column =
      if (spec.ignoreDb.isEmpty) lit(false)
      else spec.ignoreDb.map { ig =>
        if (ig.tables.isEmpty) dbCol === ig.schema
        else dbCol === ig.schema && tableCol.isin(ig.tables: _*)
      }.reduce(_ || _)
    mysqlOk || (notSystem && included && !excluded)
  }

  /** Regex-ness of a table spec: the explicit flag (reference: non-empty
    * `TableRegex` field) or the `^`-anchored syntactic convention.
    */
  private def tableIsRegex(t: TableSpec): Boolean =
    t.nameIsRegex || t.name.startsWith("^")

  /** Rename semantics of the reference's `ExpandString`
    * (`extractor.go:407-417`, `485-498`): the rename REPLACES the whole
    * name with the expanded template, even when the regex matched only a
    * substring. Wrapping the user regex in a full-line non-capturing
    * envelope makes `regexp_replace` do exactly that — group indices in
    * `$1...` templates are unchanged, and the lazy prefix picks the
    * leftmost match like Go's `FindStringSubmatchIndex`.
    */
  private def expandWholeName(re: String): String = s"(?s)^.*?(?:$re).*$$"

  /** S6 — catalog-driven table discovery: the full driver-side stage the
    * reference runs at job start (inspectTables, `extractor.go:383-565`):
    * walk the source catalog (`SHOW DATABASES/TABLES` ≅ an
    * `information_schema` DataFrame with `db`/`table` columns), apply the
    * do/ignore route matrix, then expand regex specs with `$1`
    * capture-group renames into the concrete replication plan list.
    *
    * First matching `doDb` entry wins (reference walks `ReplicateDoDb` in
    * order); within it, the first matching table spec's rename applies.
    * Pure Column logic — evaluates as one codegen'd projection over the
    * catalog frame, so a 100k-table estate is still a single small job,
    * and the same expression can re-run per micro-batch for DDL-created
    * tables (`binlog_reader.go:1449-1565` dynamic path).
    */
  def discoverTables(catalog: DataFrame, spec: ReplicationSpec): DataFrame = {
    val db = col("db"); val tbl = col("table")
    def schemaCond(s: SchemaSpec): Column = s.schemaRegex match {
      case Some(re) => db.rlike(re)
      case None     => db === s.schema
    }
    def tableCond(s: SchemaSpec): Column =
      if (s.tables.isEmpty) lit(true)
      else s.tables.map { t =>
        if (tableIsRegex(t)) tbl.rlike(t.name) else tbl === t.name
      }.reduce(_ || _)
    def outDbFor(s: SchemaSpec): Column = s.schemaRegex match {
      case Some(re) => regexp_replace(db, expandWholeName(re), s.renameSchema.getOrElse("$0"))
      case None     => s.renameSchema.map(lit(_): Column).getOrElse(db)
    }
    def outTableFor(s: SchemaSpec): Column =
      s.tables.foldRight(tbl: Column) { (t, els) =>
        val cond = if (tableIsRegex(t)) tbl.rlike(t.name) else tbl === t.name
        val renamed = t.renameTable match {
          case Some(tmpl) if tableIsRegex(t) => regexp_replace(tbl, expandWholeName(t.name), tmpl)
          case Some(tmpl)                    => lit(tmpl): Column
          case None                          => tbl
        }
        when(cond, renamed).otherwise(els)
      }
    val routed = catalog.filter(routeFilter(spec, db, tbl))
    val (outDb, outTable) =
      if (spec.doDb.isEmpty) (db, tbl)
      else spec.doDb.foldRight((db, tbl)) { case (s, (elsDb, elsTbl)) =>
        val cond = schemaCond(s) && tableCond(s)
        (when(cond, outDbFor(s)).otherwise(elsDb),
         when(cond, outTableFor(s)).otherwise(elsTbl))
      }
    routed.select(db.as("db"), tbl.as("table"),
      outDb.as("out_db"), outTable.as("out_table"))
  }

  /** F4 — event-kind filter (reference SqlFilter,
    * `binlog_reader.go:110-178`, DML side `1866-1873`): drop ops by kind.
    */
  def opFilter(df: DataFrame, skipOps: Set[String], opCol: String = "op"): DataFrame =
    if (skipOps.isEmpty) df else df.filter(!col(opCol).isin(skipOps.toSeq: _*))

  /** F9/O10 — cycle prevention for bidirectional sync: drop rows whose
    * origin server id is the sink itself (reference
    * `applier_incr.go:290-313`); two symmetric pipelines each running
    * this filter = O10 two-way sync, see TwoWaySyncSpec.
    */
  def cycleFilter(df: DataFrame, selfServerId: String, originCol: String = "originServerId"): DataFrame =
    df.filter(col(originCol) =!= selfServerId)

  /** F10 — idempotence / exactly-once skip: anti-join the incoming stream
    * against the applied-transaction ledger (reference loads the dest
    * `gtid_executed` set and skips contained GTIDs,
    * `applier_incr.go:290-313`). `left_anti` on the ledger key is the
    * Spark-native equivalent; broadcast the ledger when it is small.
    */
  def idempotenceFilter(events: DataFrame, ledger: DataFrame, key: String): DataFrame = {
    val l = if (ledger.isStreaming) ledger else broadcast(ledger)
    events.join(l.select(key).distinct(), Seq(key), "left_anti")
  }

  /** §7.2 minimum slice composed: filter → project → rename, the spine of
    * the reference's per-table transform chain (F1 + F6 + F7).
    */
  def tableTransform(df: DataFrame, spec: TableSpec): DataFrame = {
    val filtered = spec.where.map(w => whereFilter(df, w)).getOrElse(df)
    if (spec.columnMapFrom.nonEmpty) columnMap(filtered, spec.columnMapFrom, spec.columnMapTo)
    else filtered
  }
}
