package graft.ddl

import graft.functions.TypeConversions
import graft.model.ReplicationSpec

/** The canonical DDL control-path for a K5 barrier handler — the same
  * order the reference runs its query-event path (SURVEY.md §2.3):
  * charset decode (`binlog_reader.go:543-548`) → always-skip regexes →
  * routing gate (`skipQueryDDL`, `:1200-1226`) → multi-table DROP list
  * filtering (`resolveQuery`, `:1123-1150`) → schema-registry replay →
  * identifier rename + collation downgrade (`loadMapping`, `:847-957`).
  *
  * Composes the individually-tested pieces so a
  * [[graft.streaming.CdcPipeline]] `ddlHandler` is one call. Driver-side
  * control path: one statement at a time, throughput irrelevant.
  */
object DdlProcessor {

  /** Outcome for one DDL statement at a barrier.
    *
    * @param sql           statement to forward to the target (renamed,
    *                      collation-downgraded); None = skip entirely
    * @param kind          classification (feeds F4/F5 gates and metrics)
    * @param schemaChanged the registry mutated — the replan signal
    *                      (restart dependent streaming queries with the
    *                      new schema)
    */
  case class Outcome(sql: Option[String], kind: DdlRewriter.DdlKind, schemaChanged: Boolean)

  /** Process one decoded DDL statement. For a statement arriving as raw
    * bytes from a non-UTF-8 session, decode first with
    * [[TypeConversions.ddlToUtf8]] (character_set_client).
    */
  def process(db: String, table: String, rawSql: String,
              spec: ReplicationSpec,
              registry: SchemaRegistry,
              renameSchema: Map[String, String] = Map.empty,
              renameTable: Map[(String, String), (String, String)] = Map.empty,
              lowerCaseTableNames: Boolean = false): Outcome = {
    import DdlRewriter._
    // lower_case_table_names != 0: normalize idents before everything
    // else, so routing, registry keys, and rename maps see lowercase
    // (reference mayLowerTable runs first in resolveQuery)
    val sql = if (lowerCaseTableNames) lowerIdents(rawSql) else rawSql
    val (db1, table1) =
      if (lowerCaseTableNames) (db.toLowerCase, table.toLowerCase) else (db, table)
    val kind = classify(sql)
    if (kind == SkippedStmt) return Outcome(None, kind, schemaChanged = false)
    // expand-syntax statements (grants, user admin, procedures, SET
    // PASSWORD, FLUSH): forwarded VERBATIM under the opt-in flag — no
    // table registry to replay, no identifier rewrite (the reference
    // sends the original query text through setDtleQuery,
    // `binlog_reader.go:590-604`); skipped entirely when the flag is off
    if (kind == ExpandStmt)
      return if (spec.expandSyntaxSupport) Outcome(Some(sql), kind, schemaChanged = false)
             else Outcome(None, kind, schemaChanged = false)

    val routedSql = kind match {
      case DropTable =>
        // per-table routing (resolveQuery): drop the tables the route
        // skips from the list; all-skipped → skip the whole statement
        val skipFn = (s: String, t: String) => !shouldApply(sql, s, t, spec)
        val (filtered, kept) = filterDropTables(sql, db1, skipFn)
        if (kept.isEmpty) None else Some(filtered)
      case _ =>
        if (shouldApply(sql, db1, table1, spec)) Some(sql) else None
    }
    routedSql match {
      case None => Outcome(None, kind, schemaChanged = false)
      case Some(s) =>
        // registry replays SOURCE-side idents (before rename: it mirrors
        // the source's information_schema, reference sqle inspector)
        val changed = registry.applyDdl(db1, s)
        val out = TypeConversions.downgradeCollations(
          rewrite(s, renameSchema, renameTable, defaultSchema = db1))
        Outcome(Some(out), kind, changed)
    }
  }
}
