package graft.model

/** Core data model of the engine — the Spark-native re-expression of the
  * reference's replication data model (SURVEY.md §1).
  *
  * The reference models a change as a `DataEvent` (row-oriented tagged
  * unions, before/after pairs for updates; reference
  * `driver/common/type.schema:53-81`) inside a transaction `DataEntry`
  * (`type.schema:83-91`). Here a change is a row of a typed `DataFrame`
  * with a CDC envelope (op / before / after / source coordinates), so
  * Catalyst can optimize through it and Tungsten lays it out columnar.
  */
object Op {
  val Insert = "c" // Debezium-compatible op codes (reference driver/kafka/kafka3.go)
  val Update = "u"
  val Delete = "d"
  val Read   = "r" // snapshot rows
  val Ddl    = "ddl"
}

/** One change event, generic over the table's own columns which travel as
  * `before` / `after` maps in the untyped plumbing or as struct columns in
  * DataFrame form. Mirrors reference `DataEvent` fields
  * (`driver/common/type.schema:53-81`): schema/table/op/rows/ts/pos.
  *
  * @param gtid      transaction id (reference: SID:GNO); groups events
  * @param seq       total order within the stream (reference: SeqenceNumber)
  * @param lastCommitted MTS logical-clock dependency (reference:
  *                  LastCommitted, `driver/mysql/applier_mts.go`)
  */
case class ChangeEvent(
    db: String,
    table: String,
    op: String,
    key: String,
    before: Map[String, String],
    after: Map[String, String],
    tsMillis: Long,
    gtid: String,
    seq: Long,
    lastCommitted: Long,
    originServerId: String
)

/** An assembled transaction — reference `DataEntry`
  * (`driver/common/type.schema:83-91`): coordinates + events + split parts.
  */
case class TxEntry(
    gtid: String,
    seq: Long,
    lastCommitted: Long,
    events: Seq[ChangeEvent],
    index: Int = 0,
    isFinal: Boolean = true
)

/** Per-table replication spec — reference `Table`
  * (`driver/common/tabletypes.go:94-112`): rename (literal or regex
  * capture-group), column map, row filter.
  */
case class TableSpec(
    schema: String,
    name: String,
    renameSchema: Option[String] = None,
    renameTable: Option[String] = None,
    /** qlbridge-style row predicate; Spark SQL is a strict superset so it
      * compiles with `functions.expr` (reference `tabletypes.go:151-235`). */
    where: Option[String] = None,
    columnMapFrom: Seq[String] = Nil,
    columnMapTo: Seq[String] = Nil,
    /** `name` is a regex (reference: non-empty `TableRegex` field,
      * `tabletypes.go:96`). Regexes starting with `^` are detected
      * without the flag; an unanchored regex needs it set explicitly —
      * matching is substring (Go `MatchString` ≅ `rlike`) either way. */
    nameIsRegex: Boolean = false
)

/** Schema-level include entry — reference `DataSource` in `ReplicateDoDb`
  * (`driver/common/tabletypes.go:72-92`): exact name or regex with
  * capture-group rename template.
  */
case class SchemaSpec(
    schema: String,
    schemaRegex: Option[String] = None,
    renameSchema: Option[String] = None,
    tables: Seq[TableSpec] = Nil
)

/** Ignore entry — schema-level (no tables) or table-level. */
case class IgnoreSpec(schema: String, tables: Seq[String] = Nil)

/** Whole-job replication config — the data-plane subset of the reference's
  * `DtleTaskConfig` (`driver/common/taskconfig.go:38-82`).
  */
case class ReplicationSpec(
    doDb: Seq[SchemaSpec] = Nil,
    ignoreDb: Seq[IgnoreSpec] = Nil,
    /** event-kind filter — reference SqlFilter (`binlog_reader.go:110-178`) */
    skipOps: Set[String] = Set.empty,
    /** skip rows originating from this server id — cycle prevention for
      * bidirectional sync (reference `applier_incr.go:290-313`) */
    selfServerId: Option[String] = None,
    /** opt-in replication of expand-syntax statements (grants, user
      * admin, procedures, SET PASSWORD, FLUSH) and of DML on the
      * replicable `mysql.*` grant tables — the reference's
      * `ExpandSyntaxSupport` job flag (`taskconfig.go`, consumed at
      * `binlog_reader.go:560-567,1203,1309`). Default off: those
      * statements are skipped, exactly like the reference default. */
    expandSyntaxSupport: Boolean = false
)
