package graft.sources

/** S7 session layer — everything the reference's LogMiner poll loop
  * computes BETWEEN database calls, as deterministic text + a pure
  * state machine (reference `driver/oracle/extractor/log_miner.go`:
  * GetLogFileBySCN `:36-70`, BuildLogMiner `:111-117`,
  * StartLogMinerBySCN2 `:119-136`, GetLogMinerRecord's
  * V$LOGMNR_CONTENTS query `:238-266`, buildFilterSchemaTable
  * `:198-236`, and the 5-second window loop `:782-818`). With
  * [[LogMinerTxCache]] (tx assembly, csf reassembly) and
  * [[RedoSqlParser]] (redo-SQL → rows, AS-OF-SCN chunks), the only
  * S7 piece left outside this repo is the live JDBC connection the
  * sandbox cannot host.
  *
  * Everything here is session-plan text and window arithmetic — one
  * value in, one value out — so the whole layer is oracled/spec-tested
  * without an Oracle instance.
  */
object LogMinerSession {

  // V$LOGMNR_CONTENTS operation codes (public view documentation)
  val OpInsert = 1
  val OpDelete = 2
  val OpUpdate = 3
  val OpDdl = 5
  val OpStart = 6
  val OpCommit = 7
  val OpMissScn = 34
  val OpRollback = 36

  /** Schemas LogMiner rows are never replicated from (the reference's
    * hardcoded exclusion list).
    */
  val systemSchemas: Seq[String] = Seq(
    "SYS", "SYSTEM", "APPQOSSYS", "AUDSYS", "CTXSYS", "DVSYS", "DBSFWUSER",
    "DBSNMP", "GSMADMIN_INTERNAL", "LBACSYS", "MDSYS", "OJVMSYS", "OLAPSYS",
    "ORDDATA", "ORDSYS", "OUTLN", "WMSYS", "XDB")

  /** Discover the redo/archived log files covering an SCN — the union
    * over v$log (CURRENT/ACTIVE groups) and v$archived_log.
    */
  def logFilesQuery(scn: Long): String =
    s"""SELECT MIN(name) name, first_change#
       |FROM (
       |  SELECT MIN(member) AS name, first_change#, 281474976710655 AS next_change#
       |  FROM v$$log l INNER JOIN v$$logfile f ON l.group# = f.group#
       |  WHERE l.STATUS = 'CURRENT' OR l.STATUS = 'ACTIVE'
       |  GROUP BY first_change#
       |  UNION
       |  SELECT name, first_change#, next_change#
       |  FROM v$$archived_log WHERE name IS NOT NULL
       |)
       |WHERE first_change# >= $scn OR $scn < next_change#
       |GROUP BY first_change# ORDER BY first_change#""".stripMargin

  /** Register each discovered log file with the session. */
  def addLogfileStatement(fileName: String): String =
    s"BEGIN DBMS_LOGMNR.add_logfile ( '${fileName.replace("'", "''")}' ); END;"

  /** Write the dictionary into the redo stream so DDL tracking works. */
  val buildDictionaryStatement: String =
    "BEGIN DBMS_LOGMNR_D.build (options => DBMS_LOGMNR_D.STORE_IN_REDO_LOGS); END;"

  /** Mine one bounded SCN window (the loop's per-iteration start). */
  def startWindowStatement(startScn: Long, endScn: Long): String =
    s"""BEGIN DBMS_LOGMNR.start_logmnr (
       |startSCN => $startScn,
       |endScn => $endScn,
       |options => SYS.DBMS_LOGMNR.skip_corruption +
       |SYS.DBMS_LOGMNR.no_sql_delimiter +
       |SYS.DBMS_LOGMNR.NO_ROWID_IN_STMT +
       |SYS.DBMS_LOGMNR.DICT_FROM_REDO_LOGS +
       |SYS.DBMS_LOGMNR.DDL_DICT_TRACKING
       |); END;""".stripMargin

  val endSessionStatement: String = "BEGIN DBMS_LOGMNR.end_logmnr (); END;"

  /** The loop's end-of-window probe. */
  val currentScnQuery: String = "SELECT CURRENT_SCN FROM V$DATABASE"

  /** The current-redo fingerprint probe behind checkRedoLogChanged. */
  val redoFingerprintQuery: String =
    "SELECT GROUP#, THREAD#, SEQUENCE# FROM V$LOG WHERE STATUS = 'CURRENT'"

  /** Do/ignore routing as a V$LOGMNR_CONTENTS predicate — the
    * reference's buildFilterSchemaTable shape: the do-list ORs fold
    * into one `AND( ... )` block, each ignore entry appends its own
    * AND term. Identifiers arrive pre-validated from the job spec;
    * quoting here guards literals only.
    */
  def schemaFilter(doList: Seq[(String, Seq[String])],
                   ignoreList: Seq[(String, Seq[String])]): String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val doTerms = doList.map {
      case (schema, Nil) => s"( seg_owner = ${lit(schema)})"
      case (schema, tables) =>
        s"( seg_owner = ${lit(schema)} AND table_name in (${tables.map(lit).mkString(",")}))"
    }
    val doBlock = if (doTerms.isEmpty) "" else doTerms.mkString(" AND( ", " OR ", " )")
    val ignoreBlock = ignoreList.map {
      case (schema, Nil) => s" AND ( seg_owner <> ${lit(schema)})"
      case (schema, tables) =>
        s" AND ( seg_owner = ${lit(schema)} AND table_name not in (${tables.map(lit).mkString(",")}))"
    }.mkString
    doBlock + ignoreBlock
  }

  /** The window's record fetch: tx-control ops always pass (the cache
    * needs every START/COMMIT/ROLLBACK to assemble transactions); DML
    * and DDL pass the schema routing with system schemas excluded.
    */
  def contentsQuery(startScn: Long, endScn: Long, filter: String): String =
    s"""SELECT scn, seg_owner, table_name, sql_redo, sql_undo, operation_code,
       |  xid, csf, row_id, rollback, rs_id, timestamp, username
       |FROM V$$LOGMNR_CONTENTS
       |WHERE SCN > $startScn AND SCN <= $endScn
       |AND ( (operation_code IN ($OpStart,$OpCommit,$OpMissScn,$OpRollback))
       |  OR (operation_code IN ($OpInsert,$OpDelete,$OpUpdate,$OpDdl)
       |      AND seg_owner not in (${systemSchemas.map(s => s"'$s'").mkString(",")})$filter) )""".stripMargin

  // ---- the 5-second poll loop as a pure state machine ----

  /** What the loop should do next, given the probes' answers. */
  sealed trait Action
  /** Redo log rotated: end session, re-add files, rebuild dictionary. */
  final case class Reinit(logFilesScn: Long) extends Action
  /** Nothing new (endScn caught up with startScn): sleep and re-probe. */
  case object Idle extends Action
  /** Mine (startScn, endScn]: start statement + contents query. */
  final case class Mine(startScn: Long, endScn: Long) extends Action

  final case class WindowState(startScn: Long, redoFingerprint: String)

  /** One loop iteration (reference `log_miner.go:782-818`): rotation
    * forces re-init before anything else; an unchanged end SCN idles;
    * otherwise mine the bounded window and advance the low edge. The
    * caller feeds back the highest SCN it actually processed (the
    * reference advances `startScn` per record, so a crash resumes from
    * the last seen SCN, not the window end).
    */
  def advance(state: WindowState, probedEndScn: Long,
              probedFingerprint: String): (Action, WindowState) = {
    if (probedFingerprint != state.redoFingerprint)
      (Reinit(state.startScn), state.copy(redoFingerprint = probedFingerprint))
    // <= : an SCN probe BEHIND the low edge (failover to a lagging
    // standby) must idle, not mine an inverted window — the rotation
    // branch above is what eventually re-inits after a failover
    else if (probedEndScn <= state.startScn) (Idle, state)
    else (Mine(state.startScn, probedEndScn), state.copy(startScn = probedEndScn))
  }

  /** The fixed-size window plan over a known SCN range — the batch
    * (snapshot/backfill) form of the poll loop, used by the oracled
    * `s7_session_plan` query: windows of `windowSize` SCNs covering
    * (startScn, endScn], each with its start statement and contents
    * query.
    */
  def windowPlan(startScn: Long, endScn: Long, windowSize: Long,
                 filter: String): Seq[(Long, Long, Long, String)] = {
    require(windowSize > 0, "windowSize must be positive")
    val n = math.max(0L, (endScn - startScn + windowSize - 1) / windowSize)
    (0L until n).map { i =>
      val lo = startScn + i * windowSize
      val hi = math.min(endScn, lo + windowSize)
      (i, lo, hi, contentsQuery(lo, hi, filter))
    }
  }
}
