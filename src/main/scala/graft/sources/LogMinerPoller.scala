package graft.sources

import java.sql.Connection

/** S7's poll loop itself — the piece that was "the live JDBC
  * connection" in every prior round — as driver-side code over the
  * standard `java.sql` interfaces (reference LoopLogminerRecord,
  * `driver/oracle/extractor/log_miner.go:733-818`; window statements
  * and the rotation/idle/mine decision are [[LogMinerSession]]'s
  * already-oracled plans, executed here instead of just printed).
  *
  * The loop runs on the DRIVER: LogMiner is a per-session server-side
  * cursor (a DBMS_LOGMNR session belongs to one connection), so the
  * fetch is inherently single-connection — the reference's loop is the
  * same shape. Scale comes after the fetch: each polled window's rows
  * go to executors as a DataFrame for csf reassembly, tx assembly,
  * redo parsing, and sink apply (all existing oracled operators). A
  * 100 TB deployment bounds this hop by windowSize, exactly like the
  * reference's 5-second windows.
  *
  * Everything here takes `java.sql.Connection` — the REAL integration
  * surface a production Oracle endpoint presents. The spec drives it
  * through `DriverManager` against an in-JVM fake that validates the
  * dialogue (files registered before mining, windows contiguous,
  * session ended on rotation) — the same honest-substitute standard as
  * the MySQL and Kafka loopbacks; only a TNS endpoint remains external.
  */
object LogMinerPoller {

  /** One V$LOGMNR_CONTENTS row as fetched — the 13 columns of
    * [[LogMinerSession.contentsQuery]] (reference LogMinerRecord,
    * `log_miner.go:270-330`).
    */
  case class ContentsRow(scn: Long, segOwner: String, tableName: String,
                         sqlRedo: String, sqlUndo: String, operationCode: Int,
                         xid: String, csf: Int, rowId: String, rollback: Int,
                         rsId: String, timestamp: String, username: String)

  /** One loop iteration's outcome. */
  case class Polled(action: String, startScn: Long, endScn: Long,
                    rows: Seq[ContentsRow], state: LogMinerSession.WindowState)

  private def withStatement[A](conn: Connection)(body: java.sql.Statement => A): A = {
    val st = conn.createStatement()
    try body(st) finally st.close()
  }

  /** Log-file discovery + registration + dictionary build — the
    * session (re)init the reference runs at start and after every redo
    * rotation (`GetLogFileBySCN` + `BuildLogMiner`). Returns the
    * registered file names.
    */
  def discoverAndRegister(conn: Connection, scn: Long): Seq[String] = {
    val names = withStatement(conn) { st =>
      val rs = st.executeQuery(LogMinerSession.logFilesQuery(scn))
      try {
        val b = Seq.newBuilder[String]
        while (rs.next()) b += rs.getString("name")
        b.result()
      } finally rs.close()
    }
    require(names.nonEmpty, s"no redo/archived log covers SCN $scn")
    names.foreach { n =>
      withStatement(conn)(_.execute(LogMinerSession.addLogfileStatement(n)))
    }
    withStatement(conn)(_.execute(LogMinerSession.buildDictionaryStatement))
    names
  }

  def probeCurrentScn(conn: Connection): Long = withStatement(conn) { st =>
    val rs = st.executeQuery(LogMinerSession.currentScnQuery)
    try { require(rs.next(), "empty V$DATABASE probe"); rs.getLong("current_scn") }
    finally rs.close()
  }

  def probeRedoFingerprint(conn: Connection): String = withStatement(conn) { st =>
    val rs = st.executeQuery(LogMinerSession.redoFingerprintQuery)
    try {
      val b = Seq.newBuilder[String]
      while (rs.next())
        b += s"${rs.getLong("group#")}:${rs.getLong("thread#")}:${rs.getLong("sequence#")}"
      b.result().sorted.mkString(";")
    } finally rs.close()
  }

  /** Mine one bounded window: start_logmnr, fetch the contents rows,
    * end_logmnr (each window is its own LogMiner session, the
    * StartLogMinerBySCN2-per-window shape).
    */
  def mineWindow(conn: Connection, startScn: Long, endScn: Long,
                 filter: String): Seq[ContentsRow] = {
    withStatement(conn)(_.execute(LogMinerSession.startWindowStatement(startScn, endScn)))
    try withStatement(conn) { st =>
      val rs = st.executeQuery(LogMinerSession.contentsQuery(startScn, endScn, filter))
      try {
        val b = Seq.newBuilder[ContentsRow]
        while (rs.next()) b += ContentsRow(
          scn = rs.getLong("scn"),
          segOwner = rs.getString("seg_owner"),
          tableName = rs.getString("table_name"),
          sqlRedo = rs.getString("sql_redo"),
          sqlUndo = rs.getString("sql_undo"),
          operationCode = rs.getInt("operation_code"),
          xid = rs.getString("xid"),
          csf = rs.getInt("csf"),
          rowId = rs.getString("row_id"),
          rollback = rs.getInt("rollback"),
          rsId = rs.getString("rs_id"),
          timestamp = rs.getString("timestamp"),
          username = rs.getString("username"))
        b.result()
      } finally rs.close()
    } finally withStatement(conn)(_.execute(LogMinerSession.endSessionStatement))
  }

  /** One poll iteration — probes, then the [[LogMinerSession.advance]]
    * decision executed: Reinit re-registers files (rotation), Idle does
    * nothing, Mine fetches the window. The returned state carries the
    * advanced low edge exactly as `advance` computed it.
    */
  def pollOnce(conn: Connection, state: LogMinerSession.WindowState,
               filter: String): Polled = {
    val endScn = probeCurrentScn(conn)
    val fp = probeRedoFingerprint(conn)
    LogMinerSession.advance(state, endScn, fp) match {
      case (LogMinerSession.Reinit(scn), s2) =>
        discoverAndRegister(conn, scn)
        Polled("reinit", scn, scn, Nil, s2)
      case (LogMinerSession.Idle, s2) =>
        Polled("idle", s2.startScn, s2.startScn, Nil, s2)
      case (LogMinerSession.Mine(lo, hi), s2) =>
        Polled("mine", lo, hi, mineWindow(conn, lo, hi, filter), s2)
    }
  }

  /** Bounded poll loop for drains and tests: iterate until
    * `maxConsecutiveIdles` probes bring nothing new (a production
    * deployment loops forever with a sleep where the reference sleeps
    * 5 s). Initializes the session at `startScn` first. Returns the
    * final state (resume point) and every mined window in order.
    */
  def drain(conn: Connection, startScn: Long, filter: String,
            maxConsecutiveIdles: Int = 2, maxIterations: Int = 1000): (LogMinerSession.WindowState, Seq[Polled]) = {
    discoverAndRegister(conn, startScn)
    var state = LogMinerSession.WindowState(startScn, probeRedoFingerprint(conn))
    val polls = Seq.newBuilder[Polled]
    var idles = 0
    var i = 0
    while (idles < maxConsecutiveIdles && i < maxIterations) {
      val p = pollOnce(conn, state, filter)
      state = p.state
      if (p.action == "idle") idles += 1 else { idles = 0; polls += p }
      i += 1
    }
    (state, polls.result())
  }

  /** Bridge a polled batch into the verified operator chain: rows →
    * DataFrame → csf reassembly ([[LogMinerTxCache.reassembleCsf]]) →
    * op-code mapping → the RedoRecord frame [[LogMinerTxCache
    * .committedRecords]] and [[RedoSqlParser]] consume. OpStart rows
    * carry no payload (the tx cache keys on xid alone) and MissScn
    * markers are gap telemetry — both drop here, like the reference's
    * switch discards them after bookkeeping.
    */
  def toRedoFrame(spark: org.apache.spark.sql.SparkSession,
                  rows: Seq[ContentsRow]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import LogMinerSession._
    val df = spark.createDataFrame(rows)
      .filter(!col("operationCode").isin(OpStart, OpMissScn))
    val reassembled = LogMinerTxCache.reassembleCsf(
      df.withColumnRenamed("sqlRedo", "redo_sql"), seqCol = "scn")
    reassembled.select(
      col("scn"), col("xid"),
      when(col("operationCode") === OpInsert, "c")
        .when(col("operationCode") === OpDelete, "d")
        .when(col("operationCode") === OpUpdate, "u")
        .when(col("operationCode") === OpDdl, "ddl")
        .when(col("operationCode") === OpCommit, "commit")
        .when(col("operationCode") === OpRollback, "rollback")
        // unreachable through contentsQuery's IN-list; loud, not null —
        // a silently-nulled op would leak rows past the tx cache
        .otherwise(raise_error(concat(
          lit("unknown LogMiner operation_code "), col("operationCode"))))
        .as("op"),
      col("rowId").as("row_id"),
      col("redo_sql"),
      col("rollback"))
  }
}
