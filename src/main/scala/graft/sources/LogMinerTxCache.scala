package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S7 — the LogMiner transaction cache: redo records grouped per XID,
  * emitted on COMMIT, dropped on ROLLBACK, with partial-rollback records
  * cancelling their earlier same-row changes (SURVEY.md §2.1; reference
  * `driver/oracle/extractor/log_miner.go:394-500` LogMinerTxCache
  * start/commit/rollback/addTxRecord, tests `log_miner_test.go`).
  *
  * The reference keeps one in-process linked-list cache; here the same
  * semantics are expressed two ways:
  *
  *  - [[committedRecords]] — the batch/SQL form: pure key-partitioned
  *    joins on (xid) and (xid, row_id). Nothing touches the driver and
  *    every shuffle is keyed by transaction, so a 100-TB redo archive
  *    replays as an ordinary distributed job.
  *  - [[assemble]] — the streaming form: `flatMapGroupsWithState` keyed
  *    by XID, the same state machine as S2's GTID assembly but with the
  *    Oracle-specific rollback rules.
  *
  * Rollback semantics (reference `addTxRecord`, `log_miner.go:465-480`):
  * a record with rollback flag = 1 is never emitted itself AND removes
  * every earlier record of the same transaction touching the same ROWID
  * (Oracle writes compensating records for partial rollbacks, e.g. a
  * failed statement inside a PL/SQL block). A ROLLBACK terminal op drops
  * the whole transaction.
  */
object LogMinerTxCache {

  /** One LogMiner redo row (reference LogMinerRecord, `log_miner.go:270-330`). */
  case class RedoRecord(
      scn: Long,
      xid: String,
      op: String, // c/u/d DML, or the terminal "commit" / "rollback"
      rowId: String,
      redoSql: String,
      rollback: Int // 1 = compensating record of a partial rollback
  )

  /** An assembled, committed Oracle transaction (reference LogMinerTx). */
  case class OracleTx(xid: String, startScn: Long, endScn: Long, records: Seq[RedoRecord])

  val CommitOp = "commit"
  val RollbackOp = "rollback"

  private def isDml(op: Column): Column = op =!= CommitOp && op =!= RollbackOp

  /** Batch form: from a redo-record DataFrame, keep exactly the records
    * the reference's cache would hand to its Handler — DML of committed
    * transactions, minus rows cancelled by partial rollbacks — each tagged
    * with its transaction's commit SCN (`end_scn`).
    *
    * Columns required: scn (long), xid, op, row_id, rollback (int).
    * All other columns pass through. Assumes XIDs are not recycled within
    * the input (Oracle XIDs are usn.slot.sqn — unique per tx in an
    * archive); the streaming form handles recycling.
    */
  def committedRecords(redo: DataFrame): DataFrame = {
    // last partial-rollback SCN per (xid, row_id): a record survives iff
    // it was written after every compensating record for its row
    val rbMax = redo.filter(isDml(col("op")) && col("rollback") === 1)
      .groupBy("xid", "row_id").agg(max("scn").as("rb_scn"))
    val commits = redo.filter(col("op") === CommitOp)
      .groupBy("xid").agg(min("scn").as("end_scn"))
    val rollbacks = redo.filter(col("op") === RollbackOp).select("xid").distinct()
    redo.filter(isDml(col("op")) && col("rollback") === 0)
      .join(rbMax, Seq("xid", "row_id"), "left")
      .filter(col("rb_scn").isNull || col("scn") > col("rb_scn"))
      .drop("rb_scn")
      .join(commits, Seq("xid"))
      .join(rollbacks, Seq("xid"), "left_anti")
  }

  /** csf=1 continuation-record reassembly (reference GetLogMinerRecord,
    * `log_miner.go:293-320`): a redo record whose SQL exceeds 4000 bytes
    * spans several consecutive `V$LOGMNR_CONTENTS` rows — every piece
    * but the last carries csf=1, and the record's metadata is the FIRST
    * piece's. The reference concatenates pieces while iterating the
    * cursor; here the same run-detection distributes as a per-xid
    * window: all pieces of one record belong to the same transaction and
    * are consecutive in log order, so a piece opens a new record iff its
    * predecessor within the xid finished one (csf=0 or none). No global
    * single-partition window — parallelism is per transaction, and a
    * record's piece list is bounded by its own SQL length.
    *
    * Input: `xid`, `csf` (1 = continued in next row), `redo_sql`, and a
    * total log order `seqCol`; all other columns pass through from the
    * first piece. Output: one row per record, `redo_sql` concatenated,
    * `csf` dropped, plus `n_pieces`. A trailing csf=1 run truncated by
    * the window end is emitted as-is, like the reference's cursor loop.
    */
  def reassembleCsf(redo: DataFrame, seqCol: String = "seq"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("xid")).orderBy(col(seqCol))
    val run = Window.partitionBy(col("xid")).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val metaCols = redo.columns.filterNot(c => c == "redo_sql" || c == "csf").toSeq
    val recs = redo
      .withColumn("_rec_id",
        // coalesce: lag's default only covers the missing first row — a
        // NULL csf VALUE in the predecessor must also read as "finished"
        sum(when(coalesce(lag(col("csf"), 1, 0).over(w), lit(0)) === 0, 1L)
          .otherwise(0L)).over(run))
      .groupBy(col("xid"), col("_rec_id"))
      .agg(array_sort(collect_list(struct(
        col(seqCol).as("_s"),
        struct(metaCols.map(col): _*).as("_meta"),
        col("redo_sql").as("_p")))).as("_pieces"))
    recs.select(
      metaCols.map(c => col("_pieces").getItem(0).getField("_meta").getField(c).as(c)) :+
        array_join(expr("transform(_pieces, x -> x._p)"), "").as("redo_sql") :+
        size(col("_pieces")).as("n_pieces"): _*)
  }

  /** Streaming form of the same cache: one state entry per active XID
    * (reference keeps the whole active-tx list in one process; Spark
    * shards it across executors by key). Commit emits the transaction in
    * SCN order; rollback clears; a timeout (crash-recovery hygiene —
    * reference instead re-reads from `oldestUncommittedScn`,
    * `log_miner.go:482-520`) drops abandoned transactions.
    */
  def assemble(records: Dataset[RedoRecord], timeoutMs: Long = 0): Dataset[OracleTx] = {
    import records.sparkSession.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    records
      .groupByKey(_.xid)
      .flatMapGroupsWithState[List[RedoRecord], OracleTx](OutputMode.Append, timeoutConf) {
        (xid: String, incoming: Iterator[RedoRecord], state: GroupState[List[RedoRecord]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var buf = state.getOption.getOrElse(Nil)
            var emitted: List[OracleTx] = Nil
            incoming.toSeq.sortBy(_.scn).foreach { r =>
              r.op match {
                case CommitOp =>
                  if (buf.nonEmpty)
                    emitted ::= OracleTx(xid, buf.map(_.scn).min, r.scn, buf.sortBy(_.scn))
                  buf = Nil // XIDs recycle: a later record opens a fresh tx
                case RollbackOp =>
                  buf = Nil
                case _ if r.rollback == 1 =>
                  buf = buf.filterNot(_.rowId == r.rowId)
                case _ =>
                  buf ::= r
              }
            }
            if (buf.isEmpty) state.remove()
            else {
              state.update(buf)
              if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            }
            emitted.iterator
          }
      }
  }
}
