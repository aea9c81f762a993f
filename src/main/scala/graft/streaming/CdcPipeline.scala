package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.model._

/** Structured-Streaming form of the reference's incremental pipeline
  * (SURVEY.md §3.3): change events → transaction assembly → per-table
  * transforms → idempotent upsert sink.
  *
  * Reference shape: binlog reader goroutine → handleEvent state machine
  * (`driver/mysql/binlog/binlog_reader.go:450-496`) → NATS → applier MTS
  * workers (`driver/mysql/applier_incr.go`). Spark shape: any streaming
  * DataFrame of [[graft.model.ChangeEvent]] rows (Kafka/Debezium topic,
  * file stream, or a custom MicroBatchStream) → stateful tx assembly →
  * `foreachBatch` sink that repartitions by row key and applies in seq
  * order — the same safety the MTS logical clock provides, from
  * partitioning instead of a clock (SURVEY §2.8 O4/O5).
  */
object CdcPipeline {

  /** S2 — assemble individual row events into transactions keyed by gtid
    * using flatMapGroupsWithState (reference handleEvent state machine:
    * GTID opens, XID closes). A transaction is emitted when its commit
    * event arrives or on timeout (covers trailing/partial groups).
    */
  def assembleTransactions(events: Dataset[ChangeEvent], commitOp: String = "commit",
                           timeoutMs: Long = 30000): Dataset[TxEntry] = {
    import events.sparkSession.implicits._
    // timeoutMs <= 0 → NoTimeout: trailing partial transactions stay
    // pending forever (test mode / strictly commit-bounded streams)
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.gtid)
      .flatMapGroupsWithState[List[ChangeEvent], TxEntry](
        OutputMode.Append, timeoutConf) {
        (gtid: String, incoming: Iterator[ChangeEvent], state: GroupState[List[ChangeEvent]]) =>
          if (state.hasTimedOut) {
            val events = state.getOption.getOrElse(Nil)
            state.remove()
            emit(gtid, events).iterator
          } else {
            val all = state.getOption.getOrElse(Nil) ++ incoming.toList
            val (commits, rows) = all.partition(_.op == commitOp)
            if (commits.nonEmpty) {
              state.remove()
              emit(gtid, rows).iterator
            } else {
              state.update(all)
              if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
              Iterator.empty
            }
          }
      }
  }

  private def emit(gtid: String, events: List[ChangeEvent]): List[TxEntry] =
    if (events.isEmpty) Nil
    else {
      val sorted = events.sortBy(_.seq)
      List(TxEntry(gtid, sorted.last.seq, sorted.head.lastCommitted, sorted))
    }

  /** O1-equivalent trigger config + the full pipeline: stream → route /
    * filter / rename / op-filter (Catalyst) → foreachBatch(sink).
    * Checkpointing gives replay; the sink's ledger gives exactly-once
    * (reference GTID ledger, `applier_gtid_executed.go`).
    */
  def run(events: DataFrame, spec: ReplicationSpec, sink: UpsertSink,
          checkpointDir: String, triggerMs: Long = 1000,
          ddlHandler: Option[DdlBarrierEvent => Unit] = None): StreamingQuery = {
    val routed = events
      .filter(graft.operators.Relational.routeFilter(spec, col("db"), col("table")))
      .transform(df => graft.operators.Relational.opFilter(df, spec.skipOps))
      .transform(df => spec.selfServerId.fold(df)(sid =>
        graft.operators.Relational.cycleFilter(df, sid)))
    routed.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        applyWithDdlBarriers(batch, epochId, sink, ddlHandler)
        ()
      }
      .start()
  }

  /** K5 — DDL as a serial barrier (reference `applier_incr.go:610-674` +
    * MTS `WaitForAllCommitted`, `applier_mts.go:227-234`): rows before a
    * DDL's seq are applied and committed first, the DDL runs alone on
    * the driver (schema registry update / sink DDL execution /
    * statement-cache invalidation — whatever the handler does), then
    * later rows. DDL events are control-plane rare, so collecting them
    * to the driver is the right plan; DML segments stay distributed.
    */
  def applyWithDdlBarriers(batch: DataFrame, epochId: Long,
      sink: UpsertSink, ddlHandler: Option[DdlBarrierEvent => Unit]): Unit = {
    val hasDdl = ddlHandler.isDefined &&
      batch.columns.contains("op") && !batch.filter(col("op") === Op.Ddl).isEmpty
    if (!hasDdl) { sink.applyBatch(batch, epochId); return }
    // Each DDL boundary issues segment filter + isEmpty probes; without a
    // persist every one re-executes the batch's source plan (re-reads are
    // only accidentally cheap because the test source is immutable files).
    val cached = batch.persist()
    try {
      val handler = ddlHandler.get
      val ddls = cached.filter(col("op") === Op.Ddl)
        .select(col("db"), col("table"), col("after"), col("seq"))
        .orderBy(col("seq")).collect()
      val dml = cached.filter(col("op") =!= Op.Ddl)
      var lo = Long.MinValue
      ddls.foreach { d =>
        val seq = d.getLong(3)
        val segment = dml.filter(col("seq") > lo && col("seq") < seq)
        if (!segment.isEmpty) sink.applyBatch(segment, epochId)
        handler(DdlBarrierEvent(d.getString(0), d.getString(1),
          Option(d.getString(2)).getOrElse(""), seq))
        lo = seq
      }
      val tail = dml.filter(col("seq") > lo)
      if (!tail.isEmpty) sink.applyBatch(tail, epochId)
    } finally cached.unpersist()
  }
}

/** A DDL event at a batch barrier: the statement text travels in the
  * CDC envelope's `after` field (Debezium's schema-change shape).
  */
case class DdlBarrierEvent(db: String, table: String, sql: String, seq: Long)

/** Idempotent upsert sink — the Spark-native form of the reference's
  * applier (SURVEY.md §2.2 K2-K4, K7; §2.8 O4/O5).
  *
  * Within each micro-batch:
  *   1. drop transactions already in the ledger (F10 idempotence);
  *   2. repartition by row key and sort by seq within partitions — rows
  *      of the same key land in the same task in commit order, which is
  *      exactly the conflict-safety the reference's writeset/logical-
  *      clock machinery (`applier_mts.go`) establishes, with no
  *      history-map state;
  *   3. reduce to final-state-per-key (replace/delete/update collapse);
  *   4. apply via the pluggable writer (JDBC upsert on a real cluster;
  *      parquet-backed table in tests) and append the ledger in the same
  *      unit of work.
  */
trait UpsertSink extends Serializable {
  def applyBatch(batch: DataFrame, epochId: Long): Unit
}

/** File-table implementation used by tests and local runs: maintains the
  * materialized table as parquet and the applied-GTID ledger alongside.
  * The JDBC production variant swaps `merge` for batched
  * `REPLACE INTO` / `DELETE` prepared statements per partition
  * (reference `driver/mysql/sql/builder.go`) — same dataflow.
  */
class ParquetUpsertSink(spark: SparkSession, tableDir: String, ledgerDir: String,
                        keyCol: String, seqCol: String, opCol: String) extends UpsertSink {

  override def applyBatch(batch: DataFrame, epochId: Long): Unit = {
    import org.apache.spark.sql.SaveMode
    if (batch.isEmpty) return
    val ledger = readOrEmpty(ledgerDir)
    val fresh = ledger match {
      case Some(l) => batch.join(broadcast(l.select("gtid").distinct()), Seq("gtid"), "left_anti")
      case None    => batch
    }
    // final state per key for this batch, applied over current table state
    val current = readOrEmpty(tableDir)
    val incoming = graft.operators.CdcBatch.applyChangeLog(
      fresh.repartition(col(keyCol)).sortWithinPartitions(col(seqCol)),
      keyCol, seqCol, opCol)
    val deletedKeys = fresh.groupBy(col(keyCol))
      .agg(max_by(col(opCol), col(seqCol)).as("last_op"))
      .filter(col("last_op") === "d").select(col(keyCol))
    val merged = current match {
      case Some(cur) =>
        cur.join(fresh.select(keyCol).distinct(), Seq(keyCol), "left_anti")
          .unionByName(incoming, allowMissingColumns = true)
      case None => incoming
    }
    val mergedOut = merged.join(deletedKeys, Seq(keyCol), "left_anti").cache()
    mergedOut.count()
    mergedOut.write.mode(SaveMode.Overwrite).parquet(tableDir + ".tmp")
    spark.read.parquet(tableDir + ".tmp").write.mode(SaveMode.Overwrite).parquet(tableDir)
    val gtids = fresh.select("gtid").distinct()
      .withColumn("epoch_id", lit(epochId))
    gtids.write.mode(SaveMode.Append).parquet(ledgerDir)
    mergedOut.unpersist()
  }

  private def readOrEmpty(dir: String): Option[DataFrame] =
    if (new java.io.File(dir).exists()) Some(spark.read.parquet(dir)) else None
}
