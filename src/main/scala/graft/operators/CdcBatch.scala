package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch forms of the reference's CDC streaming semantics — SURVEY.md
  * §2.2 (K2-K4 upsert), §2.8 (S2 tx assembly, O1 grouping, O4 writesets).
  *
  * These are the *set* semantics of the operators: given a bounded change
  * log they produce exactly the state / ordering the streaming pipeline
  * (graft.streaming.CdcPipeline) maintains incrementally. They double as
  * the DuckDB-verifiable contract for the streaming code.
  *
  * Scale notes: every operator here partitions by a key before any
  * window — no global windows except where the reference itself is
  * globally ordered (the binlog is a total order; at 100 TB you shard the
  * stream by server/table first, which is the `partitionBy` below).
  */
object CdcBatch {

  /** K2-K4 — apply a change log to obtain final table state ("replace /
    * delete / update" semantics, reference `applier_incr.go:694-790`).
    * Last write per key wins; a trailing delete removes the key. The
    * reference serializes conflicting writes via the MTS logical clock
    * (`applier_mts.go`); in batch form the same guarantee is
    * "max-seq-per-key", a hash aggregation — one shuffle on the key, no
    * global sort, AQE-skew-safe.
    */
  def applyChangeLog(changes: DataFrame, keyCol: String, seqCol: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "d")
      .drop("__rn")
  }

  /** O4 — writeset dependency tracking (reference
    * `driver/mysql/applier_mts.go:159-259` HashTx): each transaction's
    * `lastCommitted` is the max sequence of an earlier transaction that
    * touched any of the same row keys. The reference keeps a bounded
    * hash→seq history map on one node; distributed form is a window over
    * the key partition — same semantics, no 2500-entry cap, shuffles once
    * on the row key.
    */
  def writesetDependencies(changes: DataFrame, keyCol: String, seqCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    changes.withColumn(
      "last_committed",
      coalesce(lag(col(seqCol), 1).over(w), lit(0L) - 1L)
    )
  }

  /** O4, full form: a transaction's writeset spans SEVERAL unique keys
    * (the reference hashes every unique key of every row, HashTx
    * `applier_mts.go:159-259`) — the dependency is the max predecessor
    * over ALL of them; FK-parent rows and no-PK tables veto parallelism
    * entirely (`last_committed = seq - 1`, a serial barrier —
    * `applier_mts.go:227-234`). One window shuffle per key dimension.
    */
  def writesetDependenciesMulti(changes: DataFrame, keyCols: Seq[String], seqCol: String,
                                barrierCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val lags = keyCols.map { k =>
      coalesce(
        lag(col(seqCol), 1).over(Window.partitionBy(col(k)).orderBy(col(seqCol))),
        lit(0L) - 1L)
    }
    val dep = if (lags.size == 1) lags.head else greatest(lags: _*)
    changes.withColumn("last_committed",
      barrierCol.map(b => when(col(b), col(seqCol) - 1).otherwise(dep)).getOrElse(dep))
  }

  /** S2 — transaction assembly, batch form: group a totally-ordered event
    * stream into transaction-like sessions per key, splitting when the
    * time gap exceeds `gapMillis` (the reference closes a `DataEntry` on
    * XID/DDL, `binlog_reader.go:450-496`; with synthetic fixtures the
    * session gap plays the commit boundary). Classic gaps-and-islands:
    * flag starts with `lag`, running-sum the flags — two stages over one
    * key-partitioned shuffle.
    */
  def assembleTx(events: DataFrame, keyCol: String, tsCol: String, seqCol: String, gapMillis: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    val withFlag = events.withColumn(
      "__new_tx",
      when(
        unix_millis(col(tsCol)) - lag(unix_millis(col(tsCol)), 1).over(byKey) > gapMillis,
        1
      ).otherwise(lit(0))
    )
    // first row of each key gets flag 0 via otherwise(); tx index starts at 0
    withFlag
      .withColumn("tx_index", sum(col("__new_tx")).over(byKey))
      .drop("__new_tx")
      .groupBy(col(keyCol), col("tx_index"))
      .agg(
        min(col(seqCol)).as("tx_first_seq"),
        max(col(seqCol)).as("tx_last_seq"),
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("tx_start"),
        max(col(tsCol)).as("tx_end")
      )
  }

  /** O1 — group/batch by accumulated size (reference StreamEvents
    * accumulates tx until `GroupMaxSize` bytes then publishes,
    * `extractor.go:972-1058`). Batch form: running byte total over the
    * stream order, batch id = total div limit. Per-origin partitioning
    * keeps the cumsum window from being a single global sort at scale.
    */
  def sizeBatches(events: DataFrame, partCol: String, seqCol: String, sizeCol: String, maxBytes: Long): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("batch_id", floor((col("__cum") - lit(1)) / lit(maxBytes)))
      .drop("__cum")
  }

  /** O2 — event merge (`reuseLast`, reference `binlog_reader.go:2000-2028`):
    * consecutive inserts on the same table become one multi-row event. In
    * Spark the micro-batch itself is the merged multi-row unit; the batch
    * expression of the semantics is a per-(table, run) rollup.
    */
  def mergeConsecutiveInserts(events: DataFrame, tableCol: String, seqCol: String, opCol: String): DataFrame = {
    val byTable = Window.partitionBy(col(tableCol)).orderBy(col(seqCol))
    events
      .withColumn(
        "__break",
        when(col(opCol) =!= coalesce(lag(col(opCol), 1).over(byTable), lit("__none")), 1).otherwise(0)
      )
      .withColumn("__run", sum(col("__break")).over(byTable))
      .groupBy(col(tableCol), col("__run"))
      .agg(
        first(col(opCol)).as("op"),
        min(col(seqCol)).as("first_seq"),
        max(col(seqCol)).as("last_seq"),
        count(lit(1)).as("n_rows")
      )
      .drop("__run")
  }

  /** O3 — big-transaction split (reference `binlog_reader.go:2030-2044`:
    * entries over `DumpEntryLimit` split into parts carrying `Index` /
    * `Final` so the applier can stage and commit atomically). Batch
    * form: per-tx running byte total → part index; `is_final` marks the
    * last part. One shuffle on the tx id.
    */
  def splitBigTx(events: DataFrame, txCol: String, seqCol: String, sizeCol: String, limitBytes: Long): DataFrame = {
    val w = Window.partitionBy(col(txCol)).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(txCol))
    events
      .withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("part_index", floor((col("__cum") - lit(1)) / lit(limitBytes)).cast("int"))
      .withColumn("is_final", col("part_index") === max(col("part_index")).over(wAll))
      .drop("__cum")
  }

  /** A2 — table checksum for chunk verification (reference `CHECKSUM
    * TABLE` per chunk, `dumper.go:168-180`). A commutative integer
    * polynomial over key columns: exact, order-insensitive, distributes
    * as a partial aggregate (map-side combine).
    */
  /** SCD type-2 history from a change log — the warehouse-side sink a
    * CDC feed most often lands in: every change becomes a VERSIONED row
    * with a `[valid_from, valid_to)` interval instead of overwriting
    * the key (the reference applier materializes only current state;
    * this is the time-travel materialization of the same log).
    *
    * Each key's changes order by `seqCol`; `valid_to_ms` is the next
    * change's timestamp (null = open/current version). A delete
    * (`opCol` = 'd') closes its predecessor's interval — its timestamp
    * flows through the lead() — and contributes no version row, so a
    * key whose last change is a delete correctly has NO current row.
    * Version numbers are assigned BEFORE delete rows drop (gaps reveal
    * tombstones in the history).
    *
    * One hash exchange on the key; both window functions share it.
    */
  def scd2History(changes: DataFrame, keyCol: String, seqCol: String,
                  tsCol: String, payload: Seq[String], opCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from_ms", unix_millis(col(tsCol)))
      .withColumn("valid_to_ms", lead(unix_millis(col(tsCol)), 1).over(w))
      .filter(col(opCol) =!= "d")
      .withColumn("is_current", col("valid_to_ms").isNull)
      .select(col(keyCol) +: col("version") +: col("valid_from_ms") +:
        col("valid_to_ms") +: col("is_current") +: payload.map(col): _*)
  }

  def checksum(df: DataFrame, groupCols: Seq[String], k1: String, k2: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(k1) * 31L + col(k2) * 7L).as("checksum")
      )
}
