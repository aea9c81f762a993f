package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.ChunkPlanner

/** The replication spine as one composable plan — the body of the
  * `pipeline_replicate` flagship (reference job lifecycle,
  * `driver/mysql/extractor.go:195-333` full copy + handoff,
  * `applier_incr.go` apply loop): S5 consistent snapshot/stream
  * handoff at a cutoff sequence, S3 keyset-chunked full load, F10
  * idempotence against the snapshot-covered ledger, K2/K4
  * last-writer-wins upsert, K7/A5 per-key applied-interval ledger.
  *
  * Scale shape: one broadcast anti-join (ids-only ledger), per-key
  * aggregations and joins all keyed on the row key — the same
  * user_id-hash exchange reused across state/ledger joins; nothing
  * key-count-sized is ever broadcast.
  */
object Replication {

  /** Replays `changes` (a changelog with `op` ∈ i/u/d) through the
    * snapshot-at-`cutoff` + incremental-from-`replayFrom` pipeline.
    * Output: one row per live key — last applied event, the
    * applied-GTID interval set for the incremental phase, and the
    * count of F10-dropped replayed duplicates.
    */
  def replicate(changes: DataFrame, keyCol: String, seqCol: String, opCol: String,
                cutoff: Long, replayFrom: Long, snapshotChunks: Int = 4): DataFrame = {
    val spark = changes.sparkSession
    val cols = changes.columns.map(col).toSeq
    // full load: source-table state AT the snapshot point, scanned as
    // S3 keyset chunks; applyChangeLog collapses history to state
    val prefix = changes.filter(col(seqCol) <= cutoff).select(cols: _*)
    val snapshot = CdcBatch.applyChangeLog(
      ChunkPlanner.chunkedRead(spark, prefix, Seq(seqCol), snapshotChunks),
      keyCol, seqCol, opCol)
    // incremental feed REPLAYS a tail of pre-snapshot events (restart
    // semantics); F10's anti-join vs the snapshot-covered ledger drops
    // exactly the duplicates
    val feed = changes.filter(col(seqCol) > replayFrom).select(cols: _*)
    val ledger = prefix.select(col(seqCol))
    val incr = Relational.idempotenceFilter(feed, ledger, seqCol)
    // K2/K4: last-writer-wins upsert of snapshot ∪ incremental — equal
    // to replaying the whole filtered history in one pass
    val state = CdcBatch.applyChangeLog(snapshot.unionByName(incr), keyCol, seqCol, opCol)
    // K7/A5: applied-interval ledger per key; n_replayed counts the
    // F10-dropped duplicates. Both joins share the state's key-hash
    // exchange — no broadcast: the ledger scales with the key count.
    val applied = incr.groupBy(col(keyCol))
      .agg(graft.functions.GtidSetAgg.column(col(seqCol)).as("applied_set"))
    val replayed = feed.filter(col(seqCol) <= cutoff)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_replayed"))
    state.join(applied, Seq(keyCol), "left")
      .join(replayed, Seq(keyCol), "left")
      .withColumn("applied_set", coalesce(col("applied_set"), lit("")))
      .withColumn("n_replayed", coalesce(col("n_replayed"), lit(0L)))
  }
}
