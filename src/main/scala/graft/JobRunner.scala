package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.model._
import graft.operators.{CdcBatch, Relational}
import graft.sources.ChunkPlanner
import graft.streaming.{CdcPipeline, UpsertSink}

/** The job façade — the reference's replication lifecycle (SURVEY.md
  * §3) as one API: full load (snapshot) then incremental apply.
  *
  * Reference flow: `Extractor.Run` decides full-copy, runs the
  * consistent-snapshot dance, chunk-dumps each table, hands off to the
  * binlog reader at the recorded coordinates
  * (`driver/mysql/extractor.go:152-367`, `1149-1424`); the applier
  * replays both phases. Spark-native flow: chunk-planned parallel read
  * → per-table declarative transforms → sink write, recording the
  * stream watermark; then the streaming pipeline continues from it.
  */
object JobRunner {
  /** Build a runner straight from a reference-shaped job JSON
    * ([[graft.model.JobConfig]]) — a dtle user's existing job spec is
    * the only input needed.
    */
  def fromJson(spark: SparkSession, json: String): (JobRunner, JobConfig) = {
    val cfg = JobConfig.fromJson(json)
    (new JobRunner(spark, cfg.repl), cfg)
  }
}

class JobRunner(spark: SparkSession, repl: ReplicationSpec) {

  /** Result of a table snapshot: rows written + the watermark (max seq
    * observed) where the incremental phase takes over — the reference's
    * snapshot GTID coordinates (`extractor.go:1191-1274`).
    */
  case class SnapshotResult(table: String, rows: Long, checksum: Long, watermark: Long)

  /** S3+S5+K1 — full load of one table: keyset-chunked scan (stands in
    * for `spark.read.jdbc(predicates)` against a live source), F1/F6/F7
    * transforms, parquet write, checksum for chunk verification (A2).
    */
  def snapshot(source: DataFrame, spec: TableSpec, keyCols: Seq[String],
               numChunks: Int, outDir: String, seqCol: Option[String] = None): SnapshotResult = {
    val chunked = ChunkPlanner.chunkedRead(spark, source, keyCols, numChunks)
    val transformed = Relational.tableTransform(chunked, spec)
    val outName = spec.renameTable.getOrElse(spec.name)
    val outSchema = spec.renameSchema.getOrElse(spec.schema)
    val path = s"$outDir/$outSchema.$outName"
    transformed.write.mode(SaveMode.Overwrite).parquet(path)
    val written = spark.read.parquet(path)
    val rows = written.count()
    val chk = keyCols.headOption.flatMap { k =>
      if (written.columns.contains(k))
        Some(written.agg(coalesce(sum(hash(col(k)).cast("long")), lit(0L))).first().getLong(0))
      else None
    }.getOrElse(0L)
    val watermark = seqCol.filter(source.columns.contains)
      .map(c => source.agg(coalesce(max(col(c)), lit(0L))).first().getLong(0))
      .getOrElse(0L)
    SnapshotResult(s"$outSchema.$outName", rows, chk, watermark)
  }

  /** Incremental phase: change stream → route/filter/rename →
    * idempotent sink, starting after `watermark` (reference binlog
    * reader starts at the snapshot coordinates).
    */
  def incremental(changes: DataFrame, sink: UpsertSink, checkpointDir: String,
                  watermark: Long = 0L, seqCol: String = "seq"): StreamingQuery = {
    val fromWatermark =
      if (watermark > 0L) changes.filter(col(seqCol) > watermark) else changes
    CdcPipeline.run(fromWatermark, repl, sink, checkpointDir)
  }

  /** Batch replay of a bounded change log over snapshot state — the
    * deterministic equivalent used for verification (and by tests):
    * final state must match applying the log with K2-K4 semantics.
    */
  def replayBatch(snapshotState: DataFrame, changes: DataFrame,
                  keyCol: String, seqCol: String, opCol: String): DataFrame = {
    val routed = changes
      .filter(Relational.routeFilter(repl, col("db"), col("table")))
      .transform(df => Relational.opFilter(df, repl.skipOps))
      .transform(df => repl.selfServerId.fold(df)(sid => Relational.cycleFilter(df, sid)))
    val finalState = CdcBatch.applyChangeLog(routed, keyCol, seqCol, opCol)
    val touched = routed.select(keyCol).distinct()
    val deleted = routed.groupBy(col(keyCol))
      .agg(max_by(col(opCol), col(seqCol)).as("last_op"))
      .filter(col("last_op") === "d").select(col(keyCol))
    snapshotState.join(touched, Seq(keyCol), "left_anti")
      .unionByName(finalState.select(snapshotState.columns.toIndexedSeq.map(col): _*), allowMissingColumns = true)
      .join(deleted, Seq(keyCol), "left_anti")
  }
}
