package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the maintenance pass every
  * long-running ingest needs: time-ordered small files (here: one
  * "file" per ingest day) group into target-sized compaction jobs
  * WITHOUT reordering time, via an exclusive running sum over the file
  * list: `bucket = (Σ bytes before me) div target`. Order-preserving
  * bin packing is what table formats actually run for streaming
  * ingests (bin-pack-within-partition), because time-locality is the
  * property readers prune on.
  *
  * Scale note: the plan runs over FILE METADATA (one row per file),
  * not data — the unpartitioned running-sum window is metadata-sized
  * by construction (the same contract as a table format's manifest
  * scan). The rewrite itself then proceeds per bucket, fully parallel.
  */
object CompactionPlanner {

  /** Plan over (fileKey, bytes) rows: returns (fileKey, file_bytes,
    * bucket) with buckets of ~`targetBytes` in key order via the
    * exclusive running sum div target. Files never split; an oversize
    * file lands in whatever bucket the running sum reaches it in, so a
    * bucket's worst case is its fill plus one oversize file — size
    * compaction executors for that, not for targetBytes.
    */
  def plan(files: DataFrame, keyCol: String, bytesCol: String,
           targetBytes: Long): DataFrame = {
    val w = Window.orderBy(col(keyCol)).rowsBetween(Window.unboundedPreceding, -1)
    files.select(col(keyCol), col(bytesCol).cast("long").as("file_bytes"))
      .withColumn("prior", coalesce(sum(col("file_bytes")).over(w), lit(0L)))
      .select(col(keyCol), col("file_bytes"),
        expr(s"prior div ${targetBytes}L").as("bucket"))
  }

  /** Day-granularity ingest "files" for an event stream: bytes are the
    * concrete payload estimate (fixed row overhead + props length).
    * Null-timestamp rows have no day and are excluded — they belong to
    * a dead-letter rewrite, not time compaction.
    */
  def eventDayFiles(events: DataFrame, tsCol: String, propsCol: String,
                    rowOverhead: Int = 64): DataFrame =
    events.filter(col(tsCol).isNotNull)
      .groupBy(date_format(col(tsCol), "yyyy-MM-dd").as("day"))
      .agg((count(lit(1)) * rowOverhead +
        sum(coalesce(octet_length(col(propsCol)), lit(0))).cast("long")).as("bytes"))

  /** The composed plan for an event stream at day granularity. */
  def planEventCompaction(events: DataFrame, tsCol: String, propsCol: String,
                          targetBytes: Long): DataFrame =
    plan(eventDayFiles(events, tsCol, propsCol), "day", "bytes", targetBytes)
}
