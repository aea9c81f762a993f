package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O9 — event-time windowed aggregation with late-data handling
  * (SURVEY.md §2.8: absent in the reference — binlog is totally
  * ordered — but part of this engine's streaming surface; Spark gives
  * it via `window`/`session_window` + watermarks).
  *
  * Works on both streaming and batch DataFrames: in streaming mode the
  * watermark bounds state (tumbling/sliding windows older than the
  * watermark are finalized and dropped); in batch mode `withWatermark`
  * is a no-op and the same code produces the complete history —
  * the standard kappa-style backfill property.
  */
object WindowedStats {

  /** Tumbling (or sliding, if `slide` differs from `width`) per-key
    * event counts + value sums.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     valueCol: String, width: String, slide: Option[String] = None,
                     watermark: String = "10 minutes"): DataFrame = {
    val win: Column = slide match {
      case Some(s) => window(col(tsCol), width, s)
      case None    => window(col(tsCol), width)
    }
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), win.as("win"))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col(keyCol), col("win.start").as("win_start"),
        col("win.end").as("win_end"), col("n_events"), col("sum_value"))
  }

  /** Session windows: events of one key within `gap` of each other fold
    * into one session — the event-time analog of the reference's
    * transaction grouping by timeout (`extractor.go:972-1058`).
    */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("win"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("win.start").as("win_start"),
        col("win.end").as("win_end"), col("n_events"))
}
