package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** O7/A3 — replication delay metrics (reference TimestampContext,
  * `driver/mysql/extractor.go:930-968`: delay = now − last event ts,
  * reset when the queue drains; dest analog `applier_incr.go:864-867`).
  *
  * Batch-side: [[delayOf]] computes the batch's high-watermark delay —
  * call it inside `foreachBatch` and export however you report metrics.
  * Stream-side: [[listener]] reports per-progress lag from the
  * StreamingQueryProgress event stream (Spark's own clock).
  */
object LagMetrics {

  /** Milliseconds between `nowMillis` and the newest event timestamp in
    * the batch; None for an empty batch (the reference resets the delay
    * to zero when its queue empties).
    */
  def delayOf(batch: DataFrame, tsCol: String, nowMillis: Long): Option[Long] = {
    val row = batch.agg(max(unix_millis(col(tsCol).cast("timestamp")))).first()
    if (row.isNullAt(0)) None else Some(nowMillis - row.getLong(0))
  }

  /** Listener publishing batch lag via a callback — wire to logs or a
    * metrics sink.
    */
  def listener(onLag: (String, Long, Long) => Unit): StreamingQueryListener =
    new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        onLag(p.name, p.batchId, p.batchDuration)
      }
    }
}
