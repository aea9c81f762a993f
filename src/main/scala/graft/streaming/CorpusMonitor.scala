package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Continuous corpus monitoring over an unbounded document stream —
  * the streaming counterparts of [[graft.operators.TableStats]]'
  * count-min sketch and PSI drift (beyond-parity, SURVEY.md §8).
  *
  * The batch sketches were built mergeable precisely so they could sit
  * behind streaming state: a count-min sketch's state is its fixed
  * depth×width cell grid and a drift monitor's state is the bounded
  * (group, bin) count table — neither grows with stream length, which
  * is what makes them safe against a firehose where per-key state
  * (dedup fingerprints, session windows) needs TTL eviction and these
  * need none.
  */
object CorpusMonitor {

  /** Streaming count-min sketch: a plain streaming aggregation in
    * Update mode whose state IS the cell grid. After any prefix of the
    * stream, the emitted cells equal [[graft.operators.TableStats.cmSketch]]
    * over that prefix batch-wise (pinned in StreamingMonitorSpec) —
    * frequency questions on the live stream cost one broadcast probe
    * of at most depth×width rows, never a scan of history.
    */
  def streamingCmSketch(keys: DataFrame, keyCol: String,
                        depth: Int = 4, width: Int = 1024): DataFrame =
    graft.operators.TableStats.cmSketch(keys, keyCol, depth, width)

  /** Per-micro-batch PSI drift of the incoming slice against a STATIC
    * baseline snapshot (the curated corpus the trainer last saw).
    * Each batch's (group, bucket) counts reduce map-side before the
    * tiny PSI arithmetic; `onBatch` receives (batchId, drift rows) —
    * wire it to alerting. Returns the CONFIGURED writer — the caller
    * picks trigger/query name and calls `.start()` (foreachBatch
    * because PSI needs the full-outer bucket merge, which
    * streaming-native aggregation cannot express against a static
    * side).
    */
  def driftAgainstBaseline(stream: DataFrame, baseline: DataFrame,
                           groupCol: String, bucket: org.apache.spark.sql.Column,
                           onBatch: (Long, Array[Row]) => Unit): DataStreamWriter[Row] =
    stream.writeStream.outputMode(OutputMode.Update).foreachBatch {
      (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          onBatch(id, graft.operators.TableStats
            .psiDrift(baseline, batch, groupCol, bucket)
            .orderBy(col(groupCol)).collect())
    }
}
