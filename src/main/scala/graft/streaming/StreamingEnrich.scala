package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One row of the merged enrichment input: dimension updates and fact
  * events share a sequence domain per key (a CDC stream's binlog/SCN
  * order gives exactly this for free).
  */
case class EnrichEvent(key: Long, seq: Long, side: String,
                       dim: Option[String], factId: Option[Long])

/** Latest dimension version retained per key — the entire state. */
case class DimVersion(seq: Long, dim: String)

case class EnrichedFact(factId: Long, key: Long, seq: Long,
                        dim: Option[String], dimSeq: Option[Long])

/** Streaming temporal enrichment — the streaming counterpart of
  * [[graft.operators.AsOfJoin]]: facts pick up the latest dimension
  * version at-or-before their sequence number while BOTH sides arrive
  * as streams (the "enrich clicks with current account state" join
  * every CDC consumer rebuilds by hand). Spark's built-in stream-stream
  * joins can't express it: an equi-join with a time bound buffers both
  * sides and emits every historical version, not the latest-prior one.
  *
  * State per key is ONE dimension row — O(keys), not O(stream) — which
  * is what survives a 100 TB stream: no fact buffering, no version
  * history. The price is stated honestly: only the latest version is
  * retained, so a fact arriving with a sequence OLDER than the current
  * version (cross-batch disorder beyond the micro-batch boundary)
  * enriches as null rather than resurrecting an old version; within a
  * micro-batch, rows are processed in (seq, dim-first) order so any
  * intra-batch disorder resolves exactly. Per-key cross-batch order is
  * the CDC contract (binlog position, SCN) the upstream sources here
  * already maintain.
  */
object StreamingEnrich {

  /** @param idleTtlMs evict a key's dimension state after this long
    * with no traffic (processing-time). 0 keeps state forever — fine
    * for bounded key domains; for open-ended ones (users, sessions)
    * set a TTL so state size tracks ACTIVE keys, not all keys ever
    * seen — the unbounded-state trap every long-running stream hits.
    * A fact for an evicted key enriches null, same as a never-seen key.
    * Pair a TTL with a processing-time trigger on the query: with
    * timeouts armed the no-trigger default re-runs empty batches
    * back-to-back just to check deadlines.
    */
  def temporalEnrich(input: Dataset[EnrichEvent],
                     idleTtlMs: Long = 0L): Dataset[EnrichedFact] = {
    import input.sparkSession.implicits._
    val timeoutConf =
      if (idleTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    input.groupByKey(_.key)
      .flatMapGroupsWithState[DimVersion, EnrichedFact](
        OutputMode.Append, timeoutConf) {
        (key: Long, rows: Iterator[EnrichEvent], state: GroupState[DimVersion]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else enrichGroup(key, rows, state, idleTtlMs)
      }
  }

  private def enrichGroup(key: Long, rows: Iterator[EnrichEvent],
                          state: GroupState[DimVersion],
                          idleTtlMs: Long): Iterator[EnrichedFact] = {
    // batch-local buffer: bounded by the micro-batch's rows for this
    // key, the same bound every stateful Spark op carries. Equal-seq
    // dim updates order by payload — arrival order after the
    // groupByKey shuffle is NOT deterministic, so the tiebreak must be
    // a value, the same reason AsOfJoin takes an explicit rightTiebreak
    // column
    val sorted = rows.toIndexedSeq.sortBy(e =>
      (e.seq, if (e.side == "dim") 0 else 1, e.dim.getOrElse("")))
    var cur = state.getOption
    val out = IndexedSeq.newBuilder[EnrichedFact]
    sorted.foreach { e =>
      if (e.side == "dim") {
        // seq ties resolve to the max payload — deterministic under
        // any partitioning, mirroring AsOfJoin's max pick
        val d = e.dim.getOrElse("")
        if (cur.forall(c => c.seq < e.seq || (c.seq == e.seq && c.dim <= d)))
          cur = Some(DimVersion(e.seq, d))
      } else {
        val m = cur.filter(_.seq <= e.seq)
        out += EnrichedFact(e.factId.getOrElse(0L), key, e.seq,
          m.map(_.dim), m.map(_.seq))
      }
    }
    cur.foreach(state.update)
    if (idleTtlMs > 0 && cur.nonEmpty) state.setTimeoutDuration(idleTtlMs)
    out.result().iterator
  }
}
