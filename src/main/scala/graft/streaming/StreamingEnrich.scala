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

  def temporalEnrich(input: Dataset[EnrichEvent]): Dataset[EnrichedFact] = {
    import input.sparkSession.implicits._
    input.groupByKey(_.key)
      .flatMapGroupsWithState[DimVersion, EnrichedFact](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[EnrichEvent], state: GroupState[DimVersion]) =>
          // batch-local buffer: bounded by the micro-batch's rows for
          // this key, the same bound every stateful Spark op carries.
          // Equal-seq dim updates order by payload — arrival order
          // after the groupByKey shuffle is NOT deterministic, so the
          // tiebreak must be a value, the same reason AsOfJoin takes an
          // explicit rightTiebreak column
          val sorted = rows.toIndexedSeq.sortBy(e =>
            (e.seq, if (e.side == "dim") 0 else 1, e.dim.getOrElse("")))
          var cur = state.getOption
          val out = IndexedSeq.newBuilder[EnrichedFact]
          sorted.foreach { e =>
            if (e.side == "dim") {
              // seq ties resolve to the max payload — deterministic
              // under any partitioning, mirroring AsOfJoin's max pick
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
          out.result().iterator
      }
  }
}
