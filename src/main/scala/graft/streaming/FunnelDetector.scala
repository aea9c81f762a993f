package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live sequential-funnel detection — the streaming counterpart of the
  * batch `q10_funnel` query (view → click → purchase, each step's
  * FIRST timestamp strictly after the previous step's). Per-key state
  * is three Option[Long] timestamps: O(1) per user no matter how many
  * events arrive, which is the whole point — the batch query re-scans
  * history, this emits the conversion the moment its last leg lands.
  *
  * Ordering: within a micro-batch, events sort by timestamp before the
  * state machine consumes them, so intra-batch disorder resolves
  * exactly; across batches the state only ever advances (a stage
  * timestamp, once set, is the minimum-so-far under the strict-order
  * rule — identical to the batch query when event time respects batch
  * order, the same contract [[StreamingEnrich]] states).
  *
  * `idleTtlMs` evicts users with no traffic (processing-time) so state
  * tracks ACTIVE users on an unbounded stream.
  */
object FunnelDetector {

  final case class FunnelEvent(user_id: Long, event_type: String, ts_ms: Long)
  final case class FunnelState(tView: Option[Long], tClick: Option[Long],
                               tPurchase: Option[Long])
  final case class Conversion(user_id: Long, t_view: Long, t_click: Long,
                              t_purchase: Long)

  def conversions(input: Dataset[FunnelEvent],
                  idleTtlMs: Long = 0L): Dataset[Conversion] = {
    import input.sparkSession.implicits._
    val timeoutConf =
      if (idleTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    input.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append, timeoutConf) {
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else advance(user, rows, state, idleTtlMs)
      }
  }

  private def advance(user: Long, rows: Iterator[FunnelEvent],
                      state: GroupState[FunnelState],
                      idleTtlMs: Long): Iterator[Conversion] = {
    var s = state.getOption.getOrElse(FunnelState(None, None, None))
    val alreadyDone = s.tPurchase.isDefined
    // timestamp order inside the batch: the state machine is
    // order-sensitive and micro-batches carry no ordering guarantee
    rows.toSeq.sortBy(e => (e.ts_ms, e.event_type)).foreach { e =>
      e.event_type match {
        case "view" if s.tView.isEmpty =>
          s = s.copy(tView = Some(e.ts_ms))
        case "click" if s.tClick.isEmpty &&
          s.tView.exists(e.ts_ms > _) =>
          s = s.copy(tClick = Some(e.ts_ms))
        case "purchase" if s.tPurchase.isEmpty &&
          s.tClick.exists(e.ts_ms > _) =>
          s = s.copy(tPurchase = Some(e.ts_ms))
        case _ => // stage already reached, or out of order: no-op
      }
    }
    state.update(s)
    if (idleTtlMs > 0) state.setTimeoutDuration(idleTtlMs)
    if (!alreadyDone && s.tPurchase.isDefined)
      Iterator.single(Conversion(user, s.tView.get, s.tClick.get, s.tPurchase.get))
    else Iterator.empty
  }
}
