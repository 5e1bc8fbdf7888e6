package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming twin of the batch ordered-funnel analytic
  * ([[graft.queries.Relational.q39_funnel]]): per-user chained-min funnel
  * state maintained incrementally with `mapGroupsWithState`.
  *
  * The batch funnel is a chain of per-step min-aggregations; chained
  * aggregation-after-join is outside Structured Streaming's supported
  * stateful-plan shapes, so the streaming twin is a keyed state operator —
  * preference order (c) from the build rules. State per user buffers the
  * funnel-relevant events (view/click/purchase only — other types are
  * filtered before the shuffle) and each update refolds the chain, so LATE
  * or OUT-OF-ORDER arrivals are handled exactly: an earlier view arriving
  * after a click re-opens eligibility just as a batch recompute would.
  *
  * Scale: state is per-user and holds only the three funnel event types.
  * The refold is O(|buffered|) per update. Under watermark-ordered delivery
  * the buffer can be pruned to the per-step frontier (min times only); this
  * operator keeps the exact buffer because correctness under arbitrary
  * arrival order is the contract certified against the batch twin — prune
  * only when the deployment guarantees ordering.
  *
  * `update_seq` counts state updates per user so a downstream consumer (or
  * the parity spec) can identify the latest emitted row per user in
  * Update-mode output without relying on sink ordering.
  */
object FunnelStream {
  case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long)
  case class FunnelState(events: Vector[(String, Long)], updates: Long)
  case class FunnelRow(user_id: Long, step_reached: Long, t_view_us: Long,
                       t_click_us: Long, t_purchase_us: Long, update_seq: Long)

  private val steps = Set("view", "click", "purchase")

  /** The chained-min fold, identical to the batch semantics: t_view = min
    * view; t_click = min click strictly after t_view; t_purchase = min
    * purchase strictly after t_click; −1 sentinels for "never reached". */
  def fold(events: Seq[(String, Long)]): (Long, Long, Long, Long) = {
    val views = events.collect { case ("view", t) => t }
    val tV = if (views.nonEmpty) views.min else -1L
    val clicks = events.collect { case ("click", t) if tV >= 0 && t > tV => t }
    val tC = if (clicks.nonEmpty) clicks.min else -1L
    val purch = events.collect { case ("purchase", t) if tC >= 0 && t > tC => t }
    val tP = if (purch.nonEmpty) purch.min else -1L
    val step = if (tP >= 0) 3L else if (tC >= 0) 2L else if (tV >= 0) 1L else 0L
    (step, tV, tC, tP)
  }

  /** One Update-mode row per user per micro-batch that touched them. */
  def funnelUpdates(events: Dataset[FunnelEvent]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .filter(e => steps.contains(e.event_type))
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelRow](GroupStateTimeout.NoTimeout) {
        (user, batch, state) =>
          val prev = state.getOption.getOrElse(FunnelState(Vector.empty, 0L))
          val all = prev.events ++ batch.map(e => (e.event_type, e.ts_us))
          val next = FunnelState(all, prev.updates + 1)
          state.update(next)
          val (step, tV, tC, tP) = fold(all)
          FunnelRow(user, step, tV, tC, tP, next.updates)
      }
  }

  case class OrderedFunnelState(tV: Long, tC: Long, tP: Long, updates: Long)

  /** BOUNDED-STATE funnel twin for watermark-ORDERED delivery: state is the
    * per-step frontier only — three longs per user, O(1), versus
    * [[funnelUpdates]]'s O(funnel events/user) buffer. Under per-key
    * ordered delivery the chained-min fold is incrementally computable
    * (the first view IS the min view; the first click after it IS the
    * chained min click), so results equal the exact refold — the parity
    * spec pins it. The trade: a LATE earlier view cannot re-open click
    * eligibility the way the exact twin's refold does (divergence spec).
    * The [[graft.streaming.JourneyStream.transitionUpdatesOrdered]]
    * contract, applied to the funnel. */
  def funnelUpdatesOrdered(events: Dataset[FunnelEvent]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .filter(e => steps.contains(e.event_type))
      .groupByKey(_.user_id)
      .mapGroupsWithState[OrderedFunnelState, FunnelRow](GroupStateTimeout.NoTimeout) {
        (user, batch, state) =>
          val prev = state.getOption.getOrElse(OrderedFunnelState(-1L, -1L, -1L, 0L))
          var (tV, tC, tP) = (prev.tV, prev.tC, prev.tP)
          // intra-batch (ts, type) sort is free and exact; cross-batch order
          // rides on the delivery contract
          batch.toSeq.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
            e.event_type match {
              case "view" if tV < 0 => tV = e.ts_us
              case "click" if tV >= 0 && tC < 0 && e.ts_us > tV => tC = e.ts_us
              case "purchase" if tC >= 0 && tP < 0 && e.ts_us > tC => tP = e.ts_us
              case _ => ()
            }
          }
          val next = OrderedFunnelState(tV, tC, tP, prev.updates + 1)
          state.update(next)
          val step = if (tP >= 0) 3L else if (tC >= 0) 2L else if (tV >= 0) 1L else 0L
          FunnelRow(user, step, tV, tC, tP, next.updates)
      }
  }
}
