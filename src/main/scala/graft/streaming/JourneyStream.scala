package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}

/** Streaming twins of the batch user-journey analytics — weekly cohort
  * retention ([[graft.queries.Relational.q40_retention]]) and adjacent
  * event-type transitions ([[graft.queries.Relational.q41_paths]]) — as
  * keyed state operators, completing the q39/q40/q41 journey family's
  * streaming side (the round-7 VERDICT's batch-only gap).
  *
  * Both batch plans are outside Structured Streaming's supported stateful
  * shapes (retention chains an aggregate join over a per-user MIN; paths
  * need a per-user `lead` window), so — preference order (c) — each is a
  * `flatMapGroupsWithState` operator whose per-user state refolds on every
  * update. That makes LATE and OUT-OF-ORDER arrivals exact, the contract
  * the parity specs certify: a late event EARLIER than a user's cohort
  * week shifts their whole retention row-set; a late event landing BETWEEN
  * two others rewires both adjacent transitions, exactly as a batch
  * recompute would.
  *
  * Scale: state is per-user. Retention state is O(distinct active weeks)
  * — bounded by calendar time, the practical ideal. Transition state in
  * [[transitionUpdates]] buffers the user's (ts, id, type) triples because
  * exactness under arbitrary arrival order is the certified contract;
  * [[transitionUpdatesOrdered]] is the BOUNDED-state variant for
  * watermark-ordered delivery — last-event frontier + cumulative pair
  * counts, O(1)/user over a bounded type alphabet — the one to deploy at
  * 100 TB when the source guarantees per-key ordering (the
  * [[FunnelStream]] prune rule, here implemented, not just documented).
  *
  * `update_seq` identifies the latest emitted row-set per user in
  * Update-mode output without relying on sink ordering ([[FunnelStream]]
  * convention).
  */
object JourneyStream {
  case class JourneyEvent(user_id: Long, event_id: Long, ts_us: Long,
                          event_type: String)

  /** Monday-truncated week start as epoch DAYS, from epoch micros — the
    * integer mirror of `date_trunc("week", ts)` under the repo's fixed UTC
    * session timezone (1970-01-01 was a Thursday, hence the +3 weekday
    * shift to a Monday-indexed week). */
  def weekStartDay(tsUs: Long): Long = {
    val day = Math.floorDiv(tsUs, 86400000000L)
    day - Math.floorMod(day + 3, 7)
  }

  // ---------------------------------------------------------------- q40'
  case class RetentionState(minTsUs: Long, weekDays: Set[Long], updates: Long)
  case class RetentionRow(user_id: Long, cohort_week_day: Long, week_k: Long,
                          update_seq: Long)

  /** Update-mode per-user retention rows: one (cohort_week, week_k) row
    * per distinct active week, re-emitted in full on every update (a late
    * earlier event can move the cohort week, re-indexing EVERY week_k). */
  def retentionUpdates(events: Dataset[JourneyEvent]): Dataset[RetentionRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, RetentionRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[JourneyEvent],
         state: GroupState[RetentionState]) =>
          val prev = state.getOption
            .getOrElse(RetentionState(Long.MaxValue, Set.empty, 0L))
          val evs = batch.toSeq
          val next = RetentionState(
            math.min(prev.minTsUs, evs.map(_.ts_us).min),
            prev.weekDays ++ evs.map(e => weekStartDay(e.ts_us)),
            prev.updates + 1)
          state.update(next)
          val cohortDay = weekStartDay(next.minTsUs)
          next.weekDays.toSeq.sorted.map(wd =>
            RetentionRow(user, cohortDay, (wd - cohortDay) / 7, next.updates))
            .iterator
      }
  }

  // ---------------------------------------------------------------- q41'
  case class PathState(events: Vector[(Long, Long, String)], updates: Long)
  case class TransitionRow(user_id: Long, from_type: String, to_type: String,
                           n: Long, update_seq: Long)

  /** Update-mode per-user transition counts: the buffer is re-sorted by
    * (ts, event_id) — the batch window's exact order — and adjacent pairs
    * re-counted, so an event arriving between two others MOVES both
    * affected transitions. */
  def transitionUpdates(events: Dataset[JourneyEvent]): Dataset[TransitionRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[PathState, TransitionRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[JourneyEvent],
         state: GroupState[PathState]) =>
          val prev = state.getOption.getOrElse(PathState(Vector.empty, 0L))
          val all = prev.events ++
            batch.map(e => (e.ts_us, e.event_id, e.event_type))
          val next = PathState(all, prev.updates + 1)
          state.update(next)
          val ordered = all.sortBy(e => (e._1, e._2))
          ordered.iterator.zip(ordered.iterator.drop(1))
            .map { case (a, b) => (a._3, b._3) }.toSeq
            .groupBy(identity).toSeq.sortBy(_._1)
            .map { case ((from, to), hits) =>
              TransitionRow(user, from, to, hits.size.toLong, next.updates) }
            .iterator
      }
  }

  // --------------------------------------------------------- q41'' ordered
  /** `lastType = null` marks "no frontier yet" (first event of the user);
    * counts key is from + '\\u0001' + to (the type alphabet is control-char-free)
    * so the state encoder stays a plain string-keyed map. */
  case class OrderedPathState(lastTs: Long, lastId: Long, lastType: String,
                              counts: Map[String, Long], updates: Long)

  /** BOUNDED-STATE transition twin for watermark-ORDERED delivery: state is
    * the last-event frontier plus cumulative per-pair counts — O(1)/user
    * over a bounded event-type alphabet (≤ |types|² count cells + one
    * triple) versus [[transitionUpdates]]'s O(events/user) buffer; counts
    * only ever increment, nothing refolds. The trade is the ordering
    * CONTRACT: an out-of-order arrival (earlier than the frontier) is
    * folded at its ARRIVAL position — it cannot rewire the two transitions
    * around its true timestamp position the way the exact twin does. The
    * parity spec pins equality with the exact twin under in-order delivery;
    * the divergence spec pins exactly how the two differ when ordering is
    * violated. Deploy this variant when the source guarantees per-key
    * ordering; the exact refold when it doesn't. */
  def transitionUpdatesOrdered(events: Dataset[JourneyEvent]): Dataset[TransitionRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OrderedPathState, TransitionRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[JourneyEvent],
         state: GroupState[OrderedPathState]) =>
          val prev = state.getOption
            .getOrElse(OrderedPathState(Long.MinValue, Long.MinValue, null,
              Map.empty, 0L))
          var lastTs = prev.lastTs
          var lastId = prev.lastId
          var lastType = prev.lastType
          var counts = prev.counts
          // within a batch the (ts, id) sort is free and exact; only CROSS
          // batch order rides on the delivery contract
          batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (lastType != null) {
              val k = lastType + "\u0001" + e.event_type
              counts = counts.updated(k, counts.getOrElse(k, 0L) + 1L)
            }
            lastTs = e.ts_us; lastId = e.event_id; lastType = e.event_type
          }
          val next = OrderedPathState(lastTs, lastId, lastType, counts,
            prev.updates + 1)
          state.update(next)
          counts.toSeq.sortBy(_._1).map { case (k, n) =>
            val Array(from, to) = k.split('\u0001')
            TransitionRow(user, from, to, n, next.updates)
          }.iterator
      }
  }
}
