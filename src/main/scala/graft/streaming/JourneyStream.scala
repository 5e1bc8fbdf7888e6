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
  * — bounded by calendar time, the practical ideal. Transition state
  * buffers the user's (ts, id, type) triples because exactness under
  * arbitrary arrival order is the certified contract; under
  * watermark-ordered delivery it prunes to the last event per user (the
  * sliding pair frontier) — prune only when the deployment guarantees
  * ordering (the [[FunnelStream]] rule).
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
}
