package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sustained-threshold and staleness alerting (SURVEY.md P7/P8 —
  * monitoring/alerts.yml):
  *
  *   - P7 `for:`-style hold-down: a condition must hold *continuously* for
  *     `forDuration` before the alert fires (HighErrorRate for 5m,
  *     HighProcessingLatency for 5m, alerts.yml:6-34). Implemented with
  *     `flatMapGroupsWithState` tracking `conditionSince` per alert key.
  *   - P8 staleness: no events for a key within `staleAfter` fires
  *     "processing stopped" (alerts.yml:16-24) — a processing-time timeout
  *     on the same state operator.
  *
  * State is bounded: one small record per alert key, cleared on recovery —
  * safe at any scale.
  */
object Alerts {

  case class MetricPoint(key: String, ts: Timestamp, value: Double)
  case class AlertState(conditionSinceMs: Long, lastSeenMs: Long, firing: Boolean)
  case class Alert(key: String, alert: String, atMs: Long, value: Double)

  /** P7 — fire when `value > threshold` holds continuously for
    * `forDurationMs`; resolve when it drops below. Input must be a
    * per-key metric stream (e.g. windowed error rates keyed by table). */
  def sustainedThreshold(points: Dataset[MetricPoint], threshold: Double,
                         forDurationMs: Long): Dataset[Alert] = {
    implicit val alertEnc = Encoders.product[Alert]
    implicit val stateEnc = Encoders.product[AlertState]
    implicit val keyEnc = Encoders.STRING
    points.groupByKey(_.key)
      .flatMapGroupsWithState[AlertState, Alert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state: GroupState[AlertState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(AlertState(-1L, 0L, firing = false))
          val out = scala.collection.mutable.Buffer[Alert]()
          for (p <- sorted) {
            val t = p.ts.getTime
            if (p.value > threshold) {
              val since = if (st.conditionSinceMs < 0) t else st.conditionSinceMs
              val firing = t - since >= forDurationMs
              if (firing && !st.firing) out += Alert(key, "FIRING", t, p.value)
              st = AlertState(since, t, firing || st.firing)
            } else {
              if (st.firing) out += Alert(key, "RESOLVED", t, p.value)
              st = AlertState(-1L, t, firing = false)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** P8 — staleness: emit an alert for any key silent longer than
    * `staleAfterMs` (processing-time timeout — fires even when NO data
    * arrives, which a windowed count cannot do). */
  def staleness(points: Dataset[MetricPoint], staleAfterMs: Long): Dataset[Alert] = {
    implicit val alertEnc = Encoders.product[Alert]
    implicit val stateEnc = Encoders.product[AlertState]
    implicit val keyEnc = Encoders.STRING
    points.groupByKey(_.key)
      .flatMapGroupsWithState[AlertState, Alert](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (key, rows, state: GroupState[AlertState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(Alert(key, "STALE", st.lastSeenMs, 0.0))
          } else {
            val lastSeen = rows.map(_.ts.getTime).foldLeft(0L)(math.max)
            state.update(AlertState(-1L, lastSeen, firing = false))
            state.setTimeoutDuration(staleAfterMs)
            Iterator.empty
          }
      }
  }

  /** P8' — EVENT-TIME staleness: a key is stale when the stream's WATERMARK
    * passes its last event + `staleAfterMs`. The deterministic twin of
    * [[staleness]]: processing-time timeouts make the engine re-run a batch
    * every trigger forever (`FlatMapGroupsWithStateExec.shouldRunAnotherBatch`
    * is unconditionally true for ProcessingTimeTimeout — timers are checked
    * by polling wall time), which is correct for a 24/7 monitoring
    * deployment on an interval trigger but unterminating (and
    * wall-clock-dependent) under `processAllAvailable`. Event-time timeouts
    * re-batch only when the watermark ADVANCES, so the query quiesces and
    * every fire is a pure function of the delivered data — the form a
    * replayable pipeline (and the p28 census) wants. Input must carry a
    * watermark on `ts` (e.g. `.withWatermark("ts", "0 seconds")`).
    *
    * Late-arrival semantics (pinned in StreamingSpec): a point behind the
    * current watermark is dropped by the watermark filter BEFORE this
    * operator, so a surviving row always has `ts ≥ watermark` and the
    * armed deadline `lastSeen + staleAfterMs` always clears the watermark;
    * the `max(deadline, watermark + 1)` below is insurance, not a hot
    * path. The STALE row carries the key's last SURVIVING event-time. */
  def stalenessEventTime(points: Dataset[MetricPoint],
                         staleAfterMs: Long): Dataset[Alert] = {
    implicit val alertEnc = Encoders.product[Alert]
    implicit val stateEnc = Encoders.product[AlertState]
    implicit val keyEnc = Encoders.STRING
    points.groupByKey(_.key)
      .flatMapGroupsWithState[AlertState, Alert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, rows, state: GroupState[AlertState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(Alert(key, "STALE", st.lastSeenMs, 0.0))
          } else {
            val lastSeen = rows.map(_.ts.getTime)
              .foldLeft(state.getOption.map(_.lastSeenMs).getOrElse(0L))(math.max)
            state.update(AlertState(-1L, lastSeen, firing = false))
            state.setTimeoutTimestamp(math.max(lastSeen + staleAfterMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Batch twin of the P7 hold-down (oracle-friendly shape): windows where a
    * per-bucket error rate exceeded `threshold` for at least `sustainBuckets`
    * consecutive buckets — expressed with window functions only. */
  def sustainedThresholdBatch(rates: DataFrame, threshold: Double,
                              sustainBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("bucket_start"))
    // consecutive-breach run length via the classic gaps-and-islands trick:
    // row_number minus per-breach-state row_number is constant within a run
    val flagged = rates.withColumn("breach", (col("rate") > threshold).cast("int"))
    val grouped = flagged
      .withColumn("rn", row_number().over(w))
      .withColumn("rn_breach",
        sum(col("breach")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("island", col("rn") - col("rn_breach"))
    grouped.filter(col("breach") === 1)
      .groupBy(col("key"), col("island"))
      .agg(count(lit(1)).as("run_len"),
           min(col("bucket_start")).as("breach_start"),
           max(col("bucket_start")).as("breach_end"))
      .filter(col("run_len") >= sustainBuckets)
      .drop("island")
  }
}
