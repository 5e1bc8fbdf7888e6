package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Engine health surface (SURVEY.md M3/M5/M6) — the Spark analog of the
  * reference consumer's operational metrics and probes:
  *
  *   - M3 `elasticsearch_operations_total{operation,status}`
  *     (node-consumer/index.js:106-111): [[SinkCounters]], incremented from
  *     sink `foreachBatch` success/error paths.
  *   - M5 `application_errors_total{type}` (index.js:120-125):
  *     [[HealthListener]] classifies terminal query exceptions.
  *   - M6 process gauges + `/health`,`/ready`,`/info` (index.js:84-87,
  *     390-457): [[HealthListener]] accumulates StreamingQueryProgress
  *     (numInputRows, batch counts) — Spark's own progress feed replaces the
  *     Node event-loop/heap gauges.
  *
  * All state is a handful of in-memory counters on the driver — queryable as
  * DataFrames at any time without touching the running streams.
  */
object PipelineHealth {

  /** M3 — sink-operation counters. Sinks call [[inc]] from their
    * foreachBatch bodies; `snapshot` is the queryable metric table. */
  object SinkCounters {
    private val counts = new ConcurrentHashMap[(String, String), LongAdder]()
    def inc(operation: String, status: String, n: Long = 1): Unit =
      counts.computeIfAbsent((operation, status), _ => new LongAdder).add(n)
    def reset(): Unit = counts.clear()
    def snapshot: Seq[(String, String, Long)] =
      counts.asScala.toSeq.map { case ((op, st), v) => (op, st, v.sum) }
        .sortBy(t => (t._1, t._2))
  }

  /** M5/M6 — engine gauges and error counters fed by the streaming listener.
    * Register with `spark.streams.addListener`; one instance per pipeline. */
  final class HealthListener extends StreamingQueryListener {
    val queriesStarted = new LongAdder
    val queriesTerminated = new LongAdder
    val batchesCompleted = new LongAdder
    val rowsProcessed = new LongAdder
    val batchDurationMsTotal = new LongAdder // M2/M6: engine-side latency gauge
    private val errors = new ConcurrentHashMap[String, LongAdder]()

    override def onQueryStarted(e: QueryStartedEvent): Unit =
      queriesStarted.increment()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      batchesCompleted.increment()
      rowsProcessed.add(e.progress.numInputRows)
      batchDurationMsTotal.add(e.progress.batchDuration)
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
      queriesTerminated.increment()
      // error type = exception class prefix (application_errors_total{type})
      e.exception.foreach { msg =>
        val errType = msg.takeWhile(c => c != ':' && c != '\n').trim
        errors.computeIfAbsent(errType, _ => new LongAdder).increment()
      }
    }
    def errorCounts: Seq[(String, Long)] =
      errors.asScala.toSeq.map { case (k, v) => k -> v.sum }.sortBy(_._1)
  }

  /** One-row gauge table — the `/health` + `/metrics` scrape analog. */
  def summary(spark: SparkSession, l: HealthListener): DataFrame = {
    import spark.implicits._
    Seq((l.queriesStarted.sum, l.queriesTerminated.sum, l.batchesCompleted.sum,
      l.rowsProcessed.sum, l.errorCounts.map(_._2).sum))
      .toDF("queries_started", "queries_terminated", "batches_completed",
        "rows_processed", "application_errors")
  }

  /** M3 counter table (operation, status, n). */
  def sinkOps(spark: SparkSession): DataFrame = {
    import spark.implicits._
    SinkCounters.snapshot.toDF("operation", "status", "n")
  }

  /** M5 counter table (error_type, n). */
  def errorOps(spark: SparkSession, l: HealthListener): DataFrame = {
    import spark.implicits._
    l.errorCounts.toDF("error_type", "n")
  }
}
