package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.{CanalJson, CdcApply}

/** Canal-json CDC pipeline exposed as named queries over the embedded
  * replay fixture (FIXTURES.md §A; run_test.sh workload). These are
  * rows-only checks for the driver (the wire format isn't in the parquet
  * testdata); full semantic assertions live in the ScalaTest specs.
  *
  * `sfDir` is unused — the fixture is self-contained so the queries run
  * under any scale factor. */
object CdcQueries {

  /** T1-T5 — parse + flatten + envelope: the per-row event stream. */
  def cdc_parse_events(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CanalJson.events(CanalJson.fixtureRaw(s))
      .select($"timestamp", $"database", $"table", $"operation", $"op",
        to_json($"data").as("data_json"),
        to_json($"old_data").as("old_data_json"),
        $"sql", $"partition", $"offset")
      .orderBy($"offset", $"data_json")
  }

  /** T2/T6 — dead-letter routing with reason classification
    * (invalid_format / ddl / parse_error → M4/M5 counters). */
  def cdc_invalid_routing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CanalJson.invalid(CanalJson.parse(CanalJson.fixtureRaw(s)))
      .groupBy($"reason").agg(count(lit(1)).as("cnt"))
      .orderBy($"reason")
  }

  /** M1 — per-(table, op) operation counters over the event stream. */
  def cdc_op_counts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CanalJson.events(CanalJson.fixtureRaw(s))
      .groupBy($"table", $"op").agg(count(lit(1)).as("cnt"))
      .orderBy($"table", $"op")
  }

  /** W1-W6 — CDC apply: materialized latest state per key with delete
    * tombstones, idempotent under the fixture's duplicate delivery. */
  def cdc_materialize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CdcApply.materialize(CanalJson.events(CanalJson.fixtureRaw(s)))
      .select($"database", $"table", $"pk", $"op",
        to_json($"data").as("data_json"), $"timestamp")
      .orderBy($"table", $"pk")
  }

  /** W4 — old→new transition audit (status changes with old images). */
  def cdc_transitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CdcApply.transitions(
        CanalJson.events(CanalJson.fixtureRaw(s)), "status")
      .orderBy($"pk", $"timestamp")
  }

  /** T7 — typed per-table view: products with DECIMAL(10,2) price
    * discipline (money never becomes double). */
  def cdc_typed_products(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CanalJson.typedView(
        CanalJson.events(CanalJson.fixtureRaw(s)),
        "products", CanalJson.productsSchema)
      .orderBy($"offset", $"id")
  }

  /** M4 — message-status counter as the success ∪ invalid-reason union
    * (kafka_messages_processed_total{status}, index.js:113-118): every
    * fixture line lands in exactly one status bucket. */
  def cdc_message_status(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parsed = CanalJson.parse(CanalJson.fixtureRaw(s))
    val success = parsed.filter(CanalJson.isValid)
      .agg(count(lit(1)).as("cnt")).select(lit("success").as("status"), $"cnt")
    val invalid = CanalJson.invalid(parsed)
      .groupBy($"reason".as("status")).agg(count(lit(1)).as("cnt"))
    success.unionByName(invalid).orderBy($"status")
  }

  /** M3/M5/M6 — engine health surface: run the embedded fixture through the
    * real streaming path (file source → parse/flatten → incremental
    * materialize sink) with [[graft.streaming.PipelineHealth]] attached, then
    * surface the gauges and sink counters as one metric table — the
    * /health + /metrics scrape analog (index.js:390-457). */
  def cdc_health_surface(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.{CdcPipeline, PipelineHealth}
    val listener = new PipelineHealth.HealthListener
    s.streams.addListener(listener)
    PipelineHealth.SinkCounters.reset()
    val tmp = java.nio.file.Files.createTempDirectory("graft_health").toString
    try {
      val in = java.nio.file.Paths.get(tmp, "in")
      java.nio.file.Files.createDirectories(in)
      java.nio.file.Files.write(in.resolve("fixture.jsonl"),
        CanalJson.fixtureLines.map(_._1).mkString("\n").getBytes("UTF-8"))
      val events = CanalJson.events(CdcPipeline.fileSource(s, in.toString))
      val q = CdcPipeline.materializeSink(events.coalesce(1),
        s"$tmp/state", s"$tmp/ckpt", nBuckets = 4).start()
      q.processAllAvailable()
      q.stop()
    } finally s.streams.removeListener(listener)
    val gauges = Seq(
      ("engine", "queries_started", listener.queriesStarted.sum),
      ("engine", "queries_terminated", listener.queriesTerminated.sum),
      ("engine", "rows_processed", listener.rowsProcessed.sum),
      ("engine", "application_errors", listener.errorCounts.map(_._2).sum),
      ("engine", "batches_completed_min1",
        math.min(listener.batchesCompleted.sum, 1L))) // clamp: empty-batch count varies by trigger timing
    val sinks = PipelineHealth.SinkCounters.snapshot
      .map { case (op, st, n) => (s"sink_$op", st, n) }
    (gauges ++ sinks).toDF("component", "metric", "value")
      .orderBy($"component", $"metric")
  }

  /** S6 — log shipping (filebeat analog): docker json-file lines → parse →
    * per-(stream, level, component) counts; malformed lines survive as
    * UNKNOWN. */
  def s6_log_levels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.LogShipping
    LogShipping.parse(LogShipping.fixtureRaw(s))
      .groupBy($"stream", $"level", $"component")
      .agg(count(lit(1)).as("cnt"), max($"ts").as("last_ts"))
      .orderBy($"stream", $"level", $"component")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_parse_events" -> cdc_parse_events _,
    "cdc_invalid_routing" -> cdc_invalid_routing _,
    "cdc_op_counts" -> cdc_op_counts _,
    "cdc_materialize" -> cdc_materialize _,
    "cdc_transitions" -> cdc_transitions _,
    "cdc_typed_products" -> cdc_typed_products _,
    "cdc_message_status" -> cdc_message_status _,
    "cdc_health_surface" -> cdc_health_surface _,
    "s6_log_levels" -> s6_log_levels _,
  )

  /** Not DuckDB-expressible (embedded wire-format fixture, not parquet
    * tables) → rows-only checks per the driver contract. */
  val oracleSql: Map[String, String] = Map()
}
