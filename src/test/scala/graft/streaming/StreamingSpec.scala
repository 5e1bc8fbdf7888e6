package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.cdc.CanalJson
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming assembly (SURVEY.md §3.1): the same canal-json plan
  * runs incrementally over a MemoryStream; windowed counts and routing match
  * the batch twin. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(lines: Seq[String], name: String,
                        plan: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        mode: OutputMode = OutputMode.Append()) = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val raw = mem.toDF().withColumnRenamed("value", "value")
      .withColumn("partition", lit(0))
      .withColumn("offset", xxhash64($"value")) // stable content-derived offset (streaming bans monotonically_increasing_id)
    val q = plan(raw).writeStream.format("memory").queryName(name).outputMode(mode).start()
    mem.addData(lines: _*)
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("streaming parse+flatten matches the batch twin row-for-row") {
    val lines = CanalJson.fixtureLines.map(_._1)
    val streamed = runStream(lines, "stream_events", CdcPipeline.events)
    val batch = CanalJson.events(CanalJson.fixtureRaw(spark))
    // compare per-(table,op) counts (offsets differ between sources)
    val a = streamed.groupBy($"table", $"op").count().as[(String, String, Long)].collect().toSet
    val b = batch.groupBy($"table", $"op").count().as[(String, String, Long)].collect().toSet
    assert(a === b)
  }

  test("streaming update-mode operation counters (M1)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val raw = mem.toDF()
      .withColumn("partition", lit(0)).withColumn("offset", xxhash64($"value"))
    val q = CdcPipeline.operationCounts(CdcPipeline.events(raw))
      .writeStream.format("memory").queryName("op_counts").outputMode(OutputMode.Complete()).start()
    mem.addData(CanalJson.fixtureLines.map(_._1): _*)
    q.processAllAvailable()
    q.stop()
    val counts = spark.table("op_counts").as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(counts(("products", "insert")) === 3) // 3-row seed INSERT
    assert(counts(("unknown", "insert")) === 1)  // missing-table line defaults to 'unknown'
    assert(counts(("orders", "update")) === 2)   // incl. duplicate delivery
    assert(counts(("products", "delete")) === 1)
  }

  test("P7 sustained threshold: fires only after the hold-down duration") {
    import Alerts._
    def t(min: Int) = new Timestamp(1704067200000L + min * 60000L)
    val pts = Seq(
      MetricPoint("tbl", t(0), 0.05),  // below
      MetricPoint("tbl", t(1), 0.2),   // breach starts
      MetricPoint("tbl", t(3), 0.3),   // 2 min in — not yet (for: 5m)
      MetricPoint("tbl", t(6), 0.4),   // 5 min in → FIRING
      MetricPoint("tbl", t(8), 0.01),  // recovery → RESOLVED
    )
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MetricPoint]
    val q = sustainedThreshold(mem.toDS(), threshold = 0.1, forDurationMs = 5 * 60000L)
      .writeStream.format("memory").queryName("alerts").outputMode(OutputMode.Append()).start()
    mem.addData(pts: _*)
    q.processAllAvailable()
    q.stop()
    val alerts = spark.table("alerts").as[Alert].collect().sortBy(_.atMs)
    assert(alerts.map(_.alert).toSeq === Seq("FIRING", "RESOLVED"))
    assert(alerts.head.atMs === t(6).getTime)
  }

  test("P7 batch twin: consecutive-breach islands with run length") {
    val rates = Seq(
      ("tbl", Timestamp.valueOf("2024-01-01 00:00:00"), 0.05),
      ("tbl", Timestamp.valueOf("2024-01-01 00:01:00"), 0.2),
      ("tbl", Timestamp.valueOf("2024-01-01 00:02:00"), 0.2),
      ("tbl", Timestamp.valueOf("2024-01-01 00:03:00"), 0.2),
      ("tbl", Timestamp.valueOf("2024-01-01 00:04:00"), 0.05),
      ("tbl", Timestamp.valueOf("2024-01-01 00:05:00"), 0.2),
    ).toDF("key", "bucket_start", "rate")
    val out = Alerts.sustainedThresholdBatch(rates, 0.1, 3)
      .select($"run_len").as[Long].collect()
    assert(out.toSeq === Seq(3L)) // only the 3-bucket island qualifies
  }

  test("dead-letter stream: malformed + DDL routed, valid not") {
    val streamed = runStream(CanalJson.fixtureLines.map(_._1), "dead_letter",
      raw => CdcPipeline.deadLetter(raw).groupBy($"reason").count(),
      OutputMode.Complete())
    val m = streamed.as[(String, Long)].collect().toMap
    assert(m.getOrElse("ddl", 0L) === 1L)
    assert(m.getOrElse("parse_error", 0L) === 1L)
    assert(m.values.sum === 2L)
  }
}
