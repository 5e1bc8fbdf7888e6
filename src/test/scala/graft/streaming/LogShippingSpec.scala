package graft.streaming

import graft.SparkSpec

/** S6 log-shipping parse semantics (docker json-file → level/component). */
class LogShippingSpec extends SparkSpec {
  import spark.implicits._

  test("docker json logs parse; malformed lines survive as UNKNOWN") {
    val out = LogShipping.parse(LogShipping.fixtureRaw(spark))
    assert(out.count() === 7)
    val lv = out.groupBy("level").count().as[(String, Long)].collect().toMap
    assert(lv === Map("INFO" -> 3L, "WARN" -> 1L, "ERROR" -> 1L,
      "DEBUG" -> 1L, "UNKNOWN" -> 1L))
    val comp = out.filter($"level" === "ERROR").select($"component").as[String].head()
    assert(comp === "elasticsearch")
    // the malformed line keeps its raw text (skip-on-error, never dropped)
    val raw = out.filter($"level" === "UNKNOWN").select($"log").as[String].head()
    assert(raw.contains("misconfigured"))
  }

  test("same parse plan runs incrementally over a stream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[String]
    val q = LogShipping.parse(mem.toDF())
      .groupBy($"level").count()
      .writeStream.format("memory").queryName("log_levels")
      .outputMode("complete").start()
    mem.addData(LogShipping.fixtureLines: _*)
    q.processAllAvailable()
    q.stop()
    val lv = spark.table("log_levels").as[(String, Long)].collect().toMap
    assert(lv("INFO") === 3L && lv("UNKNOWN") === 1L)
  }
}
