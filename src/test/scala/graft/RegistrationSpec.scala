package graft

/** The registration gate (round-12 postmortem): `cdc_dedup_stream` landed in
  * the driver map with an analysis-time `UNRESOLVED_COLUMN` because nothing
  * forced a registered builder to ever run before the snapshot commit. This
  * spec makes that class of failure impossible to ship: every entry in
  * [[SparkEntry.queries]] must at least BUILD (Spark analyzes a DataFrame
  * eagerly at construction, and the streaming census builders execute their
  * micro-batches inside the builder) on the sf0.001 tables. It deliberately
  * does NOT execute batch plans — correctness belongs to the DuckDB oracle
  * gate (`tools/verify_local.py`); this is the cheap "can it analyze at all"
  * floor that runs on every `sbt test`.
  */
class RegistrationSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("every oracle SQL key has a registered builder") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL with no builder (dead oracle): $orphans")
  }

  test("no duplicate names across module query maps") {
    val maps = Seq(
      graft.queries.Relational.queries, graft.queries.MetricsOps.queries,
      graft.queries.LlmOps.queries, graft.queries.CurationQueries.queries,
      graft.queries.CdcQueries.queries)
    val dupes = maps.flatMap(_.keys).groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"entry name collides across modules (later map silently wins): $dupes")
  }

  test("every registered builder analyzes on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).schema; None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | "))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} entries fail analysis:\n${failures.mkString("\n")}")
  }
}
