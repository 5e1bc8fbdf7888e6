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

  test("rows-only entries are exactly the declared structural set") {
    // entries without oracle SQL get only the driver's weaker rows-only
    // check — each of these is rows-only for a DECLARED structural reason
    // (engine-specific xxhash sketch family, recall-bounded float ANN,
    // HLL/sketch stores, the environmental codec stub), and every one
    // carries measured evidence columns or a certified integer twin. A new
    // entry landing here by accident (forgot the oracle) must fail loudly,
    // not silently downgrade its own gate.
    val declared = Set(
      "q10_approx_distinct",     // HLL NDV — evidence: ndv_err_ppm + exact sibling q9
      "q48_analyze_stats_approx",// sketch ANALYZE — evidence: *_err_ppm + exact q48
      "q51_hll_store",           // re-aggregatable HLL store — spec-bounded ±4σ; exact bitmap sibling q47
      "x2_minhash_lsh",          // xxhash64 MinHash — md5-portable twin oracle-checked; exact_jaccard_pm per pair
      "x2_simhash",              // xxhash64 SimHash — md5-portable twin oracle-checked; exact_jaccard_pm per pair
      "x3_ann_ivf",              // float ANN — measured recall_pm per query; certified-int twin x3_ann_ivf_int
      "x3_ann_lsh",              // float ANN — measured recall_pm; certified-int twin x3_ann_lsh_int
      "x3_ann_pq",               // float ANN — measured recall_pm; certified-int twin x3_ann_pq_int
      "x5_media_features")       // declared codec stub — int64 twin x5_media_features_int hash-green
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual === declared,
      s"undeclared rows-only entries (write the oracle or declare here): ${actual -- declared}; " +
        s"stale declarations: ${declared -- actual}")
    // the explicit board tally (round-13 verdict #7): registered =
    // oracle-checked + declared rows-only, so a missing-oracle typo can
    // never reach the driver as a silent `no_oracle` downgrade
    val oracled = (SparkEntry.queries.keySet & SparkEntry.oracleSql.keySet).size
    assert(SparkEntry.queries.size === oracled + declared.size,
      s"board tally drifted: ${SparkEntry.queries.size} registered != " +
        s"$oracled oracled + ${declared.size} declared rows-only")
  }

  test("no duplicate names across module query maps") {
    val maps = Seq(
      graft.queries.Relational.queries, graft.queries.MetricsOps.queries,
      graft.queries.LlmOps.queries, graft.queries.CurationQueries.queries,
      graft.queries.CdcQueries.queries)
    val dupes = maps.flatMap(_.keys).groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"entry name collides across modules (later map silently wins): $dupes")
  }

  test("the flagship entry analyzes (the driver's t1 smoke surface)") {
    assert(SparkEntry.entry(spark).schema.nonEmpty)
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
