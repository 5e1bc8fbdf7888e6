package graft.queries

import graft.SparkSpec

/** Hand-computed micro-cases for the metric operators whose formulas come
  * from an external specification (here: Prometheus' `extrapolatedRate`) —
  * the DuckDB oracle certifies cross-engine determinism of whatever formula
  * both sides implement; these cases certify the formula is the RIGHT one,
  * against values worked out from the Prometheus algorithm by hand. */
class MetricsUnitSpec extends SparkSpec {
  import spark.implicits._

  test("p34 core: extrapolation branches match hand-computed Prometheus " +
      "values (near boundary extends fully, far boundary by half-interval)") {
    // window (0, 3600]: samples at 600/1200/1800 s, day-cumulative 2/5/6.
    // increase = 4, sampled = 1200 s, avg = 600 s, threshold = 660 s.
    // start margin 600 < 660 -> extend fully; end margin 1800 >= 660 ->
    // extend by avg/2 = 300. extrapolated = 4*(1200+600+300)/1200 = 7 over
    // the 3600 s range = 1944.4 micro-ops/s, floored to 1944.
    val samples = Seq(("k", 600L, 2L), ("k", 1200L, 3L), ("k", 1800L, 1L))
      .toDF("event_type", "sec", "cnt")
    val out = MetricsOps.promRate(samples)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(("k", 3600L, 3L, 4L, 1944L)))
  }

  test("p34 core: a counter reset inside the window contributes the " +
      "pre-drop value; the first sample's cross-boundary delta does not") {
    // day-0 series 2/5/6/10 (last at 84600 s), day-1 restart v=1 at 86400.
    // window (82800, 86400]: samples (84600, v=10) and (86400, v=1) -> the
    // reset repair adds prev=10, increase = 1-10+10 = 1. n=2, sampled=1800,
    // start margin 1800 < 1.1*1800 -> extend fully; end margin 0 -> extend
    // fully. extrapolated = 1*(1800+1800+0)/1800 = 2 over 3600 s = 555 upm.
    // The 84600 sample's own delta (10-6=4, no reset) and the earlier
    // window (0, 3600] from the first test's shape are also emitted.
    val samples = Seq(("k", 600L, 2L), ("k", 1200L, 3L), ("k", 1800L, 1L),
        ("k", 84600L, 4L), ("k", 86400L + 0L, 1L))
      .toDF("event_type", "sec", "cnt")
    val out = MetricsOps.promRate(samples)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("k", 3600L, 3L, 4L, 1944L),
      ("k", 86400L, 2L, 1L, 555L)))
  }

  test("p34 core: single-sample windows yield no row (PromQL empty vector)") {
    val samples = Seq(("k", 600L, 5L), ("k", 7200L, 3L))
      .toDF("event_type", "sec", "cnt")
    // two windows, one sample each -> both filtered
    assert(MetricsOps.promRate(samples).count() === 0L)
  }
}
