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

  test("p36 core: double exponential smoothing matches hand-run Prometheus " +
      "holtWinters, including a NEGATIVE smoothed level") {
    // hand recursion (sf=tf=1/2): series [2,4,6] — s1=x2=4, b=2;
    // s2=(6+4+2)/2=6 (the trend term tracks a ramp exactly, where the
    // level-only EWMA of p20_smooth would lag). series [1000,0,0] —
    // s1=0, b=-1000; s2=(0+0-1000)/2=-500: the level goes NEGATIVE, which
    // is exactly the case the floor-division form exists for.
    val ts = (i: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:0$i:00")
    val bucketed = Seq(
      ("ramp", ts(0), 2L), ("ramp", ts(1), 4L), ("ramp", ts(2), 6L),
      ("drop", ts(0), 1000L), ("drop", ts(1), 0L), ("drop", ts(2), 0L))
      .toDF("event_type", "bucket_start", "cnt")
    val out = MetricsOps.holtWinters(bucketed)
      .select($"event_type", $"bucket_start", $"smooth_ppm")
      .as[(String, java.sql.Timestamp, Long)].collect()
      .map(r => (r._1, r._2.toString.take(16), r._3)).toSet
    assert(out === Set(
      ("ramp", "2024-01-01 00:01", 4000000L),  // s1 = x2 = 4
      ("ramp", "2024-01-01 00:02", 6000000L),  // trend-exact on the ramp
      ("drop", "2024-01-01 00:01", 0L),        // s1 = x2 = 0
      ("drop", "2024-01-01 00:02", -500000000L))) // negative level, floored
  }

  test("p34 core: the counter zero-point clamp caps start extrapolation " +
      "at the instant the counter would have read zero") {
    // Window (0, 3600], samples (600 s, v=1), (1200 s, v=101): increase =
    // 100, sampled = 600 s, durationToZero = 600·1/100 = 6 s < durStart =
    // 600 s -> clamp. 6 < threshold 660 -> extend start by 6 only (the
    // un-clamped formula would extend by the full 600 and report 104166);
    // end margin 2400 >= 660 -> avg/2 = 300. rate = 100·(600+6+300)/600
    // over 3600 s = 41944.4 upm, floored. Second shape: (800 s, v=12),
    // (1400 s, v=22): durationToZero = 600·12/10 = 720 < durStart = 800
    // -> clamp, but 720 >= threshold 660 -> avg/2 = 300 anyway; end 2200
    // >= 660 -> 300. rate = 10·(600+300+300)/600 over 3600 s = 5555.5 upm.
    val samples = Seq(("a", 600L, 1L), ("a", 1200L, 100L),
        ("b", 800L, 12L), ("b", 1400L, 10L))
      .toDF("event_type", "sec", "cnt")
    val out = MetricsOps.promRate(samples)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("a", 3600L, 2L, 100L, 41944L),
      ("b", 3600L, 2L, 10L, 5555L)))
  }

  test("p34 core: single-sample windows yield no row (PromQL empty vector)") {
    val samples = Seq(("k", 600L, 5L), ("k", 7200L, 3L))
      .toDF("event_type", "sec", "cnt")
    // two windows, one sample each -> both filtered
    assert(MetricsOps.promRate(samples).count() === 0L)
  }
}
