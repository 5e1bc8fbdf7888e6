package graft.ops

import java.sql.Timestamp
import graft.SparkSpec

/** Bucketized interval-containment join: inclusive start, exclusive end,
  * multi-bucket spans, key isolation, no duplicate matches. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")

  test("range join: containment with [start, end) bounds across bucket borders") {
    val rows = Seq(
      (1, 10L, ts(0)),       // inside iv-a (starts exactly at 00:00)
      (1, 11L, ts(7, 30)),   // inside iv-a, different bucket than its start
      (1, 12L, ts(8)),       // == iv-a end → excluded (exclusive end)
      (1, 13L, ts(9)),       // in no interval
      (2, 20L, ts(7, 30))    // same instant as row 11 but key 2 → iv-b only
    ).toDF("k", "row_id", "ts")
    val ivs = Seq(
      (1, "iv-a", ts(0), ts(8)),     // spans buckets 0 and 1 at 300 s width
      (2, "iv-b", ts(5), ts(10))
    ).toDF("k", "iv", "start", "end")
    val out = RangeJoin.intervalJoin(rows, ivs, Seq("k"), "ts", "start", "end")
      .select($"row_id", $"iv").as[(Long, String)].collect().sorted.toSeq
    assert(out === Seq((10L, "iv-a"), (11L, "iv-a"), (20L, "iv-b")))
  }

  test("range join: a row in overlapping intervals matches each exactly once") {
    val rows = Seq((1, 1L, ts(6))).toDF("k", "row_id", "ts")
    val ivs = Seq(
      (1, "long", ts(0), ts(20)),    // spans 4 buckets — row must match once, not per bucket
      (1, "short", ts(5), ts(10))
    ).toDF("k", "iv", "start", "end")
    val out = RangeJoin.intervalJoin(rows, ivs, Seq("k"), "ts", "start", "end")
      .select($"iv").as[String].collect().sorted.toSeq
    assert(out === Seq("long", "short"))
  }
}
