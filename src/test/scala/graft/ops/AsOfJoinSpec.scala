package graft.ops

import java.sql.Timestamp
import graft.SparkSpec

/** As-of join semantics on a hand-built fixture: latest-prior match,
  * inclusive ties, null when nothing precedes, key isolation. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("asof: latest prior right row per key, inclusive at equal ts, null before first") {
    val left = Seq(
      (1, ts(0), "l-a"),  // before any right row of key 1 → null
      (1, ts(4), "l-b"),  // after r@1 only → p=100
      (1, ts(5), "l-c"),  // tie with r@5 → inclusive → p=101
      (1, ts(9), "l-d"),  // after both → p=101
      (2, ts(3), "l-e"),  // key 2 has r@2 → p=200; key 1 rows invisible
      (3, ts(3), "l-f")   // key 3 has no right rows at all → null
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1, ts(1), 100),
      (1, ts(5), 101),
      (2, ts(2), 200)
    ).toDF("k", "rts", "p")

    val out = AsOfJoin.asofJoinPrior(left, right,
        key = Seq("k"), leftTs = "ts", rightTs = "rts", payload = Seq("p"))
      .select($"tag", $"asof_p")
      .as[(String, Option[Int])].collect().toMap

    assert(out === Map(
      "l-a" -> None, "l-b" -> Some(100), "l-c" -> Some(101),
      "l-d" -> Some(101), "l-e" -> Some(200), "l-f" -> None))
  }

  test("asof: nullable payloads keep row integrity — no stitching across right rows") {
    // the latest prior right row of key 1 at l@6 is r@5, whose p is NULL and
    // q=21: asof_p must be null (NOT fall back to r@1's 10) and asof_q=21 —
    // both payloads from the SAME right row. An all-null-payload right row
    // (key 2, r@2) must still be visible as the match.
    val left = Seq((1, ts(6), "l1"), (2, ts(6), "l2")).toDF("k", "ts", "tag")
    val right = Seq(
      (1, ts(1), Some(10), Some(20)),
      (1, ts(5), None, Some(21)),
      (2, ts(2), None, None)
    ).toDF("k", "rts", "p", "q")
    val out = AsOfJoin.asofJoinPrior(left, right,
        key = Seq("k"), leftTs = "ts", rightTs = "rts", payload = Seq("p", "q"))
      .select($"tag", $"asof_p", $"asof_q")
      .as[(String, Option[Int], Option[Int])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out("l1") === ((None, Some(21))))
    assert(out("l2") === ((None, None)))
  }

  test("asof: left columns pass through untouched, one output row per left row") {
    val left = Seq((1, ts(4), 7.5), (1, ts(6), 8.5)).toDF("k", "ts", "v")
    val right = Seq((1, ts(5), "x")).toDF("k", "rts", "s")
    val out = AsOfJoin.asofJoinPrior(left, right, Seq("k"), "ts", "rts", Seq("s"))
    assert(out.count() === 2)
    assert(out.columns.toSet === Set("k", "ts", "v", "asof_s"))
    assert(out.filter($"v" === 7.5).select($"asof_s").first().isNullAt(0))
  }

  test("asof forward: earliest following right row, inclusive ties, null after last") {
    val left = Seq(
      (1, ts(0), "l-a"),  // next right is r@1 → 100
      (1, ts(1), "l-b"),  // tie with r@1 → inclusive → 100
      (1, ts(2), "l-c"),  // next is r@5 → 101
      (1, ts(9), "l-d"),  // nothing follows → null
      (3, ts(3), "l-e")   // keyless → null
    ).toDF("k", "ts", "tag")
    val right = Seq((1, ts(1), 100), (1, ts(5), 101)).toDF("k", "rts", "p")
    val out = AsOfJoin.asofJoinNext(left, right,
        Seq("k"), "ts", "rts", Seq("p"))
      .select($"tag", $"asof_p").as[(String, Option[Int])].collect().toMap
    assert(out === Map("l-a" -> Some(100), "l-b" -> Some(100),
      "l-c" -> Some(101), "l-d" -> None, "l-e" -> None))
  }

  test("asof tolerance: stale matches null out, fresh ones survive, both directions") {
    import org.apache.spark.sql.functions.expr
    val left = Seq((1, ts(10), "near"), (1, ts(30), "far")).toDF("k", "ts", "tag")
    val right = Seq((1, ts(8), 7)).toDF("k", "rts", "p")
    val prior = AsOfJoin.asofJoinPrior(left, right, Seq("k"), "ts", "rts",
        Seq("p"), tolerance = Some(expr("INTERVAL 5 MINUTES")))
      .select($"tag", $"asof_p").as[(String, Option[Int])].collect().toMap
    assert(prior === Map("near" -> Some(7), "far" -> None)) // 22 min stale
    val leftF = Seq((1, ts(5), "near"), (1, ts(1), "far")).toDF("k", "ts", "tag")
    val next = AsOfJoin.asofJoinNext(leftF, right, Seq("k"), "ts", "rts",
        Seq("p"), tolerance = Some(expr("INTERVAL 5 MINUTES")))
      .select($"tag", $"asof_p").as[(String, Option[Int])].collect().toMap
    assert(next === Map("near" -> Some(7), "far" -> None)) // 7 min ahead
  }
}
