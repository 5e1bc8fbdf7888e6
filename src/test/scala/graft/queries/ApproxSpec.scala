package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy contract for the sketch-based entries that are rows-only in the
  * driver gate (no cross-engine oracle exists for HLL bytes): the estimate
  * must sit inside the advertised error envelope of the EXACT answer. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("q10 HLL estimates are within the advertised rsd of exact distinct counts") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.tables.Tables.lineitem(spark, dir)
    val rows = li.groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey").as("approx"),
           countDistinct($"l_orderkey").as("exact"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, approx, exact) =>
      // default rsd is 5%; allow 4 sigma so the test is deterministic-safe
      val tol = math.max(4 * 0.05 * exact, 8.0)
      assert(math.abs(approx - exact) <= tol,
        s"flag=$flag approx=$approx exact=$exact outside ±$tol")
    }
  }
}
