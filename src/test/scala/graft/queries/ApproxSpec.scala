package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy contract for the sketch-based entries that are rows-only in the
  * driver gate (no cross-engine oracle exists for HLL bytes): the estimate
  * must sit inside the advertised error envelope of the EXACT answer. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile sits within the advertised accuracy of exact percentiles") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.tables.Tables.lineitem(spark, dir)
    // accuracy a => rank error <= n/a; translate to a VALUE envelope by
    // bracketing the exact percentiles at ranks p ± n/a
    val accuracy = 1000
    val n = li.count()
    val qs = Seq(0.5, 0.95, 0.99)
    val approx = li.agg(percentile_approx($"l_extendedprice",
        array(qs.map(lit): _*), lit(accuracy)).as("ap"))
      .as[Seq[Double]].head()
    val sorted = li.select($"l_extendedprice".cast("double"))
      .orderBy($"l_extendedprice").as[Double].collect()
    qs.zip(approx).foreach { case (q, est) =>
      val rank = (q * (n - 1)).toLong
      val slack = n / accuracy + 1
      val lo = sorted(math.max(0, (rank - slack).toInt))
      val hi = sorted(math.min(sorted.length - 1, (rank + slack).toInt))
      assert(est >= lo && est <= hi,
        s"p$q estimate $est outside exact-rank envelope [$lo, $hi]")
    }
  }

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
