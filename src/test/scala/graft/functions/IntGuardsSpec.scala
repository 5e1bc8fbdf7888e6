package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntGuardsSpec extends SparkSpec {
  import spark.implicits._

  test("ppmShare: exact floor ppm below the boundary, loud throw past it") {
    val max = IntGuards.MaxPpmNumerator
    // boundary-exact: the largest legal numerator still computes
    val ok = Seq((1L, 3L), (2L, 3L), (max, max))
      .toDF("n", "total")
      .select(IntGuards.ppmShare($"n", $"total", "spec").as("ppm"))
      .as[Long].collect().toSeq
    assert(ok === Seq(333333L, 666666L, 1000000L))
    // one past the boundary: raise_error, not a silent wrap
    val ex = intercept[Exception] {
      Seq((max + 1L, max + 1L)).toDF("n", "total")
        .select(IntGuards.ppmShare($"n", $"total", "spec_site").as("ppm"))
        .collect()
    }
    assert(ex.getMessage.contains("spec_site") &&
      ex.getMessage.contains("headroom"))
    // what the guard replaces: under this session's ANSI mode the raw
    // multiply dies with an unattributable ARITHMETIC_OVERFLOW mid-job
    // (and under non-ANSI deployments it would wrap silently instead)
    val raw = intercept[Exception] {
      Seq(max + 1L).toDF("n")
        .select(($"n" * lit(1000000L)).as("w")).as[Long].head()
    }
    assert(raw.getMessage.contains("ARITHMETIC_OVERFLOW") ||
      raw.getMessage.contains("overflow"))
  }

  test("q49 drift guard: the division compare admits exactly the pairs " +
    "whose product clears the bound") {
    val max = IntGuards.MaxPpmNumerator
    val rows = Seq(
      (3000000L, 3000000L), // 9e12 < max: legal
      (max, 1L),            // boundary-exact: legal
      (max / 2, 3L)         // past it: (max/2)*3 > max
    ).toDF("ta", "tb")
      .select($"ta", $"tb",
        ($"ta" > call_function("div", lit(max), greatest($"tb", lit(1L))))
          .as("throws"))
      .as[(Long, Long, Boolean)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(rows((3000000L, 3000000L)) === false)
    assert(rows((max, 1L)) === false)
    assert(rows((max / 2, 3L)) === true)
  }
}
