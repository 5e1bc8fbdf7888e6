package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PromQL histogram_quantile parity (SURVEY.md P4 / §7.4): hand-computed
  * bucket-CDF interpolation values. */
class HistogramQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("linear interpolation inside the winning bucket matches PromQL") {
    // buckets [1, 2, 4]; observations: 2×(≤1), 2×(1,2], 4×(2,4]
    val agg = new HistogramQuantile(Array(1, 2, 4), 0.5)
    val buf = Seq(0.5, 0.9, 1.5, 1.7, 2.5, 3.0, 3.3, 3.9).foldLeft(agg.zero)(agg.reduce)
    // total=8, rank=4 → bucket (1,2] has cum=4 ≥ 4; lo=1,hi=2,cumBefore=2,in=2
    // q50 = 1 + 1 * (4-2)/2 = 2.0
    assert(agg.finish(buf) === 2.0)
  }

  test("q in first bucket interpolates from 0") {
    val agg = new HistogramQuantile(Array(10.0), 0.5)
    val buf = Seq(1.0, 2.0, 3.0, 4.0).foldLeft(agg.zero)(agg.reduce)
    // rank=2, bucket [0,10], cumBefore=0, in=4 → 0 + 10*(2/4) = 5
    assert(agg.finish(buf) === 5.0)
  }

  test("overflow bucket returns highest finite bound; empty input NaN") {
    val agg = new HistogramQuantile(Array(1.0, 2.0), 0.99)
    val buf = Seq(5.0, 6.0, 7.0).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) === 2.0)
    assert(agg.finish(agg.zero).isNaN)
  }

  test("works as a grouped UDAF in a DataFrame plan, merges across partitions") {
    val df = (1 to 100).map(i => ("g", i / 10.0)).toDF("k", "v").repartition(4)
    val out = df.groupBy($"k")
      .agg(HistogramQuantile.histogramQuantile($"v", 0.5, Array(2.0, 5.0, 10.0)).as("hq"))
      .select($"hq").as[Double].head()
    // values 0.1..10.0 uniform; 20 ≤2, 30 in (2,5], 50 in (5,10]; rank=50
    // cum(2)=20 <50; cum(5)=50 ≥ 50 → bucket (2,5]: lo=2 hi=5 cumBefore=20 in=30
    // hq = 2 + 3*(50-20)/30 = 5.0
    assert(math.abs(out - 5.0) < 1e-9)
  }

  test("registered as SQL aggregates: histogram_quantile_p50/p95/p99") {
    HistogramQuantile.registerSql(spark)
    Seq((0.04), (0.04), (0.4), (0.4)).toDF("latency").createOrReplaceTempView("lat_v")
    val r = spark.sql(
      "SELECT histogram_quantile_p50(latency) AS p50, histogram_quantile_p99(latency) AS p99 FROM lat_v")
      .as[(Double, Double)].head()
    // reference buckets: p50 rank 2 of 4 falls in (0.01, 0.05]; p99 in (0.1, 0.5]
    assert(r._1 > 0.01 && r._1 <= 0.05)
    assert(r._2 > 0.1 && r._2 <= 0.5)
  }
}
