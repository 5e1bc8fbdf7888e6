package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Prometheus-parity histogram quantile (SURVEY.md P4, §7.4 hard part).
  *
  * `approx_percentile` (GK sketch) diverges from PromQL's
  * `histogram_quantile`, which (a) buckets observations into fixed `le`
  * buckets and (b) linearly interpolates *within* the winning bucket
  * (promql/quantile.go semantics): assume uniform distribution inside the
  * bucket, so q-th quantile = lo + (hi-lo) * (rank - cumBefore) / inBucket.
  *
  * Implemented as a typed [[Aggregator]] over a fixed bucket array — the
  * buffer is one long per bucket (tiny, mergeable, shuffle-friendly), so the
  * aggregation is a standard partial/final hash agg at any scale.
  *
  * Reference buckets: [.001,.005,.01,.05,.1,.5,1,2,5] at
  * node-consumer/index.js:102.
  */
class HistogramQuantile(buckets: Array[Double], q: Double)
    extends Aggregator[Double, Array[Long], Double] {

  override def zero: Array[Long] = new Array[Long](buckets.length + 1)

  override def reduce(buf: Array[Long], value: Double): Array[Long] = {
    var i = 0
    while (i < buckets.length && value > buckets(i)) i += 1
    buf(i) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** PromQL bucketQuantile: rank within the cumulative distribution,
    * linear interpolation inside the winning bucket; the +Inf bucket
    * returns its lower bound (Prometheus returns the highest finite le). */
  override def finish(buf: Array[Long]): Double = {
    val total = buf.sum
    if (total == 0) return Double.NaN
    val rank = q * total
    var cum = 0L
    var i = 0
    while (i < buf.length) {
      cum += buf(i)
      if (cum >= rank) {
        if (i >= buckets.length) return buckets.last // +Inf bucket
        val lo = if (i == 0) 0.0 else buckets(i - 1)
        val hi = buckets(i)
        val cumBefore = cum - buf(i)
        val inBucket = buf(i).toDouble
        return lo + (hi - lo) * ((rank - cumBefore) / inBucket)
      }
      i += 1
    }
    buckets.last
  }

  // ExpressionEncoder, not javaSerialization: the buffer crosses the
  // partial→final agg exchange on every shuffle — ObjectOutputStream there
  // is pure overhead for a long[]
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object HistogramQuantile {
  /** Reference latency buckets (index.js:102). */
  val referenceBuckets: Array[Double] =
    Array(0.001, 0.005, 0.01, 0.05, 0.1, 0.5, 1, 2, 5)

  /** Column form: histogram_quantile(q) over `c` with the given buckets. */
  def histogramQuantile(c: Column, q: Double,
                        buckets: Array[Double] = referenceBuckets): Column =
    udaf(new HistogramQuantile(buckets, q)).apply(c)

  /** Register as a SQL aggregate (`SELECT histogram_quantile_p95(latency)`)
    * — the §2.8 UDAF surface for SQL users; q is baked per name because SQL
    * UDAF parameters must be data columns, not constants. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(0.5 -> "p50", 0.95 -> "p95", 0.99 -> "p99").foreach { case (q, n) =>
      spark.udf.register(s"histogram_quantile_$n",
        udaf(new HistogramQuantile(referenceBuckets, q)))
    }
}
