package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range (interval-containment) join — match each timestamped row
  * to the interval(s) of the same key containing it, `start <= ts < end`.
  *
  * Spark plans the naive `ON key = key AND ts >= start AND ts < end` as a
  * join on the equality key with the range as a post-filter — per key that
  * is rows × intervals, quadratic for hot keys. Bucketizing makes the
  * blow-up explicit and bounded: intervals explode to the fixed-width time
  * buckets they cover, rows carry their single bucket, and the join key is
  * (key, bucket) with exact containment as a cheap residual filter. A row
  * meets each interval in at most one bucket (its own), so no dedup pass is
  * needed. Fan-out cost is interval_span / bucketSec rows per interval —
  * pick `bucketSec` near the typical interval length so most intervals
  * explode to a handful of buckets. */
object RangeJoin {

  def intervalJoin(rows: DataFrame, intervals: DataFrame, key: Seq[String],
                   tsCol: String, startCol: String, endCol: String,
                   bucketSec: Long = 300L): DataFrame = {
    val usPerBucket = bucketSec * 1000000L
    // cast covers TIMESTAMP_NTZ inputs (unix_micros takes TIMESTAMP only);
    // the session is UTC-pinned and both sides cast identically, so bucket
    // boundaries stay consistent
    def us(c: String) = unix_micros(col(c).cast("timestamp"))
    val r = rows.withColumn("__bucket",
      floor(us(tsCol) / usPerBucket).cast("bigint"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(us(startCol) / usPerBucket).cast("bigint"),
        floor((us(endCol) - 1) / usPerBucket).cast("bigint"))))
    r.join(iv, key :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
