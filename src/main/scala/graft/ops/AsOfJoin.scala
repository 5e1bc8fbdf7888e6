package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of (temporal) join — for every left row, the single latest
  * right row of the same key with `rightTs <= leftTs` (inclusive), or with
  * [[asofJoinNext]] the earliest right row with `rightTs >= leftTs`. Spark
  * has no native as-of join; the naive encodings are a non-equi range join
  * (quadratic per key) or a broadcast + filter + argmax (re-shuffles per
  * step). This is the scale-correct form: UNION both sides, ONE shuffle on
  * the key, an in-partition sort by (ts, side), and a running
  * `last(_, ignoreNulls)` window carrying each right payload forward —
  * identical cost envelope to a window aggregation regardless of how many
  * right rows precede each left row.
  *
  * Contract: right must be unique per (key, rightTs) — pre-aggregate
  * duplicates (e.g. `max(id)`) or matches at tied timestamps are
  * nondeterministic. Ties between a left and right row at the SAME ts match
  * (inclusive), same as DuckDB/Pandas/kdb as-of semantics — the right side
  * sorts before the left at equal ts.
  */
object AsOfJoin {

  /** Left as-of join: `left` columns plus `asof_<p>` for every right payload
    * column `p`. `asof_<p>` is null when no prior right row exists, when the
    * latest prior right row's `p` is itself null — the payloads of one
    * output row always come from the SAME right row — or when `tolerance`
    * is given and the match is older than `leftTs - tolerance` (the pandas
    * `merge_asof(tolerance=...)` staleness bound: a year-old "latest state"
    * is usually worse than no state). `right` must contain the key columns,
    * `rightTs`, and the payload columns. `tolerance` is added to the ts
    * column, so pass an interval for timestamps or a number for numeric ts. */
  def asofJoinPrior(left: DataFrame, right: DataFrame, key: Seq[String],
                    leftTs: String, rightTs: String,
                    payload: Seq[String],
                    tolerance: Option[Column] = None): DataFrame =
    asofCore(left, right, key, leftTs, rightTs, payload, forward = false, tolerance)

  /** Forward as-of join: the EARLIEST right row with `rightTs >= leftTs` —
    * "what happened next" enrichment (next deploy after an error, next
    * session after a signup). Same single-shuffle plan, descending sort. */
  def asofJoinNext(left: DataFrame, right: DataFrame, key: Seq[String],
                   leftTs: String, rightTs: String,
                   payload: Seq[String],
                   tolerance: Option[Column] = None): DataFrame =
    asofCore(left, right, key, leftTs, rightTs, payload, forward = true, tolerance)

  private def asofCore(left: DataFrame, right: DataFrame, key: Seq[String],
                       leftTs: String, rightTs: String, payload: Seq[String],
                       forward: Boolean, tolerance: Option[Column]): DataFrame = {
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right
      .select((key :+ rightTs).map(col) ++ payload.map(col): _*)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .drop(rightTs)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(if (forward) col("__ts").desc else col("__ts").asc,
        col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE carried struct, not a per-column last: with per-column carries a
    // null payload VALUE in the latest prior right row would fall back to an
    // OLDER row's value for that column only, stitching the output from
    // different right rows (and an all-null-payload right row would be
    // invisible). The struct is non-null whenever the right ROW exists, so
    // row integrity survives nullable payloads — and it is still a single
    // Window node. The matched right ts rides along for the tolerance test.
    val carried = last(
      when(col("__side") === 0,
        struct(payload.map(col) :+ col("__ts").as("__rts"): _*)),
      ignoreNulls = true).over(w).as("__asof")
    val withinTol = tolerance.map { t =>
      if (forward) col("__asof.__rts") <= col("__ts") + t
      else col("__asof.__rts") >= col("__ts") - t
    }.getOrElse(lit(true))
    val valid = col("__asof").isNotNull && withinTol
    val asofCols = payload.map(p => when(valid, col(s"__asof.$p")).as(s"asof_$p"))
    unioned
      .select(col("*"), carried)
      .filter(col("__side") === 1)
      .select(col("*") +: asofCols: _*)
      .drop((payload ++ Seq("__ts", "__side", "__asof")): _*)
  }
}
