package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY.md §4 scale posture: "salting for hot
  * tables" — the reference's products table takes ~all traffic,
  * run_test.sh).
  *
  * AQE's skew-join handling splits oversized shuffle partitions at runtime;
  * salting is the plan-level complement for when a SINGLE KEY is hot enough
  * that any partition holding it is oversized:
  *
  *   - [[saltedJoin]]: the big side's rows get a deterministic salt in
  *     [0, salts); the small side is replicated once per salt value; the
  *     join key becomes (key, salt), spreading one hot key over `salts`
  *     reducers. Result set identical to the plain join.
  *   - [[saltedAgg]]: two-phase aggregation — partial per (key, salt), then
  *     final per key — bounding any single reducer's share of a hot key.
  *     (Spark's hash aggregate already does map-side partials; the explicit
  *     salt phase additionally bounds the FINAL-stage key fan-in, which
  *     matters when one key dominates an entire stage.)
  *
  * Salts derive from xxhash64 of caller-named columns (deterministic across
  * retries — rand() would break task-retry idempotency).
  */
object SkewJoin {

  private def saltCol(saltBy: Seq[String], salts: Int): Column =
    pmod(xxhash64(saltBy.map(col): _*), lit(salts))

  /** Equi-join `big ⋈ small` on `key`, spreading the big side's hot keys
    * over `salts` sub-keys. `saltBy` must identify a row ~uniquely on the
    * big side (any unique column set) so salt values distribute evenly. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBy: Seq[String], salts: Int = 8): DataFrame = {
    val b = big.withColumn("_salt", saltCol(saltBy, salts))
    val s = small.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase count+sum aggregation by `key`: partial per (key, salt) →
    * final per key. Output: (key, cnt, sum_<valueCol>). */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
                saltBy: Seq[String], salts: Int = 8): DataFrame =
    df.withColumn("_salt", saltCol(saltBy, salts))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_cnt"), sum(col(valueCol)).as("_sum"))
      .groupBy(col(key))
      .agg(sum(col("_cnt")).as("cnt"), sum(col("_sum")).as(s"sum_$valueCol"))
}
