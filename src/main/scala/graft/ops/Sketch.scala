package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-size frequency sketching (SURVEY.md §2.7 X4 / the §2.8 sketch
  * family): a count-min sketch over the PORTABLE md5 hash family — row `r`
  * hashes key `k` to bucket `md5_60bit(r || '|' || k) % width`, the same
  * `conv(substr(md5(..), 1, 15), 16, 10)` integer family the minhash /
  * simhash portable twins use. Unlike the xxhash64 sketches (rows-only
  * with error evidence), the WHOLE construction — bucketing, counter sums,
  * min-over-rows point estimates — replays in a SQL oracle, so the CMS
  * entry is hash-checked end to end.
  *
  * Scale shape: the counter table is depth×width cells REGARDLESS of the
  * key-stream size (one map-side-combined groupBy per row family), and
  * estimation joins a broadcast probe set against the broadcast counters.
  * CMS never undercounts — collisions only ADD — so `est ≥ exact` is a
  * structural invariant the entry emits as integer overcount evidence
  * (spec-pinned; the oracle re-derives it). */
object Sketch {

  /** 60-bit integer bucket of (row, key) in [0, width) — non-negative, so
    * `%` agrees across engines. */
  def cmsBucket(row: Int, key: Column, width: Int): Column =
    conv(substring(md5(concat(lit(row.toString), lit("|"), key)), 1, 15),
      16, 10).cast("bigint") % width

  /** The depth×width counter table of a key stream (one input row per key
    * OCCURRENCE): (r, b, cnt). Cells never touched by the stream are
    * simply absent (logically zero). ONE pass over the stream — the depth
    * buckets explode from an inline array per occurrence (a union of
    * depth scans would re-derive the key stream, e.g. re-split and
    * re-shingle the text, once per row family). */
  def cmsCounters(keys: DataFrame, keyCol: String, depth: Int,
                  width: Int): DataFrame =
    keys.select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cmsBucket(r, col(keyCol), width).as("b"))): _*))
        .as("rb"))
      .select(col("rb.r").as("r"), col("rb.b").as("b"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("cnt"))

  /** Point estimates for a probe frame: min over the depth rows of each
    * probe key's bucket counter (absent cell = 0 — the key was never seen
    * on that row, which for a probe drawn from the stream cannot happen
    * but keeps the lookup total). */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame =
    (0 until depth).map { r =>
        probes.select(col(keyCol), lit(r).as("r"),
          cmsBucket(r, col(keyCol), width).as("b"))
      }.reduce(_ unionByName _)
      .join(broadcast(counters), Seq("r", "b"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
}
