package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines (SURVEY.md §2.7
  * X7): deterministic split assignment, per-group quota capping (data
  * mixing), token-budget bin-packing (sequence packing), and shard
  * interleaving (training-order randomization).
  *
  * Everything here is integer arithmetic over ids and token counts — exact
  * on any engine, so every operator is DuckDB-oracle-checkable (unlike the
  * xxhash64-based dedup family). The mixing functions are small modular
  * LCG-style maps: not cryptographic, but deterministic, reproducible across
  * engines, and well-spread for bucketing/splitting purposes.
  *
  * Scale notes (100 TB): all four operators are a single hash-partitioned
  * shuffle — split/bucket assignment is a stateless projection (no shuffle at
  * all), quota-cap and bin-pack are one window per group key, and interleave
  * windows by shard. There is deliberately NO global `orderBy` anywhere: a
  * total order over 100 TB is a range-shuffle bottleneck, so packing and
  * interleaving order only WITHIN their partition key.
  */
object Curation {

  /** Deterministic pseudo-random bucket in [0, buckets) from an id:
    * affine map mod the prime 1e9+7, then reduced. Exact in int64 for
    * ids < ~9.2e12 (id * 1000003 must not overflow). */
  def hashBucket(id: Column, buckets: Int): Column =
    ((id * 1000003L + 12345L) % 1000000007L) % buckets

  /** Train/validation/test split assignment by [[hashBucket]] percent —
    * the standard leakage-free split: membership depends only on the id,
    * so re-runs and incremental appends never move a document between
    * splits. */
  def splitAssign(id: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    val b = hashBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Z-order (Morton) interleave of two non-negative dimension columns:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Sorting or
    * range-partitioning 100 TB by this value co-locates rows that are close
    * in BOTH dimensions, so min/max file statistics prune scans filtered on
    * either column — the standard multi-dimensional layout trick
    * (Delta/Iceberg `ZORDER BY`), as a plain codegen'd expression. */
  def zOrder(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(1), 2 * b)
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(1), 2 * b + 1))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Lehmer / Park-Miller step: (id+1) * 48271 mod (2^31 - 1). A bijection
    * on [1, 2^31-2], so ordering by it is a deterministic pseudo-random
    * PERMUTATION of ids below 2^31-2 — the "global shuffle" of a training
    * run, without a random source. */
  def permuteHash(id: Column): Column =
    (id + 1L) * 48271L % 2147483647L

  /** Per-group quota cap (data mixing / curation): keep the top `cap` rows
    * of each group by `order` (descending), deterministic tie-break on
    * `tieBreak` ascending. One window shuffle on the group keys; the filter
    * happens before any downstream join sees the data. */
  def quotaCap(df: DataFrame, group: Seq[Column], order: Column,
               tieBreak: Column, cap: Int): DataFrame = {
    val w = Window.partitionBy(group: _*).orderBy(order.desc, tieBreak.asc)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= cap)
  }

  /** Offset-based token bin-packing (sequence packing): within each
    * `group`, documents in `orderCol` order are laid end-to-end and a
    * document belongs to the bin its FIRST token lands in:
    * `bin = floor(start_offset / budget)`. One window per group, exact
    * integer math (cumulative sums stay < 2^53 so the floor-of-double is
    * exact). A document longer than `budget` straddles bins — offset
    * packing charges it to its starting bin, the standard approximation
    * when the consumer re-chunks anyway. */
  def binPack(df: DataFrame, group: Column, orderCol: Column,
              tokens: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(orderCol.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tok", tokens)
      .withColumn("start_offset", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin", floor(col("start_offset") / lit(budget)).cast("bigint"))
  }

  /** Benchmark decontamination: count, per corpus document, the distinct
    * n-gram shingles it shares with ANY document of an evaluation set —
    * documents over a threshold are flagged for exclusion from training
    * (they would leak benchmark answers). Implemented as an inverted-index
    * semi-structure: explode both sides to (id, shingle-hash), join on the
    * 8-byte hash (fixed-width shuffle keys; collisions ~n²/2⁶⁴ — callers
    * needing exactness join on the shingle string), count distinct matches
    * per corpus doc. At 100 TB the eval side is small — Spark broadcasts it
    * and the corpus side never shuffles. */
  def decontaminate(corpus: DataFrame, eval: DataFrame, textCol: String,
                    idCol: String, shingleSize: Int = 3): DataFrame = {
    def shingleHashes(df: DataFrame, as: String) = df
      .select(col(idCol).as(as),
        explode(Dedup.shingles(col(textCol), shingleSize)).as("shingle"))
      .select(col(as), xxhash64(col("shingle")).as("shingle_h"))
    val evalSh = shingleHashes(eval, "eval_id")
      .select(col("shingle_h")).distinct()
    shingleHashes(corpus, "doc_id")
      .join(broadcast(evalSh), Seq("shingle_h"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle_h")).as("n_common"))
  }

  /** Uniform basis points in [0, 10000) derived only from the id, via the
    * md5-portable construction the sketch twins use (first 15 hex chars →
    * 60-bit integer — exact in int64 on any engine). Deterministic and
    * engine-reproducible where `rand()` is neither. */
  def sampleBasisPoints(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("bigint") % 10000L

  /** Sequential Poisson sampling priority (Ohlsson 1998): `u / w` with `u`
    * the id's 60-bit md5-uniform and `w` the row's weight — keeping the k
    * SMALLEST priorities is a weighted sample without replacement whose
    * inclusion probabilities are asymptotically proportional to weight
    * (πps), the survey-sampling standard (Sweden's official-statistics
    * estimator) and the classic fixed-size weighted-sampling trick.
    * Engine-exact: u and w are integers and the single division is IEEE
    * correctly-rounded — no pow/log (the exponential-race A-ES formulation
    * needs `u^(1/w)`, which is libm-dependent), so the ranking reproduces
    * bit-identically on any engine. */
  def samplePriority(id: Column, weight: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("bigint")
      .cast("double") / greatest(weight, lit(1L)).cast("double")

  /** Stratified sampling at per-stratum rates (data mixing: e.g. keep 50%
    * of English, 10% of a crawl-heavy source). Rates are basis points per
    * stratum value; strata not listed fall back to `defaultBp`. Membership
    * depends only on the id — re-runs, engine changes, and incremental
    * appends never change a document's fate, and upsampling a stratum later
    * (raising its bp) strictly GROWS its kept set (nested samples), the
    * property reservoir/rand sampling cannot give. Stateless narrow filter:
    * no shuffle, no RNG state, pushes down past joins. */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
                       ratesBp: Map[String, Int], defaultBp: Int = 0): DataFrame = {
    require(ratesBp.values.forall(bp => bp >= 0 && bp <= 10000),
      "rates are basis points in [0, 10000]")
    val rate = ratesBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp)) {
      case (acc, (k, bp)) => when(stratum === k, lit(bp)).otherwise(acc)
    }
    df.filter(sampleBasisPoints(id) < rate)
  }

  /** Exact int64 floor division (`a div b` for non-negative operands):
    * `(a - a mod b) / b` divides an exact multiple, so the double division
    * is exact for quotients < 2^53 — a bare `a / b` double division can
    * round UP across an integer boundary when the remainder is b-1. */
  private def exactDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("bigint")

  /** Temperature-weighted mixture rates (α = 0.5 upsampling, the
    * multilingual-training mix): stratum s gets sampling mass
    * q_s = √n_s / Σ√n, flattening the corpus distribution so low-resource
    * strata are upweighted relative to their share — the classic
    * temperature-resampled data mix. `targetBp` is the OVERALL sample size
    * in basis points of the corpus; each stratum's keep-rate is
    * min(1, target·N·q_s / n_s), emitted in basis points.
    *
    * α is fixed at 0.5 deliberately: IEEE sqrt is correctly rounded on
    * every engine, so `weight = floor(√n · 1000)` is bit-identical
    * cross-engine where a pow(n, α) weight could drift in the last ulp.
    * All arithmetic after the weights is int64 (rounding is the explicit
    * half-up `(2a+b) div 2b`), making the rates engine-exact; weights and
    * totals stay far inside int64 for corpora up to ~10^12 rows. */
  def temperatureRates(df: DataFrame, stratumCol: String, targetBp: Int): DataFrame = {
    require(targetBp >= 0 && targetBp <= 10000, "targetBp in [0, 10000]")
    val counts = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_total"))
      .withColumn("weight",
        floor(sqrt(col("n_total").cast("double")) * 1000.0).cast("bigint"))
    val tot = counts.agg(sum(col("weight")).as("w_tot"), sum(col("n_total")).as("n_tot"))
    val numer = lit(targetBp.toLong) * col("n_tot") * col("weight")
    val denom = col("w_tot") * col("n_total")
    counts.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_total"), col("weight"),
        least(lit(10000L),
          exactDiv(lit(2L) * numer + denom, lit(2L) * denom)).as("rate_bp"))
  }

  /** Apply [[temperatureRates]]: keep each row iff its id's deterministic
    * basis points ([[sampleBasisPoints]]) fall under its stratum's rate.
    * Same nested-sample property as [[stratifiedSample]]: raising
    * `targetBp` strictly grows the kept set per stratum. The rates frame is
    * tiny (one row per stratum) and broadcast; the corpus never shuffles. */
  def temperatureMix(df: DataFrame, stratumCol: String, idCol: String,
                     targetBp: Int): DataFrame = {
    val rates = temperatureRates(df, stratumCol, targetBp)
      .select(col("stratum").as("__stratum"), col("rate_bp").as("__rate_bp"))
    df.join(broadcast(rates), col(stratumCol) === col("__stratum"))
      .filter(sampleBasisPoints(col(idCol)) < col("__rate_bp"))
      .drop("__stratum", "__rate_bp")
  }

  /** Shard interleaving: deal rows into `nShards` shards in
    * [[permuteHash]]-permuted order, with the position of each row inside
    * its shard. Downstream training readers consume shards independently —
    * each shard is a deterministic pseudo-random sample of the whole, so
    * any prefix of any shard is an unbiased mix (no curriculum accidents
    * from source/time locality in ingest order). */
  def interleaveShards(df: DataFrame, id: Column, nShards: Int): DataFrame = {
    val h = permuteHash(id)
    val w = Window.partitionBy(col("shard")).orderBy(col("h").asc, id.asc)
    df.withColumn("h", h)
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("h")
  }
}
