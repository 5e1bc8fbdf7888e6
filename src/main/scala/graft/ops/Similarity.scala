package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (SURVEY.md §2.7 X3).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k via a broadcast nested-loop of
  *     the (small) query set against the corpus — the correctness baseline.
  *     The corpus side streams; per-row work is a codegen'd fold. At 100 TB
  *     the corpus scan is embarrassingly parallel and shuffle-free until the
  *     final per-query top-k (a tiny shuffle of k×|queries| rows).
  *   - [[lshTopK]]: random-hyperplane LSH — hash every vector to a
  *     `nBits`-bit signature, bucket-join query/corpus on the signature
  *     prefix, re-rank candidates exactly. Trades recall for avoiding the
  *     full corpus scan per query; the scale path when |queries| is large.
  *
  * Hyperplanes are generated with a deterministic splitmix64-style integer
  * mix (seeded), so results are reproducible without Math.random.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector.
    * Ties on rounded similarity break by neighbor id, making results
    * deterministic cross-engine. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     roundTo: Int = 3): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_emb"), col("c_emb")), roundTo).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random double in [-1,1) from (seed, i, j) —
    * splitmix64 finalizer over a combined index. */
  private def mix(seed: Long, i: Int, j: Int): Double = {
    var z = seed + 0x9E3779B97F4A7C15L * (i.toLong * 1000003L + j + 1)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** `nBits` random hyperplanes for dimension `dim` as literal columns. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Seq[Column] =
    (0 until nBits).map { b =>
      array((0 until dim).map(d => lit(mix(seed, b, d))): _*)
    }

  /** Pack the sign pattern of `nBits` hyperplane projections into one long. */
  def lshSignature(emb: Column, planes: Seq[Column]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(emb, p) >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate top-k: candidates share an LSH bucket (same signature) with
    * the query, then exact cosine re-rank within the bucket. Multi-probe: we
    * also join buckets at Hamming distance 1 by flipping each bit, bounding
    * recall loss. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
              nBits: Int = 8, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, nBits, seed)
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      lshSignature(col("embedding"), planes).as("bucket"))
    // query probes: own bucket + each 1-bit flip
    val qSig = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      lshSignature(col("embedding"), planes).as("sig"))
    val probes = qSig.select(col("query_id"), col("q_emb"),
      explode(array(col("sig") +: (0 until nBits).map(b =>
        col("sig").bitwiseXOR(shiftleft(lit(1L), b))): _*)).as("bucket"))
    val scored = broadcast(probes).join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_emb"), col("c_emb")), 3).as("sim"))
      .dropDuplicates(Seq("query_id", "neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
