package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding storage quantization (X3 scale path). At 100 TB the embedding
  * column IS the dataset — symmetric int8 cuts it 4× vs float32 (8× vs
  * float64) at ~0.4% max reconstruction error, which is what makes corpus-
  * wide ANN index rebuilds and shuffle-heavy similarity joins affordable:
  * the exchange carries 1 byte per dimension plus one scale per vector.
  *
  * Determinism: the rounding is `floor(x/scale + 0.5)` — explicit half-up,
  * identical in every engine — never a bankers'-rounding `round()` whose
  * tie behavior differs across engines. All per-element arithmetic is
  * float→double (exact), so quantized codes are bit-reproducible
  * cross-engine.
  */
object Quantize {

  /** Per-vector symmetric scale: max|x| / 127, floored at 1e-12 so
    * zero-vectors quantize to zeros instead of NaNs. */
  def int8Scale(emb: Column): Column =
    greatest(array_max(transform(emb, x => abs(x))), lit(1e-12)) / 127.0

  /** Quantized codes in [-127, 127] as array<int> (tinyint at rest;
    * int here keeps downstream integer aggregates overflow-free). */
  def int8(emb: Column, scale: Column): Column =
    transform(emb, x =>
      least(greatest(floor(x / scale + 0.5), lit(-127.0)), lit(127.0)).cast("int"))

  /** Reconstruction: code × scale, back to double. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, v => v * scale)

  /** Largest per-element |original − reconstructed| — the quantization
    * error bound actually achieved for this vector (≤ scale/2 by
    * construction). Max is order-independent, so it cross-checks exactly
    * where a float sum could drift by association order. */
  def maxAbsError(emb: Column, q: Column, scale: Column): Column =
    array_max(zip_with(emb, q, (x, qi) => abs(x - qi * scale)))

  // ---- int4 BLOCK quantization (the weights/activations staple) --------
  //
  // Per fixed-size block: absmax scale, signed 4-bit codes in [-7, 7],
  // round-half-up — the NF4/absmax-int4 family every LLM serving stack
  // ships, here in EXACT int64 over milli codes so the whole
  // quantize → reconstruct → error chain is engine-reproducible and
  // DuckDB-oracle-checkable (the int8 path's float scale can't be): code
  // = floorDiv(14·m + A, 2A) and reconstruction = floorDiv(2·c·A + 7, 14),
  // both via the pmod floor-division identity (Similarity.floorDiv).
  // Block-local absmax (not per-vector) is the point at 4 bits: one
  // outlier element only poisons its own block's resolution. Storage: 4
  // bits/element + one int scale per block — 8x smaller than float32 at
  // blockSize 16 with the scale amortized.

  /** Blocks must tile the vector exactly — `sequence(0, dim/blockSize-1)`
    * FLOORS, so a non-dividing blockSize would silently drop the tail
    * elements and hand `zip_with` consumers short arrays full of nulls
    * (round-17 ADVICE). Rejecting loudly beats emitting a partial block:
    * a ragged final block changes the storage contract (codes array no
    * longer `dim` long ÷ uniform scale stride) that the oracle replays. */
  private def requireTiling(dim: Int, blockSize: Int): Unit =
    require(blockSize > 0 && dim % blockSize == 0,
      s"int4 block quantization requires blockSize to divide dim exactly " +
        s"(got dim=$dim, blockSize=$blockSize)")

  /** Per-block absmax scales: `dim/blockSize` int64 entries (blockSize must
    * divide dim — enforced), 0 for an all-zero block (its codes quantize to
    * 0 — no division). */
  def int4BlockAbsMax(mv: Column, dim: Int, blockSize: Int): Column = {
    requireTiling(dim, blockSize)
    transform(sequence(lit(0), lit(dim / blockSize - 1)), b =>
      array_max(transform(slice(mv, b * blockSize + 1, lit(blockSize)),
        e => abs(e))))
  }

  /** Signed 4-bit codes, flattened back to `dim` entries: element i of
    * block b is round-half-up(m·7/A_b) ∈ [-7, 7] — exact int64, clamp-free
    * because |m| ≤ A_b bounds the ratio. */
  def int4BlockCodes(mv: Column, amax: Column, dim: Int,
                     blockSize: Int): Column = {
    requireTiling(dim, blockSize)
    flatten(transform(sequence(lit(0), lit(dim / blockSize - 1)), b => {
      val a = element_at(amax, (b + 1).cast("int"))
      transform(slice(mv, b * blockSize + 1, lit(blockSize)), m =>
        when(a === 0L, lit(0L)).otherwise(
          graft.ops.Similarity.floorDiv(m * 14L + a, a * 2L)))
    }))
  }

  /** Integer milli reconstruction of the codes: round-half-up(c·A/7) per
    * element — what a dequantizing scan computes, exact int64. */
  def int4BlockRecon(codes: Column, amax: Column, dim: Int,
                     blockSize: Int): Column = {
    requireTiling(dim, blockSize)
    flatten(transform(sequence(lit(0), lit(dim / blockSize - 1)), b => {
      val a = element_at(amax, (b + 1).cast("int"))
      transform(slice(codes, b * blockSize + 1, lit(blockSize)), c =>
        when(a === 0L, lit(0L)).otherwise(
          graft.ops.Similarity.floorDiv(c * a * 2L + 7L, lit(14L))))
    }))
  }
}
