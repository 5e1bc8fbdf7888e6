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
}
