package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Loud int64-headroom guards for the exact-integer ppm algebra.
  *
  * Past 2⁶³−1 a long product either dies as an unattributable
  * `ARITHMETIC_OVERFLOW` mid-job (ANSI mode — this engine's session
  * default) or WRAPS silently into plausible-looking garbage (non-ANSI
  * deployments; DuckDB oracles never wrap, so the wrap surfaces as a
  * baffling hash mismatch at exactly the scale where it is hardest to
  * debug). Every ppm site therefore either proves its headroom statically
  * or guards it dynamically with `raise_error` naming the OPERATOR and the
  * remediation — the [[graft.ops.Dedup.tfCosinePairs]] rule (round-8
  * ADVICE #1) applied to the shared `count · 10⁶ DIV total` shape
  * (round-8 verdict #7).
  */
object IntGuards {

  /** Largest n whose n·10⁶ stays inside int64: ⌊(2⁶³−1) / 10⁶⌋. */
  val MaxPpmNumerator: Long = Long.MaxValue / 1000000L

  /** `n · 10⁶ DIV total` with a throw at the wrap boundary. `site` names
    * the operator in the error so a pipeline failure is attributable. */
  def ppmShare(n: Column, total: Column, site: String): Column =
    when(n > MaxPpmNumerator,
      raise_error(concat(
        lit(s"$site: count "), n.cast("string"),
        lit(s" exceeds the int64 ppm headroom ($MaxPpmNumerator); " +
          "pre-aggregate to coarser slices or widen to DECIMAL"))).cast("long"))
      .otherwise(call_function("div", n * lit(1000000L), total))
}
