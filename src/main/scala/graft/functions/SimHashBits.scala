package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst SimHash over a word array (SURVEY.md §2.8, the
  * [[WinnowSelect]] lesson applied to the other per-document-local sketch):
  * hash every word, vote ±1 per bit, assemble the signature — all in ONE
  * per-row pass, so the word rows never exist and the per-doc vote
  * aggregation's shuffle disappears (the previous shape exploded ~55 words
  * × |docs| narrow rows through a 64-column partial/final hash aggregate).
  *
  * Two hash families, value-identical to the Column formulations they
  * replace (equality property-pinned in DedupSpec on the corpus):
  *   - `md5 = false`: `XXH64.hashUTF8String(w, 42)` — bit-for-bit the
  *     engine's `xxhash64(w)` (same static, same seed), 64 bits;
  *   - `md5 = true`: the first 15 hex chars of `md5(w)` read as a 60-bit
  *     integer — bit-for-bit `conv(substring(md5(w),1,15),16,10)`, the
  *     portable family whose whole signature pipeline the DuckDB oracle
  *     replays in SQL ([[graft.ops.Dedup.simhashFramePortable]]).
  *
  * Vote semantics unchanged: duplicates counted, a tie (vote sum 0) leaves
  * the bit unset. Null array ELEMENTS (reachable through the SQL-registered
  * `simhash64`/`simhash60_md5` on user-built arrays, not from split()
  * output) are skipped — they contribute no votes, exactly as a null
  * `xxhash64(w)`/`md5(w)` drops out of the aggregate twin's vote sums.
  * Codegen emits a direct static call, keeping the projection inside
  * whole-stage codegen. */
case class SimHashBits(child: Expression, nBits: Int, md5: Boolean)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 64, "need 1 <= nBits <= 64")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(input: Any): Any =
    SimHashBits.signature(input.asInstanceOf[ArrayData], nBits, md5)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashBits.signature($c, $nBits, $md5)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashBits {
  /** One-pass signature; static so generated code and eval share the same
    * JIT-compiled body. */
  def signature(words: ArrayData, nBits: Int, md5: Boolean): Long = {
    val votes = new Array[Int](nBits)
    val digest =
      if (md5) java.security.MessageDigest.getInstance("MD5") else null
    val n = words.numElements()
    var i = 0
    while (i < n) {
      // null elements contribute no votes (see the class doc)
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        val h =
          if (md5) {
            digest.reset()
            val d = digest.digest(w.getBytes)
            // first 15 hex chars == the top 60 bits of the first 8 bytes
            // (16 hex chars) shifted right by one nibble — bit-for-bit
            // conv(substring(md5(w), 1, 15), 16, 10)
            var v = 0L
            var j = 0
            while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
            v >>> 4
          } else XXH64.hashUTF8String(w, 42L)
        var b = 0
        while (b < nBits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < nBits) {
      if (votes(b) > 0) sh |= 1L << b
      b += 1
    }
    sh
  }
}
