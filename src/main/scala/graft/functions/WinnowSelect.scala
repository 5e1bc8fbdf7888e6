package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst winnowing selection (SURVEY.md §2.8 / the escape hatch
  * documented at `Dedup.scala` since round 14): the ENTIRE MOSS selection —
  * k-gram md5 hashing, the w-wide sliding-window minimum, tie-inclusive
  * position marking — computed in ONE per-document pass over the UTF-8
  * BYTES, returning only the selected `(pos, h)` fingerprints (expected
  * density ≈ 2/(w+1) of the grams).
  *
  * Why an Expression: winnowing is per-document-LOCAL work that the SQL
  * formulation could only express as explode-all-grams + two window passes
  * over a (doc, pos) sort — a doc-keyed SHUFFLE of every gram row, plus an
  * O(len) per-gram `substring` head-rescan (UTF-8 has no random char
  * access). This node walks the byte array once to index char starts, then
  * hashes each gram from its byte offsets directly — O(len·k) hashing plus
  * O(len·w) window marking per doc, no rescan, no gram shuffle; the
  * downstream census aggregation is the only exchange left. Selection semantics are IDENTICAL to the windowed
  * form (equality property-pinned in DedupSpec on the corpus, 100 KB
  * long-doc fixtures, and multi-byte UTF-8): a position is selected iff
  * some full window containing it has `h(pos)` as its minimum, every tied
  * position included; hashes are the md5 15-hex-char prefix, whose
  * lexicographic order is its numeric order, so the selected SET replays
  * exactly in the DuckDB oracle.
  *
  * Codegen: the heavy loop lives in the static [[WinnowSelect.select]]
  * (JIT-compiled once, shared by eval and the generated code);
  * `doGenCode` emits a direct static call, so the surrounding projection
  * stays inside whole-stage codegen — no interpreted fallback.
  *
  * Documents shorter than w + k − 1 chars (no full window) return an
  * empty array, matching the SQL form's length filter. */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 2, "need k >= 2 and w >= 2")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", StringType, nullable = false))), containsNull = false)

  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any =
    WinnowSelect.select(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowSelect.select($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSelect {
  private val hexDigits = "0123456789abcdef".toCharArray

  /** One-pass selection over the UTF-8 bytes; see the class doc. Static so
    * the generated code calls the same JIT-compiled body as eval. */
  def select(str: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = str.getBytes
    val len = bytes.length
    // char-start byte offsets, built in one O(len) walk (offs(i) = byte
    // offset of 1-based char i+1's start; offs(nChars) = len)
    var nChars = 0
    val offs = new Array[Int](len + 1)
    var bi = 0
    while (bi < len) {
      offs(nChars) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      nChars += 1
    }
    offs(nChars) = len
    val nGrams = nChars - (k - 1)
    if (nChars < k + w - 1) return new GenericArrayData(Array.empty[Any])
    // md5 15-hex-char prefix per gram, hashed straight from byte offsets
    // and carried as its 60-bit NUMERIC value (top 60 of the digest's
    // first 64 bits — the 15-hex prefix's lexicographic order IS its
    // numeric order, so long comparison replaces String.compareTo and the
    // hot loop allocates nothing per gram; only the ~2/(w+1) selected
    // survivors get hex-formatted at the end). Same prefix→long
    // conversion as [[SimHashBits.signature]]'s md5 family.
    val md = java.security.MessageDigest.getInstance("MD5")
    val digestBuf = new Array[Byte](16)
    val hashes = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      md.update(bytes, offs(g), offs(g + k) - offs(g))
      md.digest(digestBuf, 0, 16) // fills the buffer and resets the digest
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (digestBuf(j) & 0xffL); j += 1 }
      hashes(g) = v >>> 4
      g += 1
    }
    // tie-inclusive sliding-window minimum: mark every position achieving
    // some full window's min (w is small — O(nGrams·w) marking is cheaper
    // than a deque for w=4 and allocation-free)
    val selected = new Array[Boolean](nGrams)
    var s = 0
    while (s + w <= nGrams) {
      var m = hashes(s)
      var i = s + 1
      while (i < s + w) {
        if (hashes(i) < m) m = hashes(i)
        i += 1
      }
      i = s
      while (i < s + w) {
        if (hashes(i) == m) selected(i) = true
        i += 1
      }
      s += 1
    }
    var n = 0
    var p = 0
    while (p < nGrams) { if (selected(p)) n += 1; p += 1 }
    val out = new Array[Any](n)
    var o = 0
    p = 0
    while (p < nGrams) {
      if (selected(p)) {
        val v = hashes(p)
        val hex = new Array[Char](15)
        var j = 0
        while (j < 15) {
          hex(j) = hexDigits(((v >>> ((14 - j) << 2)) & 0xfL).toInt)
          j += 1
        }
        out(o) = InternalRow(p + 1, UTF8String.fromString(new String(hex)))
        o += 1
      }
      p += 1
    }
    new GenericArrayData(out)
  }
}
