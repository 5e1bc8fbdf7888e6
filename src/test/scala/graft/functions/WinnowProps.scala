package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the codegen winnowing selection: [[WinnowSelect]]'s
  * one-pass byte-offset implementation must equal a BY-DEFINITION reference
  * (hash every k-gram via string ops, enumerate every full window, mark
  * every position achieving its window's minimum) for arbitrary strings —
  * including a deliberately TINY alphabet so identical grams recur inside
  * one window and the tie-inclusive path is actually exercised, and
  * multi-byte characters so char positions diverge from byte offsets.
  * Driver-side (the static helper, no Spark jobs), so trials are cheap. */
object WinnowProps extends Properties("WinnowSelect") {

  private def md5Prefix15(gram: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xff}%02x").mkString.take(15)

  /** The definition, executed literally (BMP-only alphabet, so java chars
    * == code points == UTF8String chars). */
  private def reference(s: String, k: Int, w: Int): Seq[(Int, String)] = {
    val n = s.length - (k - 1)
    if (s.length < k + w - 1) return Seq.empty
    val h = (0 until n).map(i => md5Prefix15(s.substring(i, i + k)))
    val sel = Array.fill(n)(false)
    for (st <- 0 to n - w) {
      val m = (st until st + w).map(h).min
      for (i <- st until st + w) if (h(i) == m) sel(i) = true
    }
    (0 until n).collect { case i if sel(i) => (i + 1, h(i)) }
  }

  private def actual(s: String, k: Int, w: Int): Seq[(Int, String)] = {
    val arr = WinnowSelect.select(UTF8String.fromString(s), k, w)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2).asInstanceOf[InternalRow]
      (r.getInt(0), r.getUTF8String(1).toString)
    }
  }

  // tiny alphabet -> identical grams recur within windows (tie path);
  // multi-byte chars -> byte offsets != char positions
  private val genStr: Gen[String] = for {
    len <- Gen.choose(0, 60)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', ' ', 'é', '日'))
  } yield cs.mkString

  property("one-pass byte-offset selection equals the definition") =
    forAll(genStr, Gen.choose(2, 5), Gen.choose(2, 5)) { (s, k, w) =>
      actual(s, k, w) == reference(s, k, w)
    }

  property("selection density: every full window is represented (gap <= w)") =
    forAll(genStr, Gen.choose(2, 4), Gen.choose(2, 4)) { (s, k, w) =>
      val pos = actual(s, k, w).map(_._1)
      val nGrams = s.length - (k - 1)
      if (s.length < k + w - 1) pos.isEmpty
      else pos.nonEmpty && pos.head <= w &&
        pos.last >= nGrams - w + 1 &&
        pos.sliding(2).forall {
          case Seq(a, b) => b - a <= w
          case _ => true
        }
    }
}
