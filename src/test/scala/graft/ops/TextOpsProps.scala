package graft.ops

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: the codegen'd higher-order-function entropy fold equals a
  * driver-side reference on arbitrary word arrays — empty strings, unicode
  * (BMP), heavy repetition, singletons. Tolerance-based (not exact-rounded):
  * cross-engine bit-determinism is the DuckDB oracle's job (x4_entropy);
  * this property guards the count/probability/log STRUCTURE. */
object TextOpsProps extends Properties("TextOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = graft.SparkSpec.session

  private val genWord: Gen[String] =
    Gen.oneOf("a", "b", "c", "word", "αβγ", "", "Zz9", "a")

  private def refEntropy(words: Seq[String]): Double = {
    val n = words.size.toDouble
    words.distinct.sorted.map { w =>
      val p = words.count(_ == w) / n
      -p * (math.log(p) / math.log(2.0))
    }.sum
  }

  property("wordEntropyArr == reference within rounding tolerance; bounded by log2(d)") =
    forAll(Gen.nonEmptyListOf(genWord).map(_.take(30))) { words =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val got = Seq(Tuple1(words)).toDF("words")
        .select(TextOps.wordEntropyArr(col("words"))).as[Double].head()
      val want = refEntropy(words)
      val maxH = math.log(words.distinct.size.toDouble) / math.log(2.0)
      math.abs(got - want) <= 6e-5 && got >= 0.0 && got <= maxH + 6e-5
    }
}
