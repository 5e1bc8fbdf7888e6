package graft.ops

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property tests for the multimodal stub-codec pair: the certified-integer
  * feature fold must equal a driver-side reference on arbitrary payloads
  * (unicode multi-byte included — the fold is over UTF-8 BYTES, not chars),
  * conserve total byte mass across lanes, and stride exactly like the float
  * twin. These are the invariants the x5_media_features_int oracle certifies
  * cross-engine on the ASCII corpus; the property extends them to payloads
  * the corpus doesn't contain. */
object MultimodalProps extends Properties("Multimodal") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private val genPayload: Gen[Array[Byte]] = Gen.oneOf(
    Gen.const(Array.empty[Byte]),
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
    // utf-8 of arbitrary strings, multi-byte chars included
    Gen.listOf(Gen.oneOf('a', 'Z', '0', ' ', 'é', '中', '�'))
      .map(_.mkString.getBytes("UTF-8")))

  private def ref(payload: Array[Byte], dim: Int): Seq[Long] = {
    val out = new Array[Long](dim)
    payload.zipWithIndex.foreach { case (b, i) => out(i % dim) += (b & 0xFF).toLong }
    out.toSeq
  }

  property("int fold == reference, conserves byte mass, lanes non-negative") =
    forAll(genPayload, Gen.oneOf(1, 4, 16)) { (payload, dim) =>
      val got = Multimodal.StubCodec.extractFeaturesInt(payload, dim).toSeq
      val expect = ref(payload, dim)
      got == expect &&
        got.sum == payload.map(b => (b & 0xFF).toLong).sum &&
        got.forall(_ >= 0L) && got.size == dim
    }

  property("int and float folds stride identically: zero lanes coincide") =
    forAll(genPayload) { payload =>
      val li = Multimodal.StubCodec.extractFeaturesInt(payload, 8)
      val lf = Multimodal.StubCodec.extractFeatures(payload, 8)
      li.map(_ == 0L).toSeq == lf.map(_ == 0.0f).toSeq
    }

  property("null payload yields all-zero lanes on both folds") = {
    val li = Multimodal.StubCodec.extractFeaturesInt(null, 6)
    val lf = Multimodal.StubCodec.extractFeatures(null, 6)
    li.forall(_ == 0L) && lf.forall(_ == 0.0f)
  }
}
