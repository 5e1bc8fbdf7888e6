package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Int8 quantization: code range, error bound ≤ scale/2, zero-vector
  * safety, exact reconstruction of extremes. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("codes in [-127,127]; max error ≤ scale/2; extreme maps to ±127") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(3.0f, 1.5f, -3.0f, 2.9f)),
    ).toDF("id", "emb")
      .withColumn("scale", Quantize.int8Scale($"emb"))
      .withColumn("q", Quantize.int8($"emb", $"scale"))
    val rows = df.select($"id", $"scale",
        array_min($"q"), array_max($"q"),
        Quantize.maxAbsError($"emb", $"q", $"scale"))
      .as[(Long, Double, Int, Int, Double)].collect().map(r => r._1 -> r).toMap
    rows.values.foreach { case (_, scale, qmin, qmax, err) =>
      assert(qmin >= -127 && qmax <= 127)
      assert(err <= scale / 2 + 1e-12)
    }
    assert(rows(1L)._3 === -127) // -1.0 is the max-abs element
    assert(rows(2L)._4 === 127)
  }

  test("zero vector quantizes to zeros, no NaN") {
    val r = Seq((1L, Array(0.0f, 0.0f))).toDF("id", "emb")
      .withColumn("scale", Quantize.int8Scale($"emb"))
      .select(Quantize.int8($"emb", $"scale"), $"scale")
      .as[(Seq[Int], Double)].head()
    assert(r._1 === Seq(0, 0))
    assert(!r._2.isNaN && r._2 > 0)
  }

  test("dequantize reproduces original within the error bound") {
    val r = Seq((1L, Array(0.11f, -0.37f, 0.92f))).toDF("id", "emb")
      .withColumn("scale", Quantize.int8Scale($"emb"))
      .withColumn("dq", Quantize.dequantize(Quantize.int8($"emb", $"scale"), $"scale"))
      .select(zip_with($"emb", $"dq", (a, b) => abs(a - b)), $"scale")
      .as[(Seq[Double], Double)].head()
    r._1.foreach(e => assert(e <= r._2 / 2 + 1e-12))
  }

  test("int4 block: codes in [-7,7], extremes hit ±7, zero block all-zero, " +
    "block isolation, and recon error ≤ ceil-half-step per element") {
    val dim = 8; val bs = 4
    // block 0: an outlier 1000 with small companions (resolution loss
    // confined here); block 1: symmetric ±70 extremes; third vector: one
    // all-zero block next to a live one
    val mvs = Seq(
      (1L, Seq(1000L, 3L, -71L, 500L, 70L, -70L, 10L, 0L)),
      (2L, Seq(0L, 0L, 0L, 0L, 14L, -14L, 7L, -7L)))
      .toDF("vec_id", "mv")
      .withColumn("amax", Quantize.int4BlockAbsMax($"mv", dim, bs))
      .withColumn("q", Quantize.int4BlockCodes($"mv", $"amax", dim, bs))
      .withColumn("rv", Quantize.int4BlockRecon($"q", $"amax", dim, bs))
    val rows = mvs.select($"vec_id", $"amax", $"q", $"rv", $"mv")
      .as[(Long, Seq[Long], Seq[Long], Seq[Long], Seq[Long])]
      .collect().map(r => r._1 -> r).toMap
    val (_, amax1, q1, rv1, mv1) = rows(1L)
    assert(amax1 === Seq(1000L, 70L))
    assert(q1.forall(c => c >= -7L && c <= 7L))
    assert(q1(0) === 7L && q1(4) === 7L && q1(5) === -7L) // absmax extremes
    // block isolation: block 1's ±70 still resolves to full ±7 despite
    // block 0's 1000-outlier (a per-VECTOR absmax would crush it to ±0.49)
    assert(q1(6) === 1L) // 10/70*7 = 1.0
    // per-element recon error ≤ half a step (+1 for the integer recon round)
    mv1.indices.foreach { i =>
      val a = amax1(i / bs)
      assert(math.abs(mv1(i) - rv1(i)) <= a / 14 + 1,
        s"elem $i: |${mv1(i)} - ${rv1(i)}| > ${a / 14 + 1}")
    }
    val (_, amax2, q2, rv2, _) = rows(2L)
    assert(amax2 === Seq(0L, 14L))
    assert(q2.take(4) === Seq(0L, 0L, 0L, 0L) && rv2.take(4) === Seq(0L, 0L, 0L, 0L))
    // exact representable points reconstruct exactly (14 = amax -> c=7 -> 14)
    assert(q2(4) === 7L && rv2(4) === 14L)
    assert(q2(7) === -3L || q2(7) === -4L) // -7/14*7 = -3.5 rounds half-UP to -3
    assert(q2(7) === -3L)
  }
}
