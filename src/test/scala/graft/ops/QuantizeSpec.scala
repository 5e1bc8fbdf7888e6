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
}
