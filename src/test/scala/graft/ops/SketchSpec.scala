package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch semantics ([[Sketch]]): the one-sided error guarantee,
  * collision-free exactness, the degenerate all-collide bound, and the
  * corpus entry's emitted evidence. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("collision-free width recovers exact counts; absent keys estimate 0") {
    val keys = Seq("a", "b", "a", "c", "a", "b").toDF("k")
    val counters = Sketch.cmsCounters(keys, "k", depth = 4, width = 1 << 20)
    val probes = Seq("a", "b", "c", "zz").toDF("k")
    val est = Sketch.cmsEstimate(counters, probes, "k", depth = 4, width = 1 << 20)
      .as[(String, Long)].collect().toMap
    assert(est === Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "zz" -> 0L))
  }

  test("width 1 degenerates to the stream length — the upper bound of the " +
    "one-sided error") {
    val keys = Seq("a", "b", "a", "c", "a", "b").toDF("k")
    val counters = Sketch.cmsCounters(keys, "k", depth = 4, width = 1)
    val est = Sketch.cmsEstimate(counters, Seq("a", "zz").toDF("k"), "k",
        depth = 4, width = 1)
      .as[(String, Long)].collect().toMap
    assert(est === Map("a" -> 6L, "zz" -> 6L))
  }

  test("est >= exact on every corpus probe (CMS never undercounts) and the " +
    "counter table is depth x width bounded") {
    val rows = graft.queries.LlmOps.queries("x4_cms_shingles")(
        spark, "/root/testdata/sf0.001")
      .select($"exact_cnt", $"est_cnt", $"overcount")
      .as[(Long, Long, Long)].collect()
    assert(rows.length === 20)
    rows.foreach { case (exact, est, over) =>
      assert(est >= exact && over === est - exact)
    }
    val keys = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(TextOps.shinglesAll(split($"text", " "), 3)).as("k"))
    val nCells = Sketch.cmsCounters(keys, "k", depth = 4, width = 64).count()
    assert(nCells <= 4L * 64L)
  }
}
