package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._
  import DataQuality._

  test("auditTable: one scan, every rule counted, violations exact") {
    val df = Seq((1L, 10, "ok"), (2L, -5, "ok"), (3L, 200, ""), (4L, 7, null))
      .toDF("id", "qty", "tag")
    val got = auditTable(df, Seq(
        Rule("qty_range", $"qty" < 0 || $"qty" > 100),
        Rule("tag_missing", $"tag".isNull || $"tag" === "")))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("qty_range") === ((4L, 2L)))    // -5 and 200
    assert(got("tag_missing") === ((4L, 2L)))  // "" and null
  }

  test("fkOrphans: children without parents, keys-only join") {
    val child = Seq(1L, 1L, 2L, 9L, 9L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = fkOrphans("fk_check", child, "fk", parent, "pk")
      .as[(String, Long, Long)].collect().head
    assert(got === (("fk_check", 6L, 3L))) // the three fk=9 rows
  }

  test("pkUnique: duplicate surplus counted") {
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val got = pkUnique("pk_check", df, "k")
      .as[(String, Long, Long)].collect().head
    assert(got === (("pk_check", 6L, 3L))) // 6 rows, 3 distinct
  }

  test("report: fragments union into the uniform schema") {
    val a = pkUnique("a", Seq(1L).toDF("k"), "k")
    val b = fkOrphans("b", Seq(1L).toDF("fk"), "fk", Seq(2L).toDF("pk"), "pk")
    val got = report(a, b).orderBy("check_name")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 1L, 0L), ("b", 1L, 1L)))
  }
}
