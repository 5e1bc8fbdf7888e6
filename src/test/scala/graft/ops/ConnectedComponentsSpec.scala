package graft.ops

import graft.SparkSpec

/** Connected-components clustering (X9): transitive closure over chains,
  * component isolation, canonical-keeper convention, empty input. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cluster(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("chain collapses transitively to the min id (multi-round convergence)") {
    // 1-2-3-4-5 needs label propagation across 4 hops, not just one join
    assert(cluster(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components stay isolated; keeper row has id == cluster_id") {
    val out = cluster(Seq((10L, 20L), (30L, 40L), (40L, 50L)))
    assert(out === Map(10L -> 10L, 20L -> 10L, 30L -> 30L, 40L -> 30L, 50L -> 30L))
    val keepers = out.collect { case (id, c) if id == c => id }.toSet
    assert(keepers === Set(10L, 30L))
  }

  test("empty pair set yields an empty frame") {
    assert(cluster(Nil).isEmpty)
  }
}
