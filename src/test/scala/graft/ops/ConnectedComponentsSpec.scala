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

  private def clusterStar(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponentsStar(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("star variant: pathological 60-node chain converges in O(log n) rounds") {
    // diameter 59 — hash-min would need 59 rounds (and now throws at its
    // default 20); large-star/small-star collapses it within the default 50
    val chain = (0L until 59L).map(i => (i, i + 1))
    val out = clusterStar(chain)
    assert(out.size === 60)
    assert(out.values.toSet === Set(0L))
  }

  test("star variant matches hash-min on shallow graphs, incl. isolation + empty") {
    val pairs = Seq((10L, 20L), (30L, 40L), (40L, 50L), (2L, 1L))
    assert(clusterStar(pairs) === cluster(pairs))
    assert(clusterStar(Nil).isEmpty)
  }

  test("hash-min throws instead of shipping unconverged labels") {
    val chain = (0L until 30L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain.toDF("id_a", "id_b"), maxIters = 5).collect()
    }
  }
}
