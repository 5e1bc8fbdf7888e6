package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // small directed graph: a 3-cycle feeding a hub, one dangling node (5),
  // one source-only node (6)
  val edgeSeq = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (2L, 4L),
    (3L, 4L), (6L, 4L), (4L, 5L))
  val nodeSeq = (1L to 6L)

  /** The exact integer recurrence, replayed naively on the driver. */
  def replay(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val s = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (u, _) => r(u) / outdeg(u) }.sum
      }
      r = nodes.map(n => n -> (150000L + 850000L * s.getOrElse(n, 0L) / 1000000L)).toMap
    }
    r
  }

  test("pageRank matches the naive integer replay exactly") {
    val got = Graph.pageRank(nodeSeq.toDF("node"), edgeSeq.toDF("src", "dst"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === replay(nodeSeq, edgeSeq, 5))
  }

  test("pageRank: rank follows in-flow; dangling node keeps base-fed rank") {
    val got = Graph.pageRank(nodeSeq.toDF("node"), edgeSeq.toDF("src", "dst"), iters = 5)
      .as[(Long, Long)].collect().toMap
    // the hub (4) outranks the cycle members that each feed it a split vote;
    // node 5 outranks the hub — it receives the hub's UNsplit out-flow
    assert(got(4L) > got(1L) && got(5L) > got(4L))
    assert(got(6L) === 150000L) // nothing points at the pure source
    // floor division + dangling evaporation only ever lose mass
    assert(got.values.sum <= nodeSeq.size * 1000000L)
  }

  test("pageRank is deterministic across runs") {
    def run() = Graph.pageRank(nodeSeq.toDF("node"), edgeSeq.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(run() === run())
  }

  test("triangleCounts: K4 clique + pendant — counts and exact ppm coefficients") {
    // K4 on 1-4 (every node in 3 triangles, cc = 1), node 5 pendant off 4
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)).toDF("id_a", "id_b")
    val got = Graph.triangleCounts(pairs)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((3L, 3L, 1000000L)))
    assert(got(2L) === ((3L, 3L, 1000000L)))
    assert(got(3L) === ((3L, 3L, 1000000L)))
    // 4 gains the pendant edge: d=4, still 3 triangles, 2e6·3 div 12 = 500000
    assert(got(4L) === ((4L, 3L, 500000L)))
    assert(got(5L) === ((1L, 0L, 0L)))
  }

  test("triangleCounts: star hub has zero triangles; duplicate edges collapse") {
    val pairs = Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Graph.triangleCounts(pairs)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(10L) === ((3L, 0L, 0L)))
    assert(got(11L) === ((1L, 0L, 0L)))
    assert(got.size === 4)
  }

  test("triangleCounts: two triangles sharing an edge") {
    // 1-2-3 and 2-3-4: edge 2-3 shared; 2 and 3 sit in both triangles
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("id_a", "id_b")
    val got = Graph.triangleCounts(pairs)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L)._2 === 1L && got(4L)._2 === 1L)
    assert(got(2L) === ((3L, 2L, 666666L))) // 2e6·2 div 6
    assert(got(3L) === ((3L, 2L, 666666L)))
  }

  test("kCore: cycle survives, star and chain peel away, path needs L/2 rounds") {
    // 4-cycle (1-2-3-4), star hub 10 with spokes 11-13, chain 20-21-22-23
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("id_a", "id_b")
    val core = Graph.kCore(pairs, k = 2)
      .as[(Long, Long)].collect().toMap
    // only the cycle is 2-core, every member at degree exactly 2
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    // k=1 keeps everything with an edge, with raw degrees
    val one = Graph.kCore(pairs, k = 1).as[(Long, Long)].collect().toMap
    assert(one.keySet === Set(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 20L, 21L, 22L, 23L))
    assert(one(10L) === 3L && one(21L) === 2L && one(23L) === 1L)
    // pathological path: peeling eats one node per end per round, so a
    // 12-node path needs 6 rounds — maxRounds=3 must THROW, 8 must not
    val path = (20L to 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] { Graph.kCore(path, k = 2, maxRounds = 3) }
    assert(Graph.kCore(path, k = 2, maxRounds = 8).count() === 0L)
    // boundary: a 16-node path peels to empty in exactly 8 shrinking peels —
    // maxRounds=8 must CONVERGE, not throw (the degree-init peel is
    // budget-free; round-9 review regression)
    val path16 = (40L to 54L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    assert(Graph.kCore(path16, k = 2, maxRounds = 8).count() === 0L)
    // empty edges: empty core, no throw
    assert(Graph.kCore(pairs.limit(0), k = 2).count() === 0L)
  }
}
