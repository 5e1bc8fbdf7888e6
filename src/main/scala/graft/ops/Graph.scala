package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as bounded rounds of co-partitioned joins —
  * the Pregel-style "think like a vertex" pattern expressed relationally
  * (SURVEY.md §2.7 graph family; connected components lives in
  * [[Dedup.connectedComponents]] next to its dup-cluster use case).
  *
  * Scale posture (100 TB): every round is ONE join of the rank frame
  * against the edge frame on the same key (AQE co-partitions the repeated
  * shuffle), a map-side-combinable sum, and a left join back to the node
  * set; per-round state is 16 bytes/node. No adjacency lists are ever
  * collected, no driver-side graph exists, and lineage is cut per round so
  * the plan stays O(1) deep regardless of iteration count.
  */
object Graph {

  /** PageRank in EXACT integer parts-per-million — every engine-dependent
    * float fold is eliminated, so an iteration count fixed up front yields
    * bit-identical ranks on any engine that can floor-divide (the property
    * the cross-engine oracle certifies).
    *
    * Semantics per round, all in bigint ppm (initial rank 1 000 000):
    *   rank'(v) = (10⁶ − damping) + damping · Σ_{u→v} (rank(u) div outdeg(u)) div 10⁶
    * Dangling mass (nodes with no out-edges) evaporates rather than
    * redistributing — documented, deterministic, and the common choice when
    * the damping term already guarantees convergence.
    *
    * @param nodes single-column frame of vertex ids (column `node`)
    * @param edges two-column frame (`src`, `dst`); parallel edges should be
    *              de-duplicated upstream if unweighted semantics are wanted
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 5,
               dampingPpm: Long = 850000L): DataFrame = {
    val basePpm = 1000000L - dampingPpm
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // edge+degree frame is loop-invariant: materialize once, reuse per round
    val withDeg = edges.join(deg, "src").localCheckpoint(false)
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank_ppm"))
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(withDeg, ranks("node") === withDeg("src"))
        .select(col("dst").as("node"), expr("rank_ppm DIV outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(basePpm) +
            expr(s"($dampingPpm * coalesce(s, 0L)) DIV 1000000")).as("rank_ppm"))
        .localCheckpoint(false) // cut lineage: plan depth stays O(1) per round
    }
    ranks
  }
}
