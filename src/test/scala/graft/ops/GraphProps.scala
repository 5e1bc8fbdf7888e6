package graft.ops

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property tests (SURVEY.md §5.2 pattern): the distributed k-core peel
  * equals a driver-side brute-force peel on arbitrary random pair graphs —
  * cycles, chains, stars, dense blobs, disconnected islands — for several
  * k. The boundary GraphSpec cases pin specific pathologies; these pin the
  * ALGEBRA on shapes nobody thought to write down. */
object GraphProps extends Properties("Graph") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10) // each trial runs several Spark rounds

  private lazy val spark = graft.SparkSpec.session

  private val genPair: Gen[(Long, Long)] = for {
    a <- Gen.choose(1L, 12L)
    b <- Gen.choose(1L, 12L) if a != b
  } yield (math.min(a, b), math.max(a, b))

  /** Driver-side reference peel: drop nodes with in-set degree < k until a
    * fixpoint; returns survivors with their in-core degree. */
  private def bruteKCore(pairs: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val edges = pairs.distinct
    var nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var changed = true
    def degrees(in: Set[Long]): Map[Long, Long] = {
      val d = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (a, b) =>
        if (in(a) && in(b)) { d(a) += 1; d(b) += 1 }
      }
      d.toMap
    }
    while (changed) {
      val d = degrees(nodes)
      val next = nodes.filter(n => d.getOrElse(n, 0L) >= k)
      changed = next != nodes
      nodes = next
    }
    degrees(nodes).filter { case (n, _) => nodes(n) }
  }

  private def props(k: Int) =
    forAll(Gen.listOfN(14, genPair)) { pairs =>
      import spark.implicits._
      val got = Graph.kCore(pairs.distinct.toDF("id_a", "id_b"), k = k,
          uniquePairs = true)
        .as[(Long, Long)].collect().toMap
      got == bruteKCore(pairs, k)
    }

  property("kCore(k=1) == brute-force peel") = props(1)
  property("kCore(k=2) == brute-force peel") = props(2)
  property("kCore(k=3) == brute-force peel") = props(3)
}
