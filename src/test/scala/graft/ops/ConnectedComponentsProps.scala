package graft.ops

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test (SURVEY.md §5.2): distributed min-label propagation equals
  * a driver-side union-find on arbitrary random pair graphs — cycles,
  * self-shaped chains, dense blobs, disconnected islands. */
object ConnectedComponentsProps extends Properties("ConnectedComponents") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10) // each trial runs several Spark rounds

  private lazy val spark = graft.SparkSpec.session

  private val genPair: Gen[(Long, Long)] = for {
    a <- Gen.choose(1L, 12L)
    b <- Gen.choose(1L, 12L) if a != b
  } yield (math.min(a, b), math.max(a, b))

  /** Union-find with path compression; component label = min member id. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  property("connectedComponents == union-find") =
    forAll(Gen.listOfN(14, genPair)) { pairs =>
      import spark.implicits._
      val got = Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      got == unionFind(pairs)
    }

  property("connectedComponentsStar == union-find") =
    forAll(Gen.listOfN(14, genPair)) { pairs =>
      import spark.implicits._
      val got = Dedup.connectedComponentsStar(pairs.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      got == unionFind(pairs)
    }
}
