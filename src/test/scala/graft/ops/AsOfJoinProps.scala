package graft.ops

import java.sql.Timestamp
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test (SURVEY.md §5.2): the windowed as-of join equals a naive
  * per-row scan ("for each left row, the latest right row of the same key at
  * or before it") for arbitrary key/timestamp distributions — empty keys,
  * all-tied timestamps, rights after every left, multi-payload carry. */
object AsOfJoinProps extends Properties("AsOfJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15) // each trial runs Spark jobs; keep it tight

  private lazy val spark = graft.SparkSpec.session

  case class L(k: Int, ts: Long, id: Long)
  case class R(k: Int, ts: Long, p: Option[Int])

  private val genLeft: Gen[L] = for {
    k <- Gen.choose(1, 4)
    ts <- Gen.choose(0L, 30L)
  } yield L(k, ts, 0L)

  // ~1/3 null payloads: the latest prior row's null must SURFACE as null,
  // never fall back to an older row's value (row-integrity contract)
  private val genRight: Gen[R] = for {
    k <- Gen.choose(1, 4)
    ts <- Gen.choose(0L, 30L)
    p <- Gen.frequency((1, Gen.const(Option.empty[Int])),
                       (2, Gen.choose(100, 999).map(Option(_))))
  } yield R(k, ts, p)

  /** Contract requires right unique per (key, ts): keep the max payload. */
  private def dedupe(rs: Seq[R]): Seq[R] =
    rs.groupBy(r => (r.k, r.ts)).values
      .map(_.maxBy(_.p.getOrElse(Int.MinValue))).toSeq

  private def naive(ls: Seq[L], rs: Seq[R]): Map[Long, Option[Int]] =
    ls.map { l =>
      val prior = rs.filter(r => r.k == l.k && r.ts <= l.ts)
      l.id -> (if (prior.isEmpty) None else prior.maxBy(_.ts).p)
    }.toMap

  private def viaOperator(ls: Seq[L], rs: Seq[R]): Map[Long, Option[Int]] = {
    import spark.implicits._
    val left = ls.map(l => (l.k, new Timestamp(l.ts * 1000), l.id))
      .toDF("k", "ts", "id")
    val right = rs.map(r => (r.k, new Timestamp(r.ts * 1000), r.p))
      .toDF("k", "rts", "p")
    AsOfJoin.asofJoinPrior(left, right,
        key = Seq("k"), leftTs = "ts", rightTs = "rts", payload = Seq("p"))
      .select($"id", $"asof_p").as[(Long, Option[Int])]
      .collect().toMap
  }

  property("asofJoinPrior == naive latest-prior scan") =
    forAll(Gen.listOfN(25, genLeft), Gen.listOfN(15, genRight)) { (ls0, rs0) =>
      val ls = ls0.zipWithIndex.map { case (l, i) => l.copy(id = i.toLong) }
      val rs = dedupe(rs0)
      viaOperator(ls, rs) == naive(ls, rs)
    }

  property("no right rows at all -> every left row carries null") =
    forAll(Gen.listOfN(10, genLeft)) { ls0 =>
      val ls = ls0.zipWithIndex.map { case (l, i) => l.copy(id = i.toLong) }
      viaOperator(ls, Nil).values.forall(_.isEmpty)
    }
}
