package graft.ops

import java.sql.Timestamp
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test (SURVEY.md §5.2): the bucketized interval join equals the
  * naive all-pairs containment scan for arbitrary keys, interval widths
  * (incl. sub-bucket and many-bucket spans), and boundary timestamps —
  * the half-open `start <= ts < end` edges land exactly on bucket borders
  * often enough here to catch any off-by-one in the bucket arithmetic. */
object RangeJoinProps extends Properties("RangeJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15) // each trial runs Spark jobs; keep it tight

  private lazy val spark = graft.SparkSpec.session

  private val bucketSec = 60L

  case class R(k: Int, ts: Long, id: Long)
  case class Iv(k: Int, start: Long, end: Long, ivId: Long)

  // seconds chosen so many values hit exact bucket boundaries (multiples of 60)
  private val genSec: Gen[Long] = Gen.frequency(
    3 -> Gen.choose(0L, 10L).map(_ * 60L),
    5 -> Gen.choose(0L, 600L))

  private val genRow: Gen[R] = for {
    k <- Gen.choose(1, 3); ts <- genSec
  } yield R(k, ts, 0L)

  private val genIv: Gen[Iv] = for {
    k <- Gen.choose(1, 3); a <- genSec; w <- Gen.choose(1L, 240L)
  } yield Iv(k, a, a + w, 0L)

  private def naive(rs: Seq[R], ivs: Seq[Iv]): Set[(Long, Long)] =
    (for {
      r <- rs; iv <- ivs
      if r.k == iv.k && r.ts >= iv.start && r.ts < iv.end
    } yield (r.id, iv.ivId)).toSet

  property("intervalJoin == all-pairs containment scan") =
    forAll(Gen.listOfN(20, genRow), Gen.listOfN(10, genIv)) { (rs0, ivs0) =>
      import spark.implicits._
      val rs = rs0.zipWithIndex.map { case (r, i) => r.copy(id = i.toLong) }
      val ivs = ivs0.zipWithIndex.map { case (v, i) => v.copy(ivId = i.toLong) }
      val rows = rs.map(r => (r.k, new Timestamp(r.ts * 1000), r.id))
        .toDF("k", "ts", "id")
      val intervals = ivs.map(v =>
          (v.k, new Timestamp(v.start * 1000), new Timestamp(v.end * 1000), v.ivId))
        .toDF("k", "start", "end", "iv_id")
      val got = RangeJoin.intervalJoin(rows, intervals, Seq("k"),
          "ts", "start", "end", bucketSec)
        .select($"id", $"iv_id").as[(Long, Long)].collect().toSet
      got == naive(rs, ivs)
    }
}
