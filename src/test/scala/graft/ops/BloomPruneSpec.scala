package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-pruned joins: no false negatives ever, effective pruning, exact
  * parity with the plain semi join. */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  // spark.range, not a Seq: a LocalRelation would eagerly evaluate the
  // bloom probe at optimization time and hide it from the plan assertion
  lazy val big = spark.range(1, 10001)
    .select($"id".as("k"), concat(lit("p"), $"id").as("payload"))
  lazy val small = Seq(3L, 7L, 4242L, 9999L).toDF("sk")

  test("pre-filter keeps every true match and prunes most non-matches") {
    val pruned = BloomPrune.preFilter(big, small, "k", "sk", expectedItems = 100L)
    val keys = pruned.select($"k").as[Long].collect().toSet
    assert(Set(3L, 7L, 4242L, 9999L).subsetOf(keys), "a bloom filter must never drop a match")
    assert(keys.size < 200, s"pruning ineffective: ${keys.size} of 10000 rows survived")
  }

  test("bloom semi join == plain semi join, and the plan carries might_contain") {
    val viaBloom = BloomPrune.semiJoin(big, small, "k", "sk", expectedItems = 100L)
    val plain = big.join(small, big("k") === small("sk"), "left_semi")
    assert(viaBloom.select($"k").as[Long].collect().sorted.toSeq ===
      plain.select($"k").as[Long].collect().sorted.toSeq)
    val plan = viaBloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected bloom probe in plan:\n$plan")
  }
}
