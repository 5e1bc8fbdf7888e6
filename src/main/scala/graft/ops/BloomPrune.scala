package graft.ops

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning — the row-level runtime filter that makes
  * selective fact⋈dim joins cheap at 100 TB: build a bloom filter over the
  * small side's join keys (one tiny aggregate), broadcast the filter bytes,
  * and drop non-matching fact rows AT THE SCAN, before they ever reach the
  * join exchange. The exact join downstream then shuffles only survivors;
  * bloom false positives are removed there, so results are identical to the
  * plain join. This is what Spark's own InjectRuntimeFilter does when its
  * heuristics fire — exposed here as an explicit operator so pipelines can
  * force it (the optimizer's version bails on many plan shapes).
  *
  * Same construction as the engine's other catalyst-level operators: the
  * internal `BloomFilterAggregate` / `BloomFilterMightContain` expressions
  * planned through [[GraftColumnBridge]].
  */
object BloomPrune {

  /** `big` filtered to rows whose `bigKey` MIGHT be in `small.smallKey`
    * (no false negatives). Safe as a pre-filter for INNER and LEFT-SEMI
    * equi-joins only — the shapes used here: dropping probable-non-matching
    * big rows from the preserved side of an outer join would remove rows
    * that must surface with nulls. With an EMPTY small side the aggregate
    * yields a null filter and `might_contain(null, _)` drops every big row —
    * again correct for inner/semi (nothing can match), wrong for outer.
    * `might_contain` requires its filter operand to be a CONSTANT, so the
    * filter bytes come to the driver — bounded metadata, ~1.25 bytes per
    * expected item (the same bytes Spark's InjectRuntimeFilter ships via a
    * reused scalar subquery), then inline as a literal every task reads. */
  def preFilter(big: DataFrame, small: DataFrame,
                bigKey: String, smallKey: String,
                expectedItems: Long = 1000000L): DataFrame = {
    val bloomAgg = GraftColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftColumnBridge.expression(col(smallKey)))),
        Literal(expectedItems))
        .toAggregateExpression())
    val bloomBytes: Array[Byte] =
      small.agg(bloomAgg.as("__bloom")).head().getAs[Array[Byte]](0)
    big.filter(GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      new XxHash64(Seq(GraftColumnBridge.expression(col(bigKey)))))))
  }

  /** Exact left-semi join with the bloom pre-filter in front: identical
    * result to `big.join(small, cond, "left_semi")`, but the semi-join
    * exchange only carries rows that passed the broadcast bloom probe. */
  def semiJoin(big: DataFrame, small: DataFrame,
               bigKey: String, smallKey: String,
               expectedItems: Long = 1000000L): DataFrame = {
    val pruned = preFilter(big, small, bigKey, smallKey, expectedItems)
    pruned.join(small, pruned(bigKey) === small(smallKey), "left_semi")
  }
}
