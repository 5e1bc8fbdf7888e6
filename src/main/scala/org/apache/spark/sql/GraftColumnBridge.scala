package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters, so graft
  * can plan custom Catalyst expressions (e.g.
  * [[graft.functions.VectorDotProduct]]) through the public DataFrame API.
  * The standard technique for Catalyst-extending libraries: one tiny object
  * compiled into the `org.apache.spark.sql` package; no Spark internals are
  * modified or copied.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register an expression builder as a temp SQL function on a live session
    * (the post-hoc counterpart of [[graft.GraftExtensions]], which wires the
    * same functions at session build time). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
