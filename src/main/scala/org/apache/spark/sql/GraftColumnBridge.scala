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

  /** Wrap an analyzed logical plan as a DataFrame — the bridge an optimizer
    * rule needs to BUILD its replacement subtree with the DataFrame API
    * (see [[graft.plans.CosineTopKRewrite]]) instead of hand-assembling
    * catalyst nodes. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (for splicing a DataFrame-built
    * tree back into a plan under rewrite). */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** The optimized logical plan — what a mid-optimization rewrite must
    * splice (the analyzed form still carries ResolvedHint nodes, which the
    * already-finished hint batch would never clean up). */
  def optimized(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.optimizedPlan

  /** Register an expression builder as a temp SQL function on a live session
    * (the post-hoc counterpart of [[graft.GraftExtensions]], which wires the
    * same functions at session build time). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
