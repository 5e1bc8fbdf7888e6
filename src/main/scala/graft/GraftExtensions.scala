package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorDotProduct

/** Session extension entry point (SURVEY.md §2.8): registers graft's native
  * expressions as SQL functions, so
  * `spark.sql("SELECT vector_dot(a, b) ...")` plans the codegen expression.
  *
  * Wire at session build:
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions     // config, or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  * or post-hoc on a live session with [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDotProduct].getName, "vector_dot"),
      (children: Seq[Expression]) => VectorDotProduct(children(0), children(1))))

  /** Register the same functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      GraftColumnBridge.registerFunction(spark, ident.funcName, builder)
    }
}
