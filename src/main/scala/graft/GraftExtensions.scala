package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}
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
  /** Same catalyst shapes `VectorFunctions.cosine`/`l2Norm` lower to from
    * the Column API: dot/(sqrt(dot)·sqrt(dot)) and sqrt(dot) — so SQL and
    * DataFrame routes plan identical (codegen'd) trees. */
  private def norm(a: Expression): Expression = Sqrt(VectorDotProduct(a, a))

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDotProduct].getName, "vector_dot"),
      (children: Seq[Expression]) => VectorDotProduct(children(0), children(1))),
    (FunctionIdentifier("vector_cosine"),
      new ExpressionInfo(classOf[VectorDotProduct].getName, "vector_cosine"),
      (children: Seq[Expression]) => Divide(VectorDotProduct(children(0), children(1)),
        Multiply(norm(children(0)), norm(children(1))))),
    (FunctionIdentifier("vector_norm"),
      new ExpressionInfo(classOf[VectorDotProduct].getName, "vector_norm"),
      (children: Seq[Expression]) => norm(children(0))))

  /** Register the same functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      GraftColumnBridge.registerFunction(spark, ident.funcName, builder)
    }
}
