package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}
import graft.functions.{VectorDotProduct, VectorL2Squared}

/** Session extension entry point (SURVEY.md §2.8): registers graft's native
  * expressions as SQL functions, so
  * `spark.sql("SELECT vector_dot(a, b) ...")` plans the codegen expression,
  * and injects the engine's optimizer rules (SURVEY.md §4 item 3:
  * [[graft.plans.CosineTopKRewrite]], the brute-force-cosine-top-k →
  * quantized-candidate-prefilter rewrite) into the session's Catalyst
  * operator-optimization fixpoint.
  *
  * Wire at session build:
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions     // config, or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  * (both routes are what [[graft.EngineSession.builder]] does) or post-hoc
  * on a live session with [[GraftExtensions.register]] — which can only
  * add the functions; optimizer rules need the build-time hook.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.CosineTopKRewrite)
  }
}

object GraftExtensions {
  /** Same catalyst shapes `VectorFunctions.cosine`/`l2Norm` lower to from
    * the Column API: dot/(sqrt(dot)·sqrt(dot)) and sqrt(dot) — so SQL and
    * DataFrame routes plan identical (codegen'd) trees. */
  private def norm(a: Expression): Expression = Sqrt(VectorDotProduct(a, a))

  /** Arity guard for every registered builder: a wrong argument count
    * surfaces as a clean AnalysisException-wrapped message instead of an
    * IndexOutOfBoundsException from `children(i)`. */
  private def arity(name: String, n: Int, children: Seq[Expression]): Seq[Expression] = {
    if (children.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${children.length}")
    children
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDotProduct].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        val c = arity("vector_dot", 2, children); VectorDotProduct(c(0), c(1)) }),
    (FunctionIdentifier("vector_cosine"),
      new ExpressionInfo(classOf[VectorDotProduct].getName, "vector_cosine"),
      (children: Seq[Expression]) => {
        val c = arity("vector_cosine", 2, children)
        Divide(VectorDotProduct(c(0), c(1)), Multiply(norm(c(0)), norm(c(1)))) }),
    (FunctionIdentifier("vector_norm"),
      new ExpressionInfo(classOf[VectorDotProduct].getName, "vector_norm"),
      (children: Seq[Expression]) => norm(arity("vector_norm", 1, children)(0))),
    (FunctionIdentifier("vector_l2sq"),
      new ExpressionInfo(classOf[VectorL2Squared].getName, "vector_l2sq"),
      (children: Seq[Expression]) => {
        val c = arity("vector_l2sq", 2, children); VectorL2Squared(c(0), c(1)) }),
    (FunctionIdentifier("vector_l2"),
      new ExpressionInfo(classOf[VectorL2Squared].getName, "vector_l2"),
      (children: Seq[Expression]) => {
        val c = arity("vector_l2", 2, children); Sqrt(VectorL2Squared(c(0), c(1))) }),
    // the round-15 per-document sketch expressions, for SQL-only users:
    // simhash64(words) / simhash60_md5(words) over a split word array,
    // winnow_select(text, k, w) returning the selected (pos, h) structs
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHashBits].getName, "simhash64"),
      (children: Seq[Expression]) => graft.functions.SimHashBits(
        arity("simhash64", 1, children)(0), 64, md5 = false)),
    (FunctionIdentifier("simhash60_md5"),
      new ExpressionInfo(classOf[graft.functions.SimHashBits].getName, "simhash60_md5"),
      (children: Seq[Expression]) => graft.functions.SimHashBits(
        arity("simhash60_md5", 1, children)(0), 60, md5 = true)),
    (FunctionIdentifier("winnow_select"),
      new ExpressionInfo(classOf[graft.functions.WinnowSelect].getName, "winnow_select"),
      (children: Seq[Expression]) => {
        val c = arity("winnow_select", 3, children)
        graft.functions.WinnowSelect(c(0),
          k = foldToInt(c(1), "winnow_select k"),
          w = foldToInt(c(2), "winnow_select w")) }))

  /** SQL literals for the static k/w parameters (the expression hashes and
    * windows are sized at plan time, so only foldable ints are accepted;
    * out-of-int-range longs are rejected rather than silently wrapped). */
  private def foldToInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval(null) match {
      case i: Int => i
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an int-range integer literal, got $other")
    }
  }

  /** The text-quality stack for SQL-only users, as Spark 4 SQL-body UDFs
    * (`CREATE FUNCTION ... RETURN <expr>`). NOT the expression-registry
    * route the vector functions take: lambda-bearing Column trees
    * (transform/filter/aggregate) cross the registry bridge unresolved and
    * fail codegen, while a SQL body goes through the full analyzer. Bodies
    * mirror the [[graft.ops.TextOps]] combinators term-for-term, so the
    * SQL and DataFrame surfaces agree value-for-value (asserted in
    * `x4_sql_quality`'s oracle and VectorExpressionSpec). */
  val textSqlFunctions: Seq[String] = {
    val email = graft.ops.TextOps.emailRe.replace("\\", "\\\\")
    val phone = graft.ops.TextOps.phoneRe.replace("\\", "\\\\")
    Seq(
      // `transform(array(split(...)), ws -> ...)` binds the words array ONCE
      // per row — SQL bodies have no CSE across lambda boundaries, so the
      // naive form re-splits the text at EVERY reference (the documented 3×
      // cost of this route; the binding trick removes the recomputation
      // while keeping every term and fold order bit-identical, so the
      // DuckDB oracle is untouched)
      // single sorted run-length fold, mirroring TextOps.wordEntropyArr's
      // round-20 form: the same terms in the same sorted-distinct order
      // (bit-identical sum), one pass instead of a filter() rescan per
      // distinct word
      """CREATE OR REPLACE TEMPORARY FUNCTION word_entropy(t STRING)
        |RETURNS DOUBLE RETURN
        |element_at(transform(array(split(t, ' ')), ws ->
        |  round(aggregate(array_sort(ws),
        |    named_struct('prev', '', 'run', 0, 'sum', CAST(0.0 AS DOUBLE)),
        |    (acc, w) -> CASE
        |      WHEN acc.run = 0 THEN named_struct('prev', w, 'run', 1, 'sum', acc.sum)
        |      WHEN w = acc.prev THEN
        |        named_struct('prev', acc.prev, 'run', acc.run + 1, 'sum', acc.sum)
        |      ELSE named_struct('prev', w, 'run', 1, 'sum', acc.sum +
        |        (-(CAST(acc.run AS DOUBLE) / size(ws))
        |          * log2(CAST(acc.run AS DOUBLE) / size(ws)))) END,
        |    acc -> CASE WHEN acc.run = 0 THEN acc.sum ELSE acc.sum +
        |      (-(CAST(acc.run AS DOUBLE) / size(ws))
        |        * log2(CAST(acc.run AS DOUBLE) / size(ws))) END) + 0.0, 4)), 1)""".stripMargin,
      """CREATE OR REPLACE TEMPORARY FUNCTION repetition_ratio(t STRING)
        |RETURNS DOUBLE RETURN
        |element_at(transform(array(split(t, ' ')), ws ->
        |  CASE WHEN size(ws) >= 3 THEN
        |    round(1.0 - CAST(size(array_distinct(transform(
        |        sequence(1, size(ws) - 2),
        |        i -> array_join(slice(ws, i, 3), ' ')))) AS DOUBLE)
        |      / (size(ws) - 2), 4)
        |  ELSE 0.0 END), 1)""".stripMargin,
      s"""CREATE OR REPLACE TEMPORARY FUNCTION redact_pii(t STRING)
         |RETURNS STRING RETURN
         |regexp_replace(regexp_replace(t, '$email', '<EMAIL>'),
         |  '$phone', '<PHONE>')""".stripMargin)
  }

  /** Register the SQL-body text functions on a live session. */
  def registerTextSql(spark: SparkSession): Unit = {
    textSqlFunctions.foreach(spark.sql)
    ()
  }

  /** Register the same functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      GraftColumnBridge.registerFunction(spark, ident.funcName, builder)
    }
}
