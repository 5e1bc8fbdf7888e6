package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Native VectorDotProduct expression: value semantics, SQL registration,
  * float/double handling. */
class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("dot/cosine over float arrays match hand-computed values") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val (d, c) = df.select(VF.dot($"a", $"b"), round(VF.cosine($"a", $"b"), 6))
      .as[(Double, Double)].head()
    assert(d === 32.0)
    assert(c === BigDecimal(32.0 / (math.sqrt(14.0) * math.sqrt(77.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("l2sq/l2Distance match hand-computed values and the SQL route") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 6.0f, 3.0f))).toDF("a", "b")
    val (sq, d) = df.select(VF.l2sq($"a", $"b"), VF.l2Distance($"a", $"b"))
      .as[(Double, Double)].head()
    assert(sq === 25.0) // 9 + 16 + 0
    assert(d === 5.0)
    graft.GraftExtensions.register(spark)
    val (s2, d2) = spark.sql(
      "SELECT vector_l2sq(array(1.0d, 2.0d), array(4.0d, 6.0d)) AS s, " +
        "vector_l2(array(1.0d, 2.0d), array(4.0d, 6.0d)) AS d")
      .as[(Double, Double)].head()
    assert(s2 === 25.0 && d2 === 5.0)
  }

  test("VectorL2Squared is bit-identical to the interpreted HOF fold it replaced") {
    // the scaladoc's numeric contract, asserted: exact float widening +
    // left-to-right double accumulation == aggregate(zip_with(...)) on
    // deterministic pseudo-random vectors (exact double equality, no eps)
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)((
      Seq.fill(64)(rnd.nextFloat() * 4f - 2f),
      Seq.fill(64)(rnd.nextFloat() * 4f - 2f)))
    val df = rows.toDF("a", "b")
    val hof = aggregate(
      zip_with(transform($"a", x => x.cast("double")),
               transform($"b", x => x.cast("double")),
               (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val mismatches = df
      .select(VF.l2sq($"a", $"b").as("native"), hof.as("interp"))
      .filter($"native" =!= $"interp").count()
    assert(mismatches === 0L)
  }

  test("mixed float/double inputs and mismatched lengths (shorter wins)") {
    val df = Seq((Seq(1.0f, 2.0f, 9.0f), Seq(3.0, 4.0))).toDF("a", "b")
    assert(df.select(VF.dot($"a", $"b")).as[Double].head() === 11.0)
  }

  test("null vector yields null, not a crash") {
    val df = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val r = df.select(VF.dot($"a", $"b")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("registered as a SQL function via GraftExtensions") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(r === 11.0)
    // plans the native expression, not a UDF wrapper
    val plan = spark.sql(
      "SELECT vector_dot(array(1.0d), array(2.0d))").queryExecution.analyzed.toString
    assert(plan.contains("vector_dot"), plan)
    // composed functions: SQL route builds the same tree as the Column API
    val cos = spark.sql(
      "SELECT vector_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "vector_norm(array(3.0d, 4.0d)) AS n")
      .as[(Double, Double)].head()
    assert(cos === ((1.0, 5.0)))
  }

  test("round-15 sketch expressions registered as SQL functions: simhash " +
      "families match the Column route; winnow_select replays the selection") {
    graft.GraftExtensions.register(spark)
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("sketch_probe")
    val (sqlXx, sqlMd) = spark.sql(
      "SELECT simhash64(split(text, ' ')), simhash60_md5(split(text, ' ')) " +
        "FROM sketch_probe").as[(Long, Long)].head()
    val viaCol = graft.ops.Dedup.simhashFrame(df, "text", "doc_id")
      .as[(Long, Long)].head()._2
    val viaColMd = graft.ops.Dedup.simhashFramePortable(df, "text", "doc_id")
      .as[(Long, Long)].head()._2
    assert(sqlXx === viaCol && sqlMd === viaColMd)
    assert(sqlMd >= 0 && sqlMd < (1L << 60))
    val sqlWinnow = spark.sql(
      "SELECT s.pos, s.h FROM sketch_probe " +
        "LATERAL VIEW explode(winnow_select(text, 8, 4)) t AS s")
      .as[(Int, String)].collect().toSet
    val viaColW = graft.ops.Dedup.winnowSelected(df, "text", "doc_id", 8, 4)
      .select($"pos", $"h").as[(Int, String)].collect().toSet
    assert(sqlWinnow === viaColW && sqlWinnow.nonEmpty)
    // non-literal k rejected at registration-time fold
    intercept[Exception] {
      spark.sql("SELECT winnow_select(text, doc_id, 4) FROM sketch_probe")
        .collect()
    }
  }

  test("simhash null array elements are skipped, not an NPE (r15 advice)") {
    graft.GraftExtensions.register(spark)
    // user-built array with a null element — reachable only through the SQL
    // surface (split() never emits nulls); must equal the null-free signature
    val (withNull, without) = spark.sql(
      "SELECT simhash64(array('alpha', CAST(NULL AS STRING), 'beta')) AS a, " +
        "simhash64(array('alpha', 'beta')) AS b").as[(Long, Long)].head()
    assert(withNull === without)
    val (mdNull, mdPlain) = spark.sql(
      "SELECT simhash60_md5(array(CAST(NULL AS STRING), 'gamma')) AS a, " +
        "simhash60_md5(array('gamma')) AS b").as[(Long, Long)].head()
    assert(mdNull === mdPlain)
  }

  test("wrong arity and out-of-int-range literals fail cleanly (r15 advice)") {
    graft.GraftExtensions.register(spark)
    // arity errors carry the function name, not an IndexOutOfBoundsException
    val e1 = intercept[Exception] {
      spark.sql("SELECT winnow_select('abc', 8)").collect()
    }
    assert(e1.getMessage.contains("winnow_select") &&
      e1.getMessage.contains("3 argument"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT vector_dot(array(1.0d))").collect()
    }
    assert(e2.getMessage.contains("vector_dot"), e2.getMessage)
    // a Long literal outside Int range must be rejected, not wrapped
    val e3 = intercept[Exception] {
      spark.sql("SELECT winnow_select('abc', 4294967298, 4)").collect()
    }
    assert(e3.getMessage.contains("int-range"), e3.getMessage)
  }

  test("rejects non-numeric-array inputs at analysis time") {
    val df = Seq((Seq("x"), Seq(1.0))).toDF("a", "b")
    intercept[Exception] { df.select(VF.dot($"a", $"b")).collect() }
  }

  test("SQL-body text UDFs agree with the Column API value-for-value") {
    graft.GraftExtensions.registerTextSql(spark)
    val texts = Seq("a a a a", "a b c d", "x",
      "mail a@b.co or 555-123-4567", "a b c a b c a b c")
    val df = texts.toDF("t")
    val viaSql = df.selectExpr("word_entropy(t)", "repetition_ratio(t)",
        "redact_pii(t)")
      .as[(Double, Double, String)].collect().toSeq
    val viaCols = df.select(
        graft.ops.TextOps.wordEntropy($"t"),
        graft.ops.TextOps.repetitionRatioArr(split($"t", " ")),
        graft.ops.TextOps.redactPii($"t"))
      .as[(Double, Double, String)].collect().toSeq
    assert(viaSql === viaCols)
    assert(viaSql(3)._3 === "mail <EMAIL> or <PHONE>")
  }
}
