package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adversarial exactness for [[CosineTopKRewrite]] beyond PlanSpec's
  * happy-path assertion: the rewrite must reproduce brute force bit-for-bit
  * on a corpus built to stress the threshold logic — EXACT duplicate
  * vectors (equal cosines across many neighbors, so the k-th score ties
  * far past rank k and the candidate threshold `t_q` equals the scores of
  * hundreds of survivors at once) and near-colinear vectors (approx scores
  * inside one quantization ε of each other). Any off-by-one in the
  * survivor bound or a tie broken differently from (score DESC, id ASC)
  * diverges here immediately. */
class CosineTopKRewriteSpec extends SparkSpec {

  private def syntheticEmb(n: Int, distinct: Int): DataFrame = {
    import spark.implicits._
    // id -> one of `distinct` base vectors (exact float duplicates), dim 8;
    // deterministic splitmix-ish component values in [-1, 1]
    spark.range(n).select($"id".as("vec_id"),
      expr(s"""transform(sequence(0, 7), d -> CAST(
        sin(CAST((id % $distinct) * 8 + d AS DOUBLE) * 12.9898 + 4.1414) AS FLOAT))""")
        .as("embedding"))
  }

  private def naive(emb: DataFrame, defeat: Boolean): DataFrame = {
    import spark.implicits._
    val q = emb.filter($"vec_id" < 12)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val c = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("c_emb"))
    val scored = q.join(c, $"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        graft.functions.VectorFunctions.cosine($"q_emb", $"c_emb").as("sim_raw"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"sim_raw".desc, $"neighbor_id".asc)
    val ranked = scored.withColumn("rank", row_number().over(w))
    val filtered =
      if (defeat) ranked.filter($"rank" <= 7 && $"neighbor_id" >= -1L)
      else ranked.filter($"rank" <= 7)
    filtered
      .select($"query_id", $"rank", $"neighbor_id", round($"sim_raw", 6).as("sim"))
      .orderBy($"query_id", $"rank")
  }

  test("rewrite == brute force under exact-duplicate-vector tie storms") {
    import spark.implicits._
    val emb = syntheticEmb(n = 400, distinct = 5) // 80 exact copies each
    val rewritten = naive(emb, defeat = false)
    val brute = naive(emb, defeat = true)
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("__graft_ann"),
      "rule was supposed to fire on the tie-storm corpus")
    assert(!brute.queryExecution.optimizedPlan.toString.contains("__graft_ann"))
    val got = rewritten.as[(Long, Int, Long, Double)].collect().toSeq
    val want = brute.as[(Long, Int, Long, Double)].collect().toSeq
    assert(got === want)
    // ties really are present: with 5 distinct vectors every query has 79+
    // neighbors at cosine exactly 1.0, so the top-7 must be the 7 SMALLEST
    // neighbor ids among the same-class copies
    assert(want.count(_._4 == 1.0) > 50, s"tie storm missing: $want")
  }

  test("MIPS form: a bare vector_dot score is rewritten and equals brute " +
    "force under the same tie storm") {
    import spark.implicits._
    def naiveDot(emb: DataFrame, defeat: Boolean): DataFrame = {
      val q = emb.filter($"vec_id" < 12)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
      val c = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("c_emb"))
      val scored = q.join(c, $"query_id" =!= $"neighbor_id")
        .select($"query_id", $"neighbor_id",
          graft.functions.VectorFunctions.dot($"q_emb", $"c_emb").as("score_raw"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"score_raw".desc, $"neighbor_id".asc)
      val ranked = scored.withColumn("rank", row_number().over(w))
      (if (defeat) ranked.filter($"rank" <= 7 && $"neighbor_id" >= -1L)
       else ranked.filter($"rank" <= 7))
        .select($"query_id", $"rank", $"neighbor_id",
          round($"score_raw", 6).as("score"))
        .orderBy($"query_id", $"rank")
    }
    val emb = syntheticEmb(n = 400, distinct = 5)
    val rewritten = naiveDot(emb, defeat = false)
    val brute = naiveDot(emb, defeat = true)
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("__graft_ann"),
      "rule was supposed to fire on the bare-dot MIPS form")
    assert(!brute.queryExecution.optimizedPlan.toString.contains("__graft_ann"))
    val got = rewritten.as[(Long, Int, Long, Double)].collect().toSeq
    val want = brute.as[(Long, Int, Long, Double)].collect().toSeq
    assert(got === want)
  }

  test("L2 arm: rewrite == brute force under exact-duplicate tie storms, " +
    "SQL route (vector_l2) included") {
    import spark.implicits._
    // exact duplicates make distance EXACTLY 0.0 across dozens of
    // neighbors: the threshold t_q collapses to 0 and every copy must
    // survive the approx−ε ≤ t_q bound and tie-break by id
    val emb = syntheticEmb(n = 400, distinct = 5)
    def naiveL2(defeat: Boolean): DataFrame = {
      val q = emb.filter($"vec_id" < 12)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
      val c = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("c_emb"))
      val scored = q.join(c, $"query_id" =!= $"neighbor_id")
        .select($"query_id", $"neighbor_id",
          graft.functions.VectorFunctions.l2Distance($"q_emb", $"c_emb").as("dist_raw"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"dist_raw".asc, $"neighbor_id".asc)
      val ranked = scored.withColumn("rank", row_number().over(w))
      val filtered =
        if (defeat) ranked.filter($"rank" <= 7 && $"neighbor_id" >= -1L)
        else ranked.filter($"rank" <= 7)
      filtered
        .select($"query_id", $"rank", $"neighbor_id", round($"dist_raw", 6).as("dist"))
        .orderBy($"query_id", $"rank")
    }
    val rewritten = naiveL2(defeat = false)
    val brute = naiveL2(defeat = true)
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("__graft_ann"),
      "L2 arm was supposed to fire on the tie-storm corpus")
    assert(!brute.queryExecution.optimizedPlan.toString.contains("__graft_ann"))
    val got = rewritten.as[(Long, Int, Long, Double)].collect().toSeq
    val want = brute.as[(Long, Int, Long, Double)].collect().toSeq
    assert(got === want)
    // SQL route: vector_l2 lowers to the same Sqrt(VectorL2Squared) tree
    graft.GraftExtensions.register(spark)
    syntheticEmb(n = 300, distinct = 30).createOrReplaceTempView("rw_emb_l2")
    val sqlDf = spark.sql(
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    vector_l2(q.embedding, c.embedding) AS dist_raw
        |  FROM rw_emb_l2 q JOIN rw_emb_l2 c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 8),
        |ranked AS (
        |  SELECT query_id, neighbor_id, dist_raw,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY dist_raw ASC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, round(dist_raw, 6) AS dist
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin)
    assert(sqlDf.queryExecution.optimizedPlan.toString.contains("__graft_ann"),
      "SQL-route naive L2 top-k should plan through the same rewrite")
  }

  test("the SQL route's naive form is rewritten too (vector_cosine lowers " +
    "to the same tree)") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    syntheticEmb(n = 300, distinct = 30).createOrReplaceTempView("rw_emb")
    val df = spark.sql(
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    vector_cosine(q.embedding, c.embedding) AS sim_raw
        |  FROM rw_emb q JOIN rw_emb c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 8),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim_raw,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim_raw DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, round(sim_raw, 6) AS sim
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("__graft_ann"),
      "SQL-route naive top-k should plan through the same rewrite")
    val emb = syntheticEmb(n = 300, distinct = 30)
    val want = naive(emb, defeat = true).filter($"query_id" < 8)
      .filter($"rank" <= 5)
      .as[(Long, Int, Long, Double)].collect().toSeq
      .map { case (q, r, n, _) => (q, r, n) }
    val got = df.as[(Long, Int, Long, Double)].collect().toSeq
      .map { case (q, r, n, _) => (q, r, n) }
    assert(got === want)
  }

  test("ordered-pair dedup form (qid < cid): the condition is carried into " +
    "the rewritten pair join and the output equals brute force") {
    import spark.implicits._
    // round-11 ADVICE #1: before the fix this shape matched crossish() but
    // build() substituted =!= for <, silently drawing top-k from ALL
    // neighbors instead of only larger-id ones
    def pairForm(emb: DataFrame, defeat: Boolean): DataFrame = {
      val q = emb.filter($"vec_id" < 12)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
      val c = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("c_emb"))
      val scored = q.join(c, $"query_id" < $"neighbor_id")
        .select($"query_id", $"neighbor_id",
          graft.functions.VectorFunctions.cosine($"q_emb", $"c_emb").as("sim_raw"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"sim_raw".desc, $"neighbor_id".asc)
      val ranked = scored.withColumn("rank", row_number().over(w))
      (if (defeat) ranked.filter($"rank" <= 7 && $"neighbor_id" >= -1L)
       else ranked.filter($"rank" <= 7))
        .select($"query_id", $"rank", $"neighbor_id", round($"sim_raw", 6).as("sim"))
        .orderBy($"query_id", $"rank")
    }
    val emb = syntheticEmb(n = 400, distinct = 5)
    val rewritten = pairForm(emb, defeat = false)
    val brute = pairForm(emb, defeat = true)
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("__graft_ann"),
      "rule was supposed to fire on the ordered-pair form")
    val got = rewritten.as[(Long, Int, Long, Double)].collect().toSeq
    val want = brute.as[(Long, Int, Long, Double)].collect().toSeq
    assert(got === want)
    // the carried condition really bites: no neighbor_id <= its query_id
    assert(got.forall { case (q, _, n, _) => n > q })
  }

  test("one-sided literal condition (cid != const) is carried and exact") {
    import spark.implicits._
    def oneSided(emb: DataFrame, defeat: Boolean): DataFrame = {
      val q = emb.filter($"vec_id" < 8)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
      val c = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("c_emb"))
      val scored = q.join(c,
          $"query_id" =!= $"neighbor_id" && $"neighbor_id" =!= lit(17L))
        .select($"query_id", $"neighbor_id",
          graft.functions.VectorFunctions.cosine($"q_emb", $"c_emb").as("sim_raw"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"sim_raw".desc, $"neighbor_id".asc)
      val ranked = scored.withColumn("rank", row_number().over(w))
      (if (defeat) ranked.filter($"rank" <= 5 && $"neighbor_id" >= -1L)
       else ranked.filter($"rank" <= 5))
        .select($"query_id", $"rank", $"neighbor_id", round($"sim_raw", 6).as("sim"))
        .orderBy($"query_id", $"rank")
    }
    val emb = syntheticEmb(n = 120, distinct = 6)
    val rewritten = oneSided(emb, defeat = false)
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("__graft_ann"),
      "rule was supposed to fire on the one-sided-literal form")
    val got = rewritten.as[(Long, Int, Long, Double)].collect().toSeq
    val want = oneSided(emb, defeat = true).as[(Long, Int, Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.forall(_._3 != 17L))
  }

  test("duplicate id values: the distinct-before-re-join keeps the naive " +
    "multiset (no duplicate-count-squared fan-out)") {
    import spark.implicits._
    // round-11 ADVICE #2 stressor: every id value appears on 5 rows with 5
    // DIFFERENT embeddings — the re-join by id value must re-expand to
    // exactly the naive (q-row, c-row) combinations, nothing more
    val emb = spark.range(200).select(($"id" % 40).as("vec_id"),
      expr(s"""transform(sequence(0, 7), d -> CAST(
        sin(CAST(id * 8 + d AS DOUBLE) * 12.9898 + 4.1414) AS FLOAT))""")
        .as("embedding"))
    val rewritten = naive(emb, defeat = false)
    val brute = naive(emb, defeat = true)
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("__graft_ann"),
      "rule was supposed to fire on the duplicate-id corpus")
    val got = rewritten.as[(Long, Int, Long, Double)].collect().toSeq
    val want = brute.as[(Long, Int, Long, Double)].collect().toSeq
    assert(got === want)
    // duplicates really are present: 12 qid values x 5 rows each on the
    // query side, so every partition ranks 5x the per-id pair rows
    assert(want.nonEmpty && emb.groupBy("vec_id").count()
      .filter($"count" =!= 5L).count() == 0)
  }

  test("matcher refuses an equi-join condition (qid = cid is a hash join, " +
    "not the ANN cross-scoring shape)") {
    import spark.implicits._
    val emb = syntheticEmb(n = 80, distinct = 80)
    val q = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val c = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("c_emb"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"sim_raw".desc, $"neighbor_id".asc)
    val ranked = q.join(c, $"query_id" === $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        graft.functions.VectorFunctions.cosine($"q_emb", $"c_emb").as("sim_raw"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
    assert(!ranked.queryExecution.optimizedPlan.toString.contains("__graft_ann"))
  }

  test("matcher refuses rank() — only row_number is the certified shape") {
    import spark.implicits._
    val emb = syntheticEmb(n = 100, distinct = 100)
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val c = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("c_emb"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"sim_raw".desc, $"neighbor_id".asc)
    val ranked = q.join(c, $"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        graft.functions.VectorFunctions.cosine($"q_emb", $"c_emb").as("sim_raw"))
      .withColumn("rank", rank().over(w))
      .filter($"rank" <= 3)
    // rank() admits ties past k — rewriting it with the row_number machinery
    // would change cardinality, so the matcher must leave it alone
    assert(!ranked.queryExecution.optimizedPlan.toString.contains("__graft_ann"))
  }

  test("rewrite == brute force on near-colinear (sub-epsilon) corpora") {
    import spark.implicits._
    // 60 vectors within ~1e-4 of each other: approx scores collide inside
    // one quantization step, so survival rides entirely on the ε bound
    val emb = spark.range(60).select($"id".as("vec_id"),
      expr("""transform(sequence(0, 7), d -> CAST(
        1.0 + CAST(id AS DOUBLE) * 0.0001 * (d + 1) / 8.0 AS FLOAT))""")
        .as("embedding"))
    val got = naive(emb, defeat = false).as[(Long, Int, Long, Double)].collect().toSeq
    val want = naive(emb, defeat = true).as[(Long, Int, Long, Double)].collect().toSeq
    assert(got === want)
  }
}
