package graft.plans

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.expressions.Window.{partitionBy => winPartitionBy}
import org.apache.spark.sql.functions._
import graft.functions.{VectorDotProduct, VectorFunctions, VectorL2Squared}

/** The declared stretch optimizer rule (SURVEY.md §4 custom-Catalyst item
  * 3): rewrite the NAIVE brute-force similarity top-k shape — cosine
  * (`vector_cosine`) or raw inner product (`vector_dot`, the MIPS
  * retrieval form; same machinery, the error bound simply skips the norm
  * division), plus the ASCENDING L2 nearest-neighbor forms `vector_l2` /
  * `vector_l2sq` (round-12 verdict #5; triangle-inequality bound
  * `|‖q−c‖ − ‖q̂−ĉ‖| ≤ ‖rq‖+‖rc‖`, threshold = MAX exact distance of the
  * approx-top-k, survivors keep `approx − ε ≤ t_q`) —
  *
  * {{{
  *   queries.join(corpus, qid =!= cid)                  // cross-shaped join
  *     .select(qid, cid, cosine(q_emb, c_emb).as(score)) // graft's codegen cosine
  *     .withColumn(rn, row_number over (partitionBy qid orderBy score DESC, cid ASC))
  *     .filter(rn <= k)
  * }}}
  *
  * — into a quantized candidate pre-filter + exact re-rank, WITHOUT changing
  * the result by a single row:
  *
  *  1. augment each side once, per row: milli-rounded vector `v̂`
  *     (`round(1000·vᵢ)/1000` — the certified int8/milli quantization
  *     family of [[graft.ops.Similarity]]), true norm ‖v‖, quantized norm
  *     ‖v̂‖ and residual norm ‖v−v̂‖;
  *  2. approx pass over the pairs: `approx = ⟨q̂,ĉ⟩/(‖q‖‖c‖)` — ONE dot per
  *     pair against the naive plan's three — plus the per-pair error bound
  *     `ε = (‖q̂‖‖rc‖ + ‖rq‖‖ĉ‖ + ‖rq‖‖rc‖)/(‖q‖‖c‖)`, which dominates
  *     `|cosine − approx|` by Cauchy-Schwarz on
  *     `⟨q,c⟩ = ⟨q̂,ĉ⟩ + ⟨q̂,rc⟩ + ⟨rq,ĉ⟩ + ⟨rq,rc⟩`;
  *  3. per query, exact-rescore the top-k BY APPROX and take their minimum
  *     exact cosine as the threshold `t_q` — k real rows score ≥ `t_q`, so
  *     the true k-th cosine is ≥ `t_q`;
  *  4. keep only pairs with `approx + ε ≥ t_q` (any true top-k row survives:
  *     its cosine ≥ `t_q` and `approx ≥ cosine − ε`), then exact-rescore and
  *     re-rank the survivors with the ORIGINAL order (score DESC, id ASC).
  *
  * The rewrite is provably exact — the emitted rows, scores, and ranks are
  * identical to brute force (certified by `x3_rule_topk`'s brute-force
  * DuckDB oracle) — while the expensive full-dimension scoring and the
  * final ranking sort touch only the surviving candidates (ε ≈ 2·√dim·5e-4:
  * for well-spread corpora that prunes ~99% of pairs). At 100 TB the milli
  * codes are also the bandwidth story: the approx pass ships quantized
  * vectors (int16-packable) instead of float32, exactly like the int8
  * serving path, and the threshold join broadcasts one row per query.
  *
  * Matching is deliberately NARROW: row_number (not rank), a single
  * partition key, an order of exactly (unrounded-cosine DESC, id ASC) where
  * the cosine is graft's native `Divide(VectorDotProduct, ‖·‖‖·‖)` tree, a
  * projection of exactly (qid, cid, score), and a cross-shaped join: no
  * equi-conjunct (`=` or `<=>` — those plan as hash joins, not ANN
  * cross-scoring), and a DETERMINISTIC condition referencing only the two
  * id attributes. The accepted condition is carried VERBATIM into the
  * rewritten pair join (round-11 ADVICE #1) — so `qid ≠ cid`, the
  * ordered-pair dedup form `qid < cid`, and one-sided filters like
  * `qid ≠ 5` all restrict the rewritten pair set exactly as they restrict
  * the naive one. Anything else — including the `round(cosine, 3)`-ranked
  * certified entries, whose score is a `Round` node — is left untouched.
  *
  * Duplicate id values need no uniqueness assumption (round-11 ADVICE #2):
  * the narrow pair rows are one per (q-row, c-row) combination already, and
  * both embedding re-joins first collapse the selected pairs to DISTINCT
  * (qid, cid) id pairs. Re-joining a distinct id pair re-expands to exactly
  * the combinations the naive join produces for those id values (the
  * condition depends only on the ids, so all such combinations pass it
  * together): the threshold is a min over a superset of the k selected
  * combos (repetition-insensitive, still a valid lower bound), and the
  * survivor multiset is the naive partition restricted to surviving id
  * pairs — a superset of the true top-k rows, re-ranked exactly.
  * The rewritten subtree itself can't re-match: its approx window ranks by
  * a precomputed-norm divide (no `Sqrt(VectorDotProduct)` factors) and its
  * exact re-rank sits on equi-joins.
  *
  * Injected via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]), so it runs inside the operator-optimization
  * fixpoint on every [[graft.EngineSession]]-built session. Internal
  * columns carry the `__graft_ann` prefix — the plan-level marker PlanSpec
  * asserts on.
  */
object CosineTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** One accepted naive score shape. `higherIsBetter` fixes every direction
    * in the rewrite (window sort, threshold agg, survivor inequality);
    * `sqrtForm` distinguishes L2 distance from squared L2 (monotone twins —
    * ranking is identical; only the emitted score column differs). */
  private sealed abstract class Shape(val higherIsBetter: Boolean)
  private case object CosineShape extends Shape(true)
  private case object DotShape extends Shape(true)
  private case class L2Shape(sqrtForm: Boolean) extends Shape(false)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(LessThanOrEqual(rnRef: AttributeReference, IntegerLiteral(k)),
                    Window(Seq(rnAlias @ Alias(
                        WindowExpression(RowNumber(), _), _)),
                      Seq(pk: AttributeReference),
                      Seq(SortOrder(scoreRef: AttributeReference, scoreDir, _, _),
                          SortOrder(tieRef: AttributeReference, Ascending, _, _)),
                      child, _))
        if rnRef.exprId == rnAlias.exprId && k > 0 &&
           (scoreDir == Descending || scoreDir == Ascending) =>
      // fail OPEN: an injected rule must never turn an optimizer surprise
      // into a query failure — any exception in the rewrite leaves the
      // (correct) naive plan in place and logs why
      try rewrite(f, rnAlias, k, pk, scoreRef, scoreDir == Descending,
          tieRef, child).getOrElse(f)
      catch {
        case scala.util.control.NonFatal(e) =>
          logWarning(s"CosineTopKRewrite matched but failed to rewrite; " +
            s"keeping the unrewritten plan: $e")
          f
      }
  }

  /** The certified score shapes, each returning the embedding attributes
    * plus the [[Shape]]. The window's sort direction must agree with the
    * shape's better-direction — `cosine ASC` ("k most DISsimilar") or
    * `l2 DESC` ("k farthest") are not the ANN serving shape and the
    * pruning bound would be the wrong side, so they are left untouched:
    *   - cosine (DESC): `Divide(VectorDotProduct(a, b),
    *     Multiply(Sqrt(dot(a,a)), Sqrt(dot(b,b))))` — the exact tree
    *     [[VectorFunctions.cosine]] and SQL `vector_cosine` lower to;
    *   - inner product (DESC, MIPS retrieval): a bare
    *     `VectorDotProduct(a, b)` — [[VectorFunctions.dot]] / SQL
    *     `vector_dot`. Same pre-filter machinery; the error bound simply
    *     skips the norm division;
    *   - L2 distance (ASC): `Sqrt(VectorL2Squared(a, b))` —
    *     [[VectorFunctions.l2Distance]] / SQL `vector_l2` — or the bare
    *     squared form `VectorL2Squared(a, b)` ([[VectorFunctions.l2sq]] /
    *     SQL `vector_l2sq`; same ranking, squared score). Triangle-
    *     inequality bound: |‖q−c‖ − ‖q̂−ĉ‖| ≤ ‖rq‖ + ‖rc‖. */
  private def asScore(e: Expression, desc: Boolean): Option[(AttributeReference, AttributeReference, Shape)] =
    e match {
      case Divide(VectorDotProduct(a: AttributeReference, b: AttributeReference),
                  Multiply(Sqrt(VectorDotProduct(a2, a3)),
                           Sqrt(VectorDotProduct(b2, b3)), _), _)
          if desc && a.semanticEquals(a2) && a.semanticEquals(a3) &&
             b.semanticEquals(b2) && b.semanticEquals(b3) =>
        Some((a, b, CosineShape))
      case VectorDotProduct(a: AttributeReference, b: AttributeReference) if desc =>
        Some((a, b, DotShape))
      case Sqrt(VectorL2Squared(a: AttributeReference, b: AttributeReference)) if !desc =>
        Some((a, b, L2Shape(sqrtForm = true)))
      case VectorL2Squared(a: AttributeReference, b: AttributeReference) if !desc =>
        Some((a, b, L2Shape(sqrtForm = false)))
      case _ => None
    }

  /** A cross-shaped join: Inner/Cross whose condition (if any) is
    * deterministic, references only the two id attributes, and has no
    * TOP-LEVEL equi-conjunct (`EqualTo`/`EqualNullSafe` across the sides —
    * those plan as hash joins and are not the naive ANN shape; an
    * `EqualTo` under a `Not` — the `qid =!= cid` self-exclusion — is fine).
    * The accepted condition is carried verbatim into the rewritten pair
    * join by [[build]], so any such restriction of the pair set — `≠`,
    * `<`, `≤`, one-sided literals — is reproduced exactly. */
  private def crossish(j: Join, qid: Attribute, cid: Attribute): Boolean = {
    val typeOk = j.joinType == Inner || j.joinType == Cross
    val condOk = j.condition match {
      case None => true
      case Some(c) =>
        def acrossSides(l: Expression, r: Expression): Boolean = (l, r) match {
          case (la: AttributeReference, ra: AttributeReference) =>
            (j.left.outputSet.contains(la) && j.right.outputSet.contains(ra)) ||
              (j.left.outputSet.contains(ra) && j.right.outputSet.contains(la))
          case _ => false
        }
        val noEqui = !splitConjunctivePredicates(c).exists {
          case EqualTo(l, r) => acrossSides(l, r)
          case EqualNullSafe(l, r) => acrossSides(l, r)
          case _ => false
        }
        noEqui && c.deterministic &&
          c.references.subsetOf(AttributeSet(Seq(qid, cid)))
    }
    typeOk && condOk
  }

  private def rewrite(f: Filter, rnAlias: Alias, k: Int, pk: AttributeReference,
                      scoreRef: AttributeReference, desc: Boolean,
                      tieRef: AttributeReference,
                      child0: LogicalPlan): Option[LogicalPlan] = (child0 match {
    // InferWindowGroupLimit (a later batch than the extension slot, but the
    // fixpoint can re-enter) plants a WindowGroupLimit between Window and
    // the scored projection — transparent for matching purposes
    case WindowGroupLimit(_, _, _, _, inner) => inner
    case other => other
  }) match {
    // the scored projection directly over the cross-shaped join, exactly
    // (qid, cid, score) — wider projections (embeddings carried upward)
    // are not the naive top-k shape and are left alone
    case Project(projList, j: Join)
        if projList.length == 3 &&
          projList.map(_.exprId).toSet ==
            Set(pk.exprId, tieRef.exprId, scoreRef.exprId) &&
          // never re-enter our own rewritten subtrees: the approx pass is
          // itself a bare-dot row_number<=k shape over a cross join (the
          // MIPS form), distinguishable only by the internal column names
          !projList.exists(_.name.startsWith("__graft_ann")) =>
      // the id columns may be join-side attrs passed through OR aliased
      // inside this very projection (the SQL route collapses them here) —
      // resolve each to its SOURCE attribute below the join
      def sourceAttr(exprId: ExprId): Option[AttributeReference] =
        projList.find(_.exprId == exprId).flatMap {
          case a: AttributeReference => Some(a)
          case Alias(ar: AttributeReference, _) => Some(ar)
          case _ => None
        }
      for {
        scoreAlias <- projList.collectFirst {
          case a @ Alias(e, _) if a.exprId == scoreRef.exprId => e }
        (qEmb, cEmb, shape) <- asScore(scoreAlias, desc)
        pkSrc <- sourceAttr(pk.exprId)
        tieSrc <- sourceAttr(tieRef.exprId)
        // orient the sides: the partition key and its embedding on one,
        // the tiebreak id and its embedding on the other
        (qPlan, cPlan) <-
          if (j.left.outputSet.contains(pkSrc) && j.left.outputSet.contains(qEmb) &&
              j.right.outputSet.contains(tieSrc) && j.right.outputSet.contains(cEmb))
            Some((j.left, j.right))
          else if (j.right.outputSet.contains(pkSrc) && j.right.outputSet.contains(qEmb) &&
                   j.left.outputSet.contains(tieSrc) && j.left.outputSet.contains(cEmb))
            Some((j.right, j.left)) // query side sat on the right: swap
          else None
        if crossish(j, pkSrc, tieSrc)
      } yield build(f, rnAlias, k, pk, scoreRef, tieRef,
        qPlan, pkSrc, qEmb, cPlan, tieSrc, cEmb, j.condition,
        shape)
    case _ => None
  }

  private def build(f: Filter, rnAlias: Alias, k: Int, pk: AttributeReference,
                    scoreRef: AttributeReference, tieRef: AttributeReference,
                    qPlan: LogicalPlan, pkSrc: AttributeReference,
                    qEmb: AttributeReference,
                    cPlan: LogicalPlan, tieSrc: AttributeReference,
                    cEmb: AttributeReference,
                    origCond: Option[Expression], shape: Shape): LogicalPlan = {
    val spark = SparkSession.active
    import graft.functions.VectorFunctions.{cosine, dot}

    // one narrow projection per side: id, embedding, milli-quantized
    // vector, true/quantized/residual norms — all per-ROW (linear) work
    def side(p: LogicalPlan, id: Attribute, emb: Attribute, pfx: String): DataFrame = {
      val base = GraftColumnBridge.ofRows(spark,
        Project(Seq(Alias(id, s"${pfx}_id")(), Alias(emb, s"${pfx}_emb")()), p))
      val e = VectorFunctions.toDouble(col(s"${pfx}_emb"))
      base.select(col(s"${pfx}_id"), col(s"${pfx}_emb"),
          transform(e, x => round(x * 1000) / 1000.0d).as(s"${pfx}_qv"))
        .select(col(s"${pfx}_id"), col(s"${pfx}_emb"), col(s"${pfx}_qv"),
          sqrt(dot(col(s"${pfx}_emb"), col(s"${pfx}_emb"))).as(s"${pfx}_n"),
          sqrt(dot(col(s"${pfx}_qv"), col(s"${pfx}_qv"))).as(s"${pfx}_nh"),
          sqrt(org.apache.spark.sql.functions.aggregate(
            zip_with(e, col(s"${pfx}_qv"), (x, y) => (x - y) * (x - y)),
            lit(0.0d), (acc, x) => acc + x)).as(s"${pfx}_rn"))
    }
    val q = side(qPlan, pkSrc, qEmb, "__graft_ann_q")
    val c = side(cPlan, tieSrc, cEmb, "__graft_ann_c")
    val qid = col("__graft_ann_q_id")
    val cid = col("__graft_ann_c_id")

    // approx pass: quantized dot + error bound, NARROW pair rows (ids +
    // two doubles — no embeddings cross the pair shuffle). The ORIGINAL
    // join condition rides along verbatim (crossish() proved it references
    // only the two id attributes), remapped onto the renamed id columns —
    // so `≠`, ordered-pair `<`, and one-sided forms all carve out exactly
    // the naive plan's pair set.
    val pairCond = origCond match {
      case Some(c) => GraftColumnBridge.column(c.transform {
        case a: AttributeReference if a.exprId == pkSrc.exprId =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
            Seq("__graft_ann_q_id"))
        case a: AttributeReference if a.exprId == tieSrc.exprId =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
            Seq("__graft_ann_c_id"))
      })
      case None => lit(true)
    }
    // approx score + error bound per shape. Similarity shapes: quantized
    // dot with the Cauchy-Schwarz cross-term bound (÷ norms for cosine).
    // L2: quantized distance ‖q̂−ĉ‖ with the triangle-inequality bound
    // |‖q−c‖ − ‖q̂−ĉ‖| ≤ ‖rq−rc‖ ≤ ‖rq‖ + ‖rc‖ — the threshold pass
    // compares in UNSQUARED distance space even for the squared-score
    // form (monotone, so ranks are unaffected; only the emitted score
    // column squares).
    val approxRaw = dot(col("__graft_ann_q_qv"), col("__graft_ann_c_qv"))
    val epsRaw = col("__graft_ann_q_nh") * col("__graft_ann_c_rn") +
      col("__graft_ann_q_rn") * col("__graft_ann_c_nh") +
      col("__graft_ann_q_rn") * col("__graft_ann_c_rn")
    val denom = col("__graft_ann_q_n") * col("__graft_ann_c_n")
    val (approxCol, epsCol) = shape match {
      case CosineShape => (approxRaw / denom, epsRaw / denom)
      case DotShape    => (approxRaw, epsRaw)
      case L2Shape(_)  =>
        (sqrt(VectorFunctions.l2sq(col("__graft_ann_q_qv"), col("__graft_ann_c_qv"))),
         col("__graft_ann_q_rn") + col("__graft_ann_c_rn"))
    }
    val pairs = q.drop("__graft_ann_q_emb").join(c.drop("__graft_ann_c_emb"), pairCond)
      .select(qid, cid,
        approxCol.as("__graft_ann_approx"),
        epsCol.as("__graft_ann_eps"))

    val qe = q.select(qid, col("__graft_ann_q_emb"))
    val ce = c.select(cid, col("__graft_ann_c_emb"))
    // exactCmp lives in the approx column's space (cosine / dot / unsquared
    // distance) for the threshold + survivor inequalities; exactScore is
    // the ORIGINAL tree's value, the emitted column
    val (exactCmp, exactScore) = shape match {
      case CosineShape =>
        val e = cosine(col("__graft_ann_q_emb"), col("__graft_ann_c_emb"))
        (e, e)
      case DotShape =>
        val e = dot(col("__graft_ann_q_emb"), col("__graft_ann_c_emb"))
        (e, e)
      case L2Shape(sqrtForm) =>
        val sq = VectorFunctions.l2sq(col("__graft_ann_q_emb"), col("__graft_ann_c_emb"))
        (sqrt(sq), if (sqrtForm) sqrt(sq) else sq)
    }
    val better = shape.higherIsBetter

    // threshold: min exact cosine of each query's top-k BY APPROX — a
    // provable lower bound on the true k-th cosine. Both re-joins below
    // first collapse to DISTINCT id pairs (round-11 ADVICE #2): if an id
    // value is duplicated on either side, joining the pair ids back to the
    // embeddings re-expands to exactly the (q-row, c-row) combinations the
    // naive join emits for those id values — never the duplicate-count-
    // squared fan-out a non-distinct re-join would produce. For the
    // threshold that means min() over a superset of the k selected combos
    // (min is repetition-insensitive, the bound stays valid); for the
    // survivors it means the re-ranked multiset IS the naive partition
    // restricted to surviving id pairs. Under unique ids the distinct is a
    // semantic no-op over already-pruned narrow id rows.
    val wApprox = winPartitionBy(qid)
      .orderBy(if (better) col("__graft_ann_approx").desc
               else col("__graft_ann_approx").asc, cid.asc)
    // similarity: min exact of the approx-top-k lower-bounds the true k-th
    // score; distance: max exact of the approx-top-k upper-bounds the true
    // k-th distance (the k-th smallest over ALL pairs ≤ the max over any
    // particular k pairs)
    val thr = pairs
      .withColumn("__graft_ann_crk", row_number().over(wApprox))
      .filter(col("__graft_ann_crk") <= k)
      .select(qid, cid)
      .dropDuplicates("__graft_ann_q_id", "__graft_ann_c_id")
      .join(qe, Seq("__graft_ann_q_id")).join(ce, Seq("__graft_ann_c_id"))
      .groupBy(qid).agg(
        (if (better) min(exactCmp) else max(exactCmp)).as("__graft_ann_thr"))

    // survivors: approx ± ε clears the threshold from the score's better
    // side (1e-9 slack absorbs the float rounding inside the bound
    // arithmetic itself — the bound terms are ~1e-3, fifteen orders above
    // double ulp); then exact re-rank in the ORIGINAL order
    val wFinal = winPartitionBy(qid)
      .orderBy(if (better) col("__graft_ann_score").desc
               else col("__graft_ann_score").asc, cid.asc)
    val ranked = pairs
      .join(broadcast(thr), Seq("__graft_ann_q_id"))
      .filter(
        if (better)
          col("__graft_ann_approx") + col("__graft_ann_eps") + lit(1e-9d) >=
            col("__graft_ann_thr")
        else
          col("__graft_ann_approx") - col("__graft_ann_eps") - lit(1e-9d) <=
            col("__graft_ann_thr"))
      .select(qid, cid)
      .dropDuplicates("__graft_ann_q_id", "__graft_ann_c_id")
      .join(qe, Seq("__graft_ann_q_id")).join(ce, Seq("__graft_ann_c_id"))
      .select(qid, cid, exactScore.as("__graft_ann_score"))
      .withColumn("__graft_ann_rn", row_number().over(wFinal))
      .filter(col("__graft_ann_rn") <= k)

    // splice: alias the rewritten outputs back onto the ORIGINAL exprIds,
    // in the original output order, so every parent reference stays bound.
    // The OPTIMIZED subtree goes in (not the analyzed one): the
    // hint-resolution and finish-analysis batches have already run on the
    // outer plan, so an analyzed splice would carry a ResolvedHint the
    // planner no longer accepts; optimizing the subtree here is idempotent
    // under the outer fixpoint.
    val analyzed = GraftColumnBridge.optimized(ranked)
    val byName = analyzed.output.map(a => a.name -> a).toMap
    val mapping: Map[ExprId, Attribute] = Map(
      pk.exprId -> byName("__graft_ann_q_id"),
      tieRef.exprId -> byName("__graft_ann_c_id"),
      scoreRef.exprId -> byName("__graft_ann_score"),
      rnAlias.exprId -> byName("__graft_ann_rn"))
    Project(f.output.map(o =>
      Alias(mapping(o.exprId), o.name)(exprId = o.exprId,
        qualifier = o.qualifier)), analyzed)
  }
}
