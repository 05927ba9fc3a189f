package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  AttributeReference, AttributeSet, Expression, GreaterThanOrEqual, IsNotNull,
  LessThan, LessThanOrEqual, Literal, Round, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan,
  Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.DoubleType

import graft.functions.CosineSim
import graft.operators.Similarity

/** Whole-operator custom plan for the exact cosine similarity self-join
  * (SURVEY.md §7.2 "custom" column — the (c) extension path: LogicalPlan +
  * Rule[LogicalPlan] + SparkStrategy + SparkPlan, wired through
  * [[graft.GraftExtensions]]).
  *
  * A declarative cosine self-join
  * {{{
  *   a.join(b, $"a_id" < $"b_id")
  *    .withColumn("cos", round(cosine_sim($"a_v", $"b_v"), 6))
  *    .filter($"cos" >= t).select("a_id", "b_id", "cos")
  * }}}
  * plans as a BroadcastNestedLoopJoin — perfect up to the broadcast budget,
  * a guaranteed OOM past it. The rule matches exactly this
  * `round(cosine_sim, 6)` form (the public SQL-facing spelling); the
  * engine's own API paths quantize with floor(x·1e6+½)/1e6 and dispatch
  * to the blocked GEMM by size in [[graft.operators.Similarity.cosinePairs]]
  * directly, so they never need this rewrite.
  * [[RewriteCosineSelfJoin]] recognizes the shape
  * in the optimizer and, when Catalyst's size estimate exceeds
  * `spark.graft.cosine.maxBroadcastBytes`, swaps the whole subtree for
  * [[CosineSelfJoin]], which [[CosineJoinStrategy]] plans into
  * [[BlockedCosineJoinExec]] — the distributed blocked GEMM whose per-task
  * memory is 2·(corpus/blocks) regardless of corpus size. SQL users get the
  * same dispatch as the `Similarity.cosinePairs` API, from the plain
  * declarative formulation.
  */
case class CosineSelfJoin(
    child: LogicalPlan,
    threshold: Double,
    blocks: Int,
    override val output: Seq[Attribute]) extends UnaryNode {

  // b_id and cos are minted here (the right join side was absorbed)
  override def producedAttributes: AttributeSet =
    AttributeSet(output.filterNot(child.outputSet.contains))

  // we consume BOTH child columns even though no expression says so —
  // keeps ColumnPruning from projecting the child away
  override def references: AttributeSet = child.outputSet

  override protected def withNewChildInternal(
      newChild: LogicalPlan): CosineSelfJoin = copy(child = newChild)
}

/** Optimizer rule: declarative cosine self-join → [[CosineSelfJoin]] when
  * the corpus outgrows the broadcast budget. Matches both the fused shape
  * (predicates merged into the join condition) and the pre-pushdown
  * Filter-over-Join shape; refuses to fire if ANY conjunct other than the
  * `a_id < b_id` pair ordering, the rounded-cosine threshold, or an
  * inferred IsNotNull is present (dropping one would change semantics),
  * or if the two sides are not scans of the same corpus.
  */
object RewriteCosineSelfJoin extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.cosine.maxBroadcastBytes"

  private def maxBytes: Long =
    conf.getConfString(ConfKey, Similarity.MaxBroadcastBytes.toString).toLong

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case x         => Seq(x)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, Join(_, _, Inner, Some(_), _)) =>
      tryRewrite(p).getOrElse(p)
    case p @ Project(_, Filter(_, Join(_, _, Inner, _, _))) =>
      tryRewrite(p).getOrElse(p)
  }

  private def tryRewrite(p: Project): Option[LogicalPlan] = {
    val (projList, l, r, conjuncts) = p match {
      case Project(pl, Join(jl, jr, Inner, Some(c), _)) =>
        (pl, jl, jr, splitConj(c))
      case Project(pl, Filter(fc, Join(jl, jr, Inner, jc, _))) =>
        (pl, jl, jr, splitConj(fc) ++ jc.toSeq.flatMap(splitConj))
      case _ => return None
    }
    // id columns surface either as bare attributes (DataFrame API renames
    // them on the join inputs) or as Alias(attr) in the top projection
    // (SQL renames them there) — accept both, tracking the OUTPUT attr
    def idOf(e: Expression): Option[(AttributeReference, Attribute)] =
      e match {
        case a: AttributeReference                 => Some((a, a))
        case al @ Alias(a: AttributeReference, _)  => Some((a, al.toAttribute))
        case _                                     => None
      }
    projList match {
      case Seq(e1, e2,
          al @ Alias(Round(CosineSim(av: AttributeReference,
            bv: AttributeReference), Literal(6, _), _), _))
          if idOf(e1).isDefined && idOf(e2).isDefined =>
        val (aId, outA) = idOf(e1).get
        val (bId, outB) = idOf(e2).get
        // the exec's kernel reads raw FLOAT arrays (toFloatArray) — an
        // array<double> CosineSim (legal since the expression widened)
        // must NOT rewrite, or 8-byte elements get reinterpreted as floats
        def floatVec(a: Attribute): Boolean = a.dataType match {
          case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, _) => true
          case _ => false
        }
        // ORDINAL alignment, not mere membership: the two sides being
        // canonically equal plans, "same position in each side's output"
        // is what proves aId/bId (and av/bv) are the SAME underlying
        // corpus column — membership alone would let a join of id against
        // a DIFFERENT column (or cosine of two different vector columns)
        // rewrite into same-column semantics. The exec also hard-codes
        // getLong for ids, so only LongType ids may rewrite.
        def ordinal(side: LogicalPlan, a: Attribute): Int =
          side.output.indexWhere(_.exprId == a.exprId)
        val vecAligned =
          (ordinal(l, av) >= 0 && ordinal(l, av) == ordinal(r, bv)) ||
            (ordinal(l, bv) >= 0 && ordinal(l, bv) == ordinal(r, av))
        val sidesOk =
          ordinal(l, aId) >= 0 && ordinal(l, aId) == ordinal(r, bId) &&
          aId.dataType == org.apache.spark.sql.types.LongType &&
          bId.dataType == org.apache.spark.sql.types.LongType &&
          floatVec(av) && floatVec(bv) && vecAligned
        // every conjunct must be accounted for — else no rewrite. The
        // threshold must compare THE PAIR cosine (same operand attrs as
        // the projected one, either order); an IsNotNull is absorbable
        // only over a column whose nulls the blocked exec drops anyway.
        def isPairCosine(x: Expression, y: Expression): Boolean =
          (x.semanticEquals(av) && y.semanticEquals(bv)) ||
            (x.semanticEquals(bv) && y.semanticEquals(av))
        val known = Seq[Attribute](aId, bId, av, bv)
        var pairOrder = false
        val thresholds = Seq.newBuilder[Double]
        val allKnown = conjuncts.forall {
          case LessThan(x: AttributeReference, y: AttributeReference)
              if x.semanticEquals(aId) && y.semanticEquals(bId) =>
            pairOrder = true; true
          case GreaterThanOrEqual(
              Round(CosineSim(x, y), Literal(6, _), _),
              Literal(t: Double, DoubleType)) if isPairCosine(x, y) =>
            thresholds += t; true
          case LessThanOrEqual(Literal(t: Double, DoubleType),
              Round(CosineSim(x, y), Literal(6, _), _))
              if isPairCosine(x, y) =>
            thresholds += t; true
          case IsNotNull(c: AttributeReference)
              if known.exists(c.semanticEquals) => true
          case _ => false
        }
        val thrs = thresholds.result()
        val selfJoin = l.canonicalized == r.canonicalized
        val size = l.stats.sizeInBytes
        if (sidesOk && pairOrder && thrs.nonEmpty && allKnown && selfJoin &&
          size > BigInt(maxBytes)) {
          val vecAttr = if (l.outputSet.contains(av)) av else bv
          // clamped in Similarity.blocksFor — Catalyst's unknown-stats
          // default (Long.MaxValue) must not truncate to a tiny block
          // count and defeat the OOM protection this rewrite exists for
          val blocks = Similarity.blocksFor(size,
            org.apache.spark.sql.SparkSession.active
              .sparkContext.defaultParallelism)
          Some(CosineSelfJoin(
            Project(Seq(aId, vecAttr), l), // pin (id, vec) ordinals for exec
            thrs.max, blocks, Seq(outA, outB, al.toAttribute)))
        } else None
      case _ => None
    }
  }
}

/** Plans [[CosineSelfJoin]] into [[BlockedCosineJoinExec]]. */
object CosineJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case CosineSelfJoin(child, threshold, blocks, output) =>
      BlockedCosineJoinExec(planLater(child), threshold, blocks, output) :: Nil
    case _ => Nil
  }
}

/** Physical blocked-GEMM cosine join: child rows are (id: long,
  * vec: array<float>); output rows are (a_id, b_id, cos) for every pair
  * with rounded cosine ≥ threshold. Delegates to the same
  * [[Similarity.blockedPairs]] kernel the DataFrame API uses, so both
  * entries are bit-identical by construction.
  */
case class BlockedCosineJoinExec(
    child: SparkPlan,
    threshold: Double,
    blocks: Int,
    override val output: Seq[Attribute]) extends UnaryExecNode {

  // b_id and cos exist only above this operator (QueryPlan counts output
  // attrs as references, so without this the plan flags missing input)
  override def producedAttributes: AttributeSet =
    AttributeSet(output.filterNot(child.outputSet.contains))

  override protected def doExecute(): RDD[InternalRow] = {
    val vecs = child.execute().mapPartitions { it =>
      it.flatMap { row =>
        if (row.isNullAt(0) || row.isNullAt(1)) Iterator.empty
        else Iterator.single((row.getLong(0), row.getArray(1).toFloatArray))
      }
    }
    val types = output.map(_.dataType).toArray
    // keepNaN: the declarative plan this exec replaces passes NaN cosines
    // through the threshold (Spark's NaN-is-largest comparison) — the
    // rewrite must return the same rows for a corpus with zero-norm rows.
    // sparkRound6: the matched pattern is round(cosine_sim, 6), so the
    // kernel must replicate Spark's round (shortest-decimal HALF_UP),
    // not the API paths' floor-micro quantization.
    Similarity.blockedPairs(vecs, threshold, blocks, keepNaN = true,
      sparkRound6 = true)
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(types)
        it.map { case (a, b, c) => proj(InternalRow(a, b, c)) }
      }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): BlockedCosineJoinExec = copy(child = newChild)
}
