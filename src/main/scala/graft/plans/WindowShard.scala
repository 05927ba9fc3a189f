package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute,
  AttributeReference, Cast, CumeDist, CurrentRow, DenseRank, Descending,
  Expression, Literal, NamedExpression, NTile, NullsFirst, NullsLast,
  PercentRank, RangeFrame, Rank, RowFrame, RowNumber, SortOrder,
  SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding,
  WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project,
  Window => LWindow}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Auto-dispatch for the single-task prefix-window class (SURVEY §2.4
  * "custom plan" row; the RewriteCosineSelfJoin pattern applied to the
  * prefix family — r15 verdict item 2).
  *
  * The engine's own rows ship two arms per prefix operator: the naive
  * window (`q_curriculum`, `q_sample_budget`, `q_seq_pack` — the oracle
  * anchors) and the sharded plan (`PrefixSum.shardedPrior`) whose peaks
  * stay bounded while the window arm's grow ×10 per corpus decade
  * (BENCH_NOTES, mode=prefix over two decades; outright wall crossover at
  * ×10000). But a USER writing the naive form gets the single-task sort —
  * Spark itself warns "No Partition Defined ... Moving all data to a
  * single partition". This rule closes that hole in the optimizer: a
  * running-sum / row_number / ntile / rank / dense_rank / percent_rank /
  * cume_dist window is rewritten IN PLACE to the sharded-prior dataflow
  * once Catalyst's size estimate says the sort is oversized —
  *
  *   - empty partitionSpec: fires when the child estimate exceeds
  *     `spark.graft.window.maxSortBytes` (the whole input is one task's
  *     sort);
  *   - non-empty partitionSpec: fires only when EVERY partition column
  *     carries a distinct-count column statistic (CBO / ANALYZE TABLE)
  *     and size / Π(distinctCount) exceeds the threshold — an estimated
  *     oversized group. Without column stats the group size is unknown
  *     and the rule refuses: blindly sharding a high-cardinality window
  *     (per-user running sums) would build a groups×shards histogram and
  *     a groups×shards² self-join for nothing.
  *
  * Exactness contract (why the match is narrow): the sharded decomposition
  * is bit-equal to the window form only when the summed value's addition
  * is associative — so sums rewrite for integral inputs (wrap-around
  * long addition is associative) and for exact DECIMAL inputs of scale
  * ≤ 6 (decimal addition is exact and associative under Spark's
  * overflow-checked sum; the scale cap is [[isExactDecimal]]'s
  * bit-equality argument — the running money total,
  * `sum(l_extendedprice) OVER (ORDER BY ...)`, is the most common real
  * prefix shape and sits well inside it). Float/double addition is not
  * associative and a rewrite would change low-order bits — refused.
  * row_number/ntile rewrite as
  * running counts with Spark's ragged-N ntile sizing inlined as a closed
  * form (the q_curriculum_hist formula); rank/dense_rank rewrite as
  * earlier-shard row/distinct-key offsets plus a shard-local rank
  * ([[PrefixSum.shardedRank]]) — exact, because peer groups never
  * straddle shards. Ties in the order key stay within one shard (the
  * shard is a non-decreasing function of the first order expression), so
  * tie behavior of the remaining functions is the same
  * arbitrary-but-plan-stable class the window form has — and rank's tie
  * SEMANTICS (peer-group counting) are reproduced exactly.
  *
  * The replacement is built by wrapping the matched child back into a
  * DataFrame and calling the SAME `PrefixSum.shardedPriors` the
  * registered scale arms use (via [[GraftSqlBridge]]) — the rewrite
  * cannot drift from the oracled implementation. The offsets join is NOT
  * broadcast-hinted here (partition cardinality is unknown; AQE still
  * broadcasts small frames). Any construction failure leaves the plan
  * untouched.
  */
object RewritePrefixWindow extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.window.maxSortBytes"

  /** Default 1 GiB: the mode=prefix stress measured window-arm peaks
    * crossing from comfortable (384 MB at 5M docs) to the wall-crossover
    * regime (3.8 GB at 50M docs) across that boundary. */
  private def maxBytes: Long =
    conf.getConfString(ConfKey, (1L << 30).toString).toLong

  private val Shards = 256

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Decimal running sums rewrite only for scale 0..6. Why: the
    * decomposition's binary adds (offset + shard-local running sum ±
    * value) promote precision, and once a promoted precision crosses 38
    * Spark's adjustPrecisionScale picks
    * `adjustedScale = max(38 - intDigits, min(s, 6))` — for s ≤ 6 that
    * is always s (scale PRESERVED, the add can only overflow, which the
    * checked decimal arithmetic surfaces: ANSI throws, non-ANSI nulls —
    * the same failure Spark's own window Sum produces), while for s ≥ 7
    * the last digit could ROUND and the rewrite would not be bit-equal.
    * Every intermediate (the hist sums, the offset sums, the window sum,
    * the final adds) therefore yields the exact mathematical value or
    * fails loudly — never a silently rounded one. */
  private def isExactDecimal(t: DataType): Boolean = t match {
    case d: DecimalType => d.scale >= 0 && d.scale <= 6
    case _ => false
  }

  private def isNumericShardable(t: DataType): Boolean = t match {
    case _ if isIntegral(t) => true
    case FloatType | DoubleType => true
    case _: DecimalType => true
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w: LWindow if eligible(w) =>
      try tryRewrite(w).getOrElse(w)
      catch { case e: Exception =>
        logWarning(s"prefix-window rewrite abandoned: ${e.getMessage}")
        w
      }
  }

  /** Cheap structural + size gates before any construction work. */
  private def eligible(w: LWindow): Boolean = {
    val partOk = w.partitionSpec.forall(_.isInstanceOf[AttributeReference])
    // re-entrance guard: the replacement's own shard-local window
    // partitions by the helper columns — never rewrite those
    val notOurs = w.partitionSpec.forall {
      case a: AttributeReference =>
        !a.name.startsWith("__ps_") && !a.name.startsWith("__gpx_")
      case _ => true
    }
    w.windowExpressions.nonEmpty && w.hint.isEmpty && partOk && notOurs &&
      w.orderSpec.nonEmpty && oversized(w)
  }

  /** Size trigger: whole-input bytes for a global window; per-group
    * bytes (requires column stats on every partition attr) otherwise. */
  private def oversized(w: LWindow): Boolean = {
    val size = w.child.stats.sizeInBytes
    if (w.partitionSpec.isEmpty) size > BigInt(maxBytes)
    else {
      val stats = w.child.stats.attributeStats
      val counts = w.partitionSpec.map {
        case a: Attribute => stats.get(a).flatMap(_.distinctCount)
        case _ => None
      }
      counts.forall(_.isDefined) && {
        val groups = counts.flatten.product.max(BigInt(1))
        size / groups > BigInt(maxBytes)
      }
    }
  }

  /** Per-function frame admission. sum/row_number/ntile carry ROWS
    * UNBOUNDED PRECEDING .. CURRENT ROW; rank/dense_rank accept the
    * RANGE form of the same prefix too (RankLike's value ignores the
    * frame — either spelling is the same function). cume_dist's VALUE
    * depends on the peer-inclusive RANGE prefix: a ROWS-framed CumeDist
    * (unreachable from the analyzer today, which always assigns its
    * required RANGE frame) would be a different function, so refuse
    * rather than silently change semantics (r16 ADVICE, low).
    * percent_rank needs the whole partition (its required frame spans to
    * UNBOUNDED FOLLOWING) — accept each class's own required
    * spelling(s). */
  private def frameOk(wf: Expression,
      frame: SpecifiedWindowFrame): Boolean = {
    val rowsPrefix = frame == SpecifiedWindowFrame(RowFrame,
      UnboundedPreceding, CurrentRow)
    val rangePrefix = frame == SpecifiedWindowFrame(RangeFrame,
      UnboundedPreceding, CurrentRow)
    val fullRange = frame == SpecifiedWindowFrame(RangeFrame,
      UnboundedPreceding, UnboundedFollowing)
    wf match {
      case _: Rank | _: DenseRank => rowsPrefix || rangePrefix
      case _: CumeDist => rangePrefix
      case _: PercentRank => rowsPrefix || rangePrefix || fullRange
      case _ => rowsPrefix
    }
  }

  /** A multi-expression Window node rewrites as a WHOLE or not at all:
    * every expression must be individually eligible (they already share
    * one partition/order spec — that is what groups them into one node),
    * because a partial rewrite would leave a residual one-task window
    * carrying the ineligible rest — the exact plan the rule exists to
    * remove (r16 verdict item 2; the `sum + row_number` pair in one
    * select is the most common real notebook shape). All prior-family
    * expressions (sum / row_number / ntile) share ONE
    * [[PrefixSum.shardedPriors]] pass — one histogram, one offsets join,
    * one shard-local window with all value columns; each rank-family
    * expression chains a [[PrefixSum.shardedRank]] pass (its histogram
    * count differs per mode). */
  private def tryRewrite(w: LWindow): Option[LogicalPlan] = {
    val parsed: Seq[(Alias, Expression)] = w.windowExpressions.map {
      case al @ Alias(WindowExpression(f,
          WindowSpecDefinition(_, _, fr: SpecifiedWindowFrame)), _)
          if frameOk(f, fr) =>
        (al, f)
      case _ => return None
    }
    val so = w.orderSpec.head
    // the two DEFAULT direction/null pairings; a flipped nulls ordering
    // has no monotone shard for the null rows
    val dirOk = (so.direction, so.nullOrdering) match {
      case (Ascending, NullsFirst) | (Descending, NullsLast) => true
      case _ => false
    }
    if (!dirOk || w.orderSpec.exists(s => !s.child.deterministic))
      return None
    val o = so.child
    val shardable = o.dataType match {
      case StringType => so.direction == Ascending // no monotone string flip
      case t => isNumericShardable(t)
    }
    if (!shardable) return None
    // name-based reassembly (shardedPriors joins by name) needs unique,
    // collision-free child column names
    val names = w.child.output.map(_.name)
    if (names.distinct.size != names.size ||
      names.exists(n => n.startsWith("__ps_") || n.startsWith("__gpx_")))
      return None

    // classification — the whole node or nothing (see scaladoc above)
    sealed abstract class Cls
    case class SumCls(child: Expression) extends Cls
    case object RowNumCls extends Cls
    case class NtileCls(k: Int) extends Cls
    case class RankCls(mode: String) extends Cls
    val classified: Seq[(Alias, Cls)] = parsed.map {
      case (al, AggregateExpression(s: Sum, Complete, false, None, _))
          if (isIntegral(s.child.dataType) ||
            isExactDecimal(s.child.dataType)) && s.child.deterministic =>
        (al, SumCls(s.child))
      case (al, _: RowNumber) => (al, RowNumCls)
      case (al, NTile(Literal(k: Int, IntegerType))) => (al, NtileCls(k))
      case (al, rk @ (_: Rank | _: DenseRank | _: PercentRank |
          _: CumeDist)) =>
        (al, RankCls(rk match {
          case _: DenseRank => "dense_rank"
          case _: PercentRank => "percent_rank"
          case _: CumeDist => "cume_dist"
          case _ => "rank"
        }))
      case _ => return None
    }

    val spark = SparkSession.active
    val partNames = w.partitionSpec.map {
      case a: AttributeReference => a.name
    }
    val df = GraftSqlBridge.ofRows(spark, w.child)
    val (dfS, shardCol) = shardOf(df, o, so.direction == Descending)
    val ords = w.orderSpec.map(sortCol)
    val keys = w.orderSpec.map(s => GraftSqlBridge.column(s.child))

    // ONE shardedPriors pass carries every prior-family expression:
    // per integral sum a running (non-null sum, non-null count) pair —
    // window SUM ignores nulls and is null only until the first non-null
    // value — plus a single SHARED running row count if any
    // row_number/ntile is present. Helper columns are indexed by the
    // expression's position in the node.
    val needCount = classified.exists {
      case (_, RowNumCls) | (_, NtileCls(_)) => true
      case _ => false
    }
    // values accumulate in the window Sum's own RESULT type (LongType
    // for integral inputs — unchanged behavior — and the widened
    // DecimalType(min(38, p+10), s) for decimal inputs), so every
    // partial the shards add is the type Spark's own evaluator buffers
    val sumVals: Seq[(String, Column)] = classified.zipWithIndex.flatMap {
      case ((al, SumCls(child)), i) =>
        val vc = GraftSqlBridge.column(child)
        Seq(s"__gpx_ps_$i" ->
            coalesce(vc.cast(al.dataType), lit(0L).cast(al.dataType)),
          s"__gpx_pc_$i" -> when(vc.isNotNull, lit(1L)).otherwise(lit(0L)))
      case _ => Nil
    }
    val priorVals = sumVals ++
      (if (needCount) Seq("__gpx_cnt" -> lit(1L)) else Nil)

    var cur: DataFrame =
      if (priorVals.isEmpty) dfS
      else PrefixSum.shardedPriors(dfS, partNames, shardCol, ords,
        priorVals, hintBroadcast = false)
    // each rank-family expression chains its own shardedRank pass (its
    // histogram count differs per mode: rows vs distinct keys, ± group
    // totals): global rank = earlier-shard row count + shard-local rank;
    // dense_rank offsets by earlier-shard DISTINCT keys instead — exact
    // because peer groups never straddle shards (peers tie on the first
    // order expression, the shard's input). percent_rank and cume_dist
    // divide the same exact-long rank/peer-cumulative numerators by the
    // histogram's group total, reproducing Spark's own IEEE division
    // operand-for-operand. shardedRank is row-preserving (every join
    // matches exactly one offsets/total row), so the passes compose.
    for (((_, RankCls(mode)), i) <- classified.zipWithIndex) {
      cur = PrefixSum.shardedRank(cur, partNames, shardCol, ords, keys,
        mode, rankName = s"__gpx_rk_$i")
    }
    // group totals for ntile: ONE null-safe group-count join shared by
    // all ntile expressions in the node. NOTE: no broadcast() hints
    // anywhere in this construction — the rule runs AFTER the
    // optimizer's hint-resolution batch, so a ResolvedHint in the
    // inserted tree reaches physical planning and trips an internal
    // error; the 1-row/offset frames broadcast by size estimate anyway
    if (classified.exists {
        case (_, NtileCls(_)) => true; case _ => false }) {
      val nAgg = count(lit(1)).as("__gpx_n")
      cur =
        if (partNames.isEmpty) cur.crossJoin(df.agg(nAgg))
        else {
          // null-safe keyed group counts (a usingColumns join would
          // drop null partition values the window form keeps)
          val counts = df.groupBy(partNames.map(col): _*).agg(nAgg)
            .select(partNames.map(c => col(c).as(s"__gpx_g_$c")) :+
              col("__gpx_n"): _*)
          cur.join(counts, partNames.map(c =>
            col(c) <=> col(s"__gpx_g_$c")).reduce(_ && _))
        }
    }
    // per-expression result columns over the assembled frame
    for (((al, cls), i) <- classified.zipWithIndex) cur = cls match {
      case SumCls(child) =>
        val vc = GraftSqlBridge.column(child)
        val vz = coalesce(vc.cast(al.dataType), lit(0L).cast(al.dataType))
        val ind = when(vc.isNotNull, lit(1L)).otherwise(lit(0L))
        cur.withColumn(s"__gpx_res_$i",
          when(col(s"__gpx_pc_$i") + ind === 0L, lit(null))
            .otherwise(col(s"__gpx_ps_$i") + vz)
            .cast(al.dataType))
      case RowNumCls =>
        cur.withColumn(s"__gpx_res_$i",
          (col("__gpx_cnt") + lit(1L)).cast(IntegerType))
      case RankCls(_) =>
        cur.withColumn(s"__gpx_res_$i",
          col(s"__gpx_rk_$i").cast(al.dataType))
      case NtileCls(k) =>
        // Spark's ragged-N ntile sizing inlined as a closed form (the
        // q_curriculum_hist formula): with N = q·k + r, the first r
        // buckets take q+1 rows and the rest take q
        cur.withColumn(s"__gpx_rank_$i", col("__gpx_cnt") + lit(1L))
          .withColumn(s"__gpx_res_$i", expr(
            s"""CAST(CASE
                 WHEN __gpx_rank_$i <=
                      (__gpx_n % $k) * ((__gpx_n DIV $k) + 1)
                 THEN ((__gpx_rank_$i - 1) DIV ((__gpx_n DIV $k) + 1)) + 1
                 ELSE (__gpx_n % $k) +
                      ((__gpx_rank_$i -
                          (__gpx_n % $k) * ((__gpx_n DIV $k) + 1)
                          - 1) DIV GREATEST(__gpx_n DIV $k, 1)) + 1
               END AS INT)"""))
    }

    // strip any residual hint nodes: the optimizer's hint-resolution
    // batch already ran, so a ResolvedHint inserted now would reach the
    // planner unreplaced (INTERNAL_ERROR)
    val rep = cur.queryExecution.analyzed.transform {
      case org.apache.spark.sql.catalyst.plans.logical
        .ResolvedHint(child, _) => child
    }
    // every original child attr must have survived reassembly with its
    // exprId intact (the left spine of every join is the child frame)
    if (!w.child.output.forall(a => rep.outputSet.contains(a))) return None
    // pin each window alias (in node order — LWindow.output is
    // child.output ++ the window attrs) to its result column
    val resCols: Seq[NamedExpression] = classified.zipWithIndex.map {
      case ((al, _), i) =>
        val resAttr = rep.output.find(_.name == s"__gpx_res_$i")
          .getOrElse(return None)
        Alias(
          if (resAttr.dataType == al.dataType) resAttr
          else Cast(resAttr, al.dataType),
          al.name)(exprId = al.exprId)
    }
    Some(Project(w.child.output ++ resCols, rep))
  }

  /** The order-prefix shard column: a bounded-cardinality, non-decreasing
    * (along the sort order) function of the first order expression, with
    * order ties never straddling shards. Strings shard on their 2-char
    * prefix (binary-order monotone; nulls → "", the lowest prefix).
    * Numerics shard on a 256-way range bucket from an in-plan min/max
    * aggregate (one extra scan — the q_seq_pack_shard recipe), cast
    * through double: rounding is monotone, so precision loss can only
    * merge adjacent buckets, never reorder them. Nulls and NaNs get the
    * sentinel buckets their sort position demands; infinite or
    * degenerate (span 0 / NaN) corpora collapse to one bucket — correct,
    * merely unsharded. Descending orders flip the bucket index.
    *
    * THE DOUBLE-SCAN TRADE (deliberate — do not "optimize" this into a
    * driver collect): the numeric path reads the input twice, once for
    * the 1-row min/max frame and once for the data pass. The min/max
    * MUST stay an in-plan aggregate joined as a 1-row broadcast —
    * collecting it to the driver and inlining literals would (a) force a
    * job boundary inside the optimizer rule (an action during
    * optimization re-enters the optimizer; deadlock-prone and breaks
    * cached-plan reuse), and (b) freeze the bounds into the plan, so a
    * cached/reused query re-running on grown data would shard on stale
    * bounds. The extra scan is a full-width-free columnar read of ONE
    * column (parquet stats often answer it per row-group), pipelined
    * ahead of the shuffle; measured at ×1000 (5M docs, mode=prefix,
    * BENCH_NOTES round 17) the scan is 0.6–0.7 s absolute — a 4–14%
    * share of the dispatched wall across two runs (the spread is box
    * noise in the denominator, not the scan) — and the dispatched form
    * INCLUDING that scan still beats the one-task sort outright on a
    * quiet box (r16 record: 3.05 s vs 4.98 s). */
  private def shardOf(df: DataFrame, o: Expression,
      desc: Boolean): (DataFrame, Column) = {
    val oc = GraftSqlBridge.column(o)
    o.dataType match {
      case StringType =>
        (df, coalesce(substring(oc, 1, 2), lit("")))
      case _ =>
        val od = oc.cast(DoubleType)
        val mm = df.agg(min(od).as("__gpx_mn"), max(od).as("__gpx_mx"))
        val d2 = df.crossJoin(mm) // 1-row side: broadcasts by estimate
        val span = col("__gpx_mx") - col("__gpx_mn")
        val b0 = floor((od - col("__gpx_mn")) * lit(Shards.toDouble) /
          when(span > 0.0, span).otherwise(lit(1.0)))
        val ab = when(od.isNull, lit(-1L))
          .when(isnan(od), lit(Shards.toLong))
          .otherwise(greatest(lit(0L), least(lit(Shards - 1L),
            coalesce(b0.cast(LongType), lit(0L)))))
        (d2, if (desc) lit(Shards.toLong) - ab else ab)
    }
  }

  private def sortCol(s: SortOrder): Column = {
    val c = GraftSqlBridge.column(s.child)
    (s.direction, s.nullOrdering) match {
      case (Ascending, NullsFirst) => c.asc_nulls_first
      case (Ascending, NullsLast) => c.asc_nulls_last
      case (Descending, NullsFirst) => c.desc_nulls_first
      case (Descending, NullsLast) => c.desc_nulls_last
    }
  }
}
