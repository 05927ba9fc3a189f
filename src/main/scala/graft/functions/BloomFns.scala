package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL registration for Spark's built-in Bloom-filter sketch expressions.
  *
  * Catalyst ships `BloomFilterAggregate` / `BloomFilterMightContain` for
  * its internal runtime-filter injection but does NOT expose them in the
  * public function registry — so the runtime-pre-filter join shape (build
  * a KB-scale sketch over the small side, broadcast it, drop non-matching
  * probe rows at the scan before any shuffle) is unavailable to users.
  * These registrations expose exactly the built-in expressions; no sketch
  * code is re-implemented.
  *
  *  - `graft_bloom_agg(value LONG, estimatedItems LONG, numBits LONG)`:
  *    aggregate → BINARY sketch
  *  - `graft_bloom_contains(sketch BINARY, value LONG)`: scalar → BOOLEAN;
  *    never a false negative, so exact joins can use it as a pre-filter
  */
object BloomFns {

  val aggRegistration: FnReg.Registration = FnReg.make(
    "graft_bloom_agg", classOf[BloomFilterAggregate], arity = 3,
    c => new BloomFilterAggregate(c(0), c(1), c(2)))

  val containsRegistration: FnReg.Registration = FnReg.make(
    "graft_bloom_contains", classOf[BloomFilterMightContain], arity = 2,
    c => BloomFilterMightContain(c(0), c(1)))

  // the sketch pair is consumed via SQL only (might_contain requires its
  // sketch operand to be a scalar subquery, which the Column API cannot
  // express) — so no Column wrappers here, just the registrations
  def ensureRegistered(spark: SparkSession): Unit = {
    FnReg.ensure(spark, aggRegistration)
    FnReg.ensure(spark, containsRegistration)
  }

  /** Size a Bloom sketch from the build side's Catalyst statistics
    * instead of a hardcoded constant, so the false-positive rate holds
    * whether the build side is 10³ or 10⁸ keys.
    *
    * Item estimate: the optimized plan's `rowCount` when the stats
    * pipeline knows it (CBO / ANALYZE), else `sizeInBytes / row width` —
    * the same fallback Catalyst's own join-size heuristics use. The
    * estimate is then floored (a sketch sized for < `minItems` saves
    * nothing and a filter-estimate of 0 rows must not produce a degenerate
    * sketch) and capped (a broadcast sketch past ~16 MB stops being "a few
    * KB beside the data" — above the cap, accept a higher FPP rather than
    * a bigger broadcast; correctness never depends on the FPP because the
    * exact join still runs behind the pre-filter).
    *
    * Bits: the textbook optimum m = -n·ln(p)/ln(2)², p = `fpp`.
    */
  def sketchSize(
      build: org.apache.spark.sql.DataFrame,
      fpp: Double = 0.03,
      minItems: Long = 4096L,
      // default == BloomFilterAggregate's maxNumBits config default
      // (spark.sql.optimizer.runtime.bloomFilter.maxNumBits = 2^26);
      // a bigger request would fail the aggregate's input check
      maxBits: Long = 1L << 26): (Long, Long) = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // BloomFilterAggregate's maxNumItems config default (4e6); above it
    // the aggregate's input check rejects the literal
    val maxItems = 4000000L
    val plan = build.queryExecution.optimizedPlan
    val stats = plan.stats
    val rowWidth = math.max(1, plan.output.map(_.dataType.defaultSize).sum)
    val estimated = stats.rowCount.map(_.toLong)
      .getOrElse((stats.sizeInBytes / rowWidth).toLong)
    val items = math.min(maxItems, math.max(minItems, estimated))
    val optimalBits =
      math.ceil(-items.toDouble * math.log(fpp) / (math.log(2) * math.log(2)))
        .toLong
    (items, math.min(maxBits, math.max(items, optimalBits)))
  }
}
