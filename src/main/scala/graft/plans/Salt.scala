package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation.
  *
  * A `groupBy(hotKey)` with few distinct values (e.g. 3 return flags over
  * 100 TB of lineitem) funnels each key through ONE reducer task after the
  * map-side combine. Salting splits every group into `buckets` sub-groups
  * for the first (heavy) aggregation, then combines the partials in a
  * second, tiny aggregation — both shuffles stay balanced at any skew.
  *
  * The salt must be deterministic data (not `rand()`) for reproducible
  * results; any high-cardinality column works.
  *
  * Relation to AQE skew mitigation (pinned live in PlanSpec "AQE splits a
  * skewed join partition"): `spark.sql.adaptive.skewJoin` already splits
  * an oversized SORT-MERGE-JOIN partition at runtime, so for plain skewed
  * joins prefer AQE and keep this manual path for the cases AQE does not
  * cover:
  *  - skewed AGGREGATIONS — AQE's skew rule only rewrites joins; a hot
  *    `groupBy` key still funnels one reducer without [[saltedAgg]];
  *  - deterministic layout — AQE's split points depend on observed map
  *    sizes, so retries/reruns may partition differently; salting gives a
  *    stable, data-derived layout (required when a downstream consumer
  *    keys on task index, e.g. part-file parity);
  *  - pre-AQE stage boundaries — AQE replans between stages; skew inside
  *    a single stage's map side (e.g. a skewed `explode` before the first
  *    shuffle) never reaches the skew rule.
  */
object Salt {

  /** Decimal partial sum matching [[graft.operators.Arith.dsum]]'s
    * discipline; kept in DECIMAL between the phases so the two-phase
    * composition is bit-exact with the single-phase sum. */
  def partialSum(c: Column): Column = sum(round(c, 6).cast("decimal(38,6)"))

  /** Skew-safe equi-join: the big (skewed) side salts its key into
    * `buckets` sub-keys; the small side replicates each row `buckets`
    * times, once per salt value. The join then shuffles on
    * (key, salt) — a hot key's rows spread over `buckets` tasks instead
    * of funneling into one. Results are EXACTLY the plain join's (every
    * (bigRow, smallRow) key match meets in exactly one salt bucket).
    *
    * Shuffle cost: big side unchanged; small side × buckets — the standard
    * trade, sized so (small × buckets) stays far below the big side.
    * `saltFrom` must be deterministic data on the big side (not rand()) so
    * reruns and retries produce identical partitioning.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      saltFrom: Column, buckets: Int): DataFrame = {
    // a colliding input column would be silently overwritten pre-join and
    // dropped post-join — fail loudly instead
    require(!(big.columns ++ small.columns).contains("__salt"),
      "saltedJoin inputs must not already contain a __salt column")
    // a NULL saltFrom row would never satisfy __salt = __salt and silently
    // vanish from the inner join — park NULLs in bucket 0 instead (their
    // key match behavior must be exactly the plain join's)
    val saltedBig = big.withColumn("__salt",
      coalesce(pmod(saltFrom, lit(buckets)), lit(0)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicated,
        saltedBig(bigKey) === replicated(smallKey) &&
          saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** `df.groupBy(key).agg(sums, counts)` computed as salted two-phase.
    *
    * @param sums  name → row-level expression to decimal-sum
    * @return columns: key, each sum name (double), `n_rows` (long)
    */
  def saltedSumCount(
      df: DataFrame, key: Seq[String], saltFrom: Column, buckets: Int,
      sums: Seq[(String, Column)]): DataFrame = {
    // same hazard saltedJoin guards: an existing __salt column would be
    // silently overwritten before the aggregation
    require(!df.columns.contains("__salt"),
      "saltedSumCount input must not already contain a __salt column")
    val keyCols = key.map(col)
    val partials = count(lit(1)).as("__n") +:
      sums.zipWithIndex.map { case ((_, c), i) => partialSum(c).as(s"__s$i") }
    val phase1 = df
      .withColumn("__salt", pmod(saltFrom, lit(buckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
    val finals = sum(col("__n")).as("n_rows") +:
      sums.zipWithIndex.map { case ((n, _), i) =>
        sum(col(s"__s$i")).cast("double").as(n)
      }
    phase1
      .groupBy(keyCols: _*)
      .agg(finals.head, finals.tail: _*)
  }
}
