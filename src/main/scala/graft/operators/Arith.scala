package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-stable floating-point aggregation.
  *
  * A plain SUM over doubles is order-dependent: Spark and DuckDB accumulate
  * partitions in different orders, so the last few ulps differ and a
  * `round(sum, 2)` can land on opposite sides of a rounding boundary. We
  * instead round each ROW to 6 decimals, sum exactly in DECIMAL(38,6)
  * (order independent), and cast the exact result back to double. At
  * 100 TB this also means partial aggregation stays exact across any number
  * of executors.
  *
  * The per-row scale of 6 is deliberate: every money column in the test
  * data is an exact 2-decimal value, so any product of ≤ 3 of them has ≤ 6
  * TRUE decimals. Rounding at the true scale is engine-stable (the fp error
  * ~1e-10 cannot cross a 5e-7 rounding boundary), whereas rounding BELOW it
  * (e.g. at 4) puts true ….xxxx50 values exactly on a boundary, where
  * Spark's BigDecimal HALF_UP and DuckDB's scaled-double round disagree.
  */
object Arith {
  private val Dec = "decimal(38,6)"

  /** Exact, order-independent sum of a double expression. */
  def dsum(c: Column): Column = sum(round(c, 6).cast(Dec)).cast("double")

  /** Boundary-proof 6-decimal quantization for DATA-DERIVED doubles:
    * floor(x·1e6 + ½)/1e6 — one IEEE expression both engines evaluate
    * bit-identically on the BINARY value. `round(x, 6)` is NOT that:
    * Spark rounds the shortest-decimal rendering while DuckDB rounds the
    * binary value, and the two disagree when a value lands on a
    * .xxxxxx5 boundary (the live r11 MMR divergence). Use this — paired
    * with [[sqlMicro6]] — for any cross-engine 6-decimal output whose
    * operand is a general double (cosines, log-probs, tf-idf, ratios of
    * counts); `round` stays correct only for exact-decimal money values
    * whose true scale is ≤ the rounding scale (the [[dsum]] class, where
    * no value can sit on a boundary). */
  def micro6(c: Column): Column = floor(c * lit(1e6) + lit(0.5d)) / lit(1e6)

  /** DuckDB-side twin of [[micro6]] (kept adjacent so they can't drift).
    * FLOOR yields an integer-valued DOUBLE; the BIGINT cast makes the
    * final division exactly Spark's long/1e6. */
  def sqlMicro6(e: String): String =
    s"(CAST(FLOOR(($e) * 1000000 + 0.5) AS BIGINT) / 1000000.0)"

  /** Deterministic mean: exact sum divided by count, floor-micro
    * quantized at 4dp ([[micro4]] — the quotient is a data-derived
    * double even when the sum is exact, so `round(x, 4)` would carry
    * the same half-mode exposure as the 6dp class). */
  def davg(c: Column): Column = micro4(dsum(c) / count(lit(1)))

  /** DuckDB-side equivalent of [[dsum]] (kept adjacent so they can't drift). */
  def sqlSum(e: String): String =
    s"CAST(SUM(CAST(ROUND($e,6) AS DECIMAL(38,6))) AS DOUBLE)"

  /** DuckDB-side equivalent of [[davg]]. */
  def sqlAvg(e: String): String = sqlMicro4(s"${sqlSum(e)}/COUNT(*)")

  /** 4-decimal [[micro6]] (ratio outputs reported at 4dp: recalls,
    * rates). */
  def micro4(c: Column): Column = floor(c * lit(1e4) + lit(0.5d)) / lit(1e4)

  /** DuckDB-side twin of [[micro4]]. */
  def sqlMicro4(e: String): String =
    s"(CAST(FLOOR(($e) * 10000 + 0.5) AS BIGINT) / 10000.0)"
}
