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

  /** Deterministic mean: exact sum divided by count, rounded. */
  def davg(c: Column): Column = round(dsum(c) / count(lit(1)), 4)

  /** DuckDB-side equivalent of [[dsum]] (kept adjacent so they can't drift). */
  def sqlSum(e: String): String =
    s"CAST(SUM(CAST(ROUND($e,6) AS DECIMAL(38,6))) AS DOUBLE)"

  /** DuckDB-side equivalent of [[davg]]. */
  def sqlAvg(e: String): String = s"ROUND(${sqlSum(e)}/COUNT(*), 4)"
}
