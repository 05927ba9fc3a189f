package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-stable floating-point aggregation.
  *
  * A plain SUM over doubles is order-dependent: Spark and DuckDB accumulate
  * partitions in different orders, so the last few ulps differ and a
  * `round(sum, 2)` can land on opposite sides of a rounding boundary. We
  * instead round each ROW to 4 decimals (both engines see bit-identical row
  * values, so they round identically), sum exactly in DECIMAL(38,6) (order
  * independent), and cast the exact result back to double. At 100 TB this
  * also means partial aggregation stays exact across any number of
  * executors.
  */
object Arith {
  private val Dec = "decimal(38,6)"

  /** Exact, order-independent sum of a double expression. */
  def dsum(c: Column): Column = sum(round(c, 4).cast(Dec)).cast("double")

  /** Deterministic mean: exact sum divided by count, rounded. */
  def davg(c: Column): Column = round(dsum(c) / count(lit(1)), 4)

  /** DuckDB-side equivalent of [[dsum]] (kept adjacent so they can't drift). */
  def sqlSum(e: String): String =
    s"CAST(SUM(CAST(ROUND($e,4) AS DECIMAL(38,6))) AS DOUBLE)"

  /** DuckDB-side equivalent of [[davg]]. */
  def sqlAvg(e: String): String = s"ROUND(${sqlSum(e)}/COUNT(*), 4)"
}
