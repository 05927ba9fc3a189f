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
}
