package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** `graft_cms_estimate(sketch BINARY, value LONG) -> LONG`: query a
  * count-min sketch built by Spark's public `count_min_sketch(...)`
  * aggregate — which ships WITHOUT any function to read its estimates
  * back, leaving the sketch unusable from SQL. Completes the sketch
  * family: HLL (distinct counts), Bloom (membership), CMS (frequency).
  *
  * CMS error is ONE-SIDED: estimate ≥ true count always, and overshoot
  * is ≤ eps·N with the configured confidence — the property the bounding
  * spec pins (no exact cross-engine oracle exists for sketch contents).
  *
  * CodegenFallback is fine here: the sketch operand is a scalar-subquery
  * constant and the probe side is a handful of heavy-hitter rows, not a
  * per-corpus-row hot path; the deserialized sketch is cached per
  * (expression instance, byte array) so repeated rows don't re-parse.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_estimate requires (binary, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  // cache keyed on the byte-array reference: the sketch is a broadcast
  // scalar, so every row of a partition sees the same instance. A single
  // volatile field holding an immutable (bytesRef, sketch) pair keeps the
  // memoization safe even if one instance is ever evaluated from multiple
  // threads — a reader can never observe bytes from one write paired with
  // a sketch from another.
  @transient @volatile
  private var cached: (Array[Byte], CountMinSketch) = _

  override def nullSafeEval(a: Any, b: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    var c = cached
    if (c == null || (c._1 ne bytes)) {
      c = (bytes, CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes)))
      cached = c
    }
    c._2.estimateCount(b.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  val registration: FnReg.Registration = FnReg.make(
    "graft_cms_estimate", classOf[CmsEstimate], arity = 2,
    c => CmsEstimate(c(0), c(1)))

  // consumed via SQL only (the sketch operand comes from a scalar
  // subquery) — registration is the whole public surface
  def ensureRegistered(spark: SparkSession): Unit =
    FnReg.ensure(spark, registration)
}
