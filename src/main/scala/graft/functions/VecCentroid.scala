package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the reference's "reducer" concept as a first-class
  * aggregate, SURVEY.md §2.4 UDAF row): element-wise centroid of a group
  * of embedding vectors.
  *
  * Partial aggregation is native: `reduce` runs map-side per partition,
  * `merge` combines the (sum, count) buffers at the exchange — so the
  * shuffle carries one 64-long buffer per group per partition, never the
  * vectors.
  *
  * Elements accumulate as FIXED-POINT MICROS (`floor(x·1e6 + 0.5)`): long
  * addition is exact and order-independent, so the centroid is identical
  * across any partitioning — a double accumulator would carry the
  * partition-order-dependent ulps that the Arith decimal discipline exists
  * to avoid, and could flip a 6-decimal rounding boundary vs the oracle.
  */
object VecCentroid
    extends Aggregator[Array[Float], (Array[Long], Long), Array[Double]] {

  override def zero: (Array[Long], Long) = (Array.emptyLongArray, 0L)

  override def reduce(b: (Array[Long], Long),
      a: Array[Float]): (Array[Long], Long) = {
    val acc = if (b._1.isEmpty) new Array[Long](a.length) else b._1
    // ragged dimensions have no defined centroid — fail loud: silently
    // truncating (or crashing only when the SHORTER vector arrives first)
    // would make the result partition-order dependent
    require(a.length == acc.length,
      s"VecCentroid: mixed vector dimensions in one group " +
        s"(${a.length} vs ${acc.length})")
    var i = 0
    while (i < a.length) {
      acc(i) += math.floor(a(i).toDouble * 1e6 + 0.5).toLong
      i += 1
    }
    (acc, b._2 + 1)
  }

  override def merge(x: (Array[Long], Long),
      y: (Array[Long], Long)): (Array[Long], Long) = {
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      require(x._1.length == y._1.length,
        s"VecCentroid: mixed vector dimensions across partitions " +
          s"(${x._1.length} vs ${y._1.length})")
      var i = 0
      while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
  }

  // floor(q·1e6 + ½)/1e6, not BigDecimal HALF_UP: BigDecimal(double)
  // rounds the SHORTEST-DECIMAL rendering (Spark round(x, 6) semantics),
  // which disagrees with the oracle's binary-value FLOOR form on
  // .xxxxxx5-boundary quotients — the same half-mode class migrated
  // engine-wide since r12 (see graft.operators.Arith.micro6). The ops
  // mirror the oracle's sqlMicro6(micros/(cnt·1e6)) exactly.
  override def finish(b: (Array[Long], Long)): Array[Double] =
    b._1.map { micros =>
      val q = micros.toDouble / (b._2.toDouble * 1e6)
      math.floor(q * 1e6 + 0.5) / 1e6
    }

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    ExpressionEncoder[(Array[Long], Long)]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
