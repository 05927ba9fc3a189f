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
  * shuffle carries one 64-double buffer per group per partition, never the
  * vectors.
  */
object VecCentroid
    extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long),
      a: Array[Float]): (Array[Double], Long) = {
    val acc = if (b._1.isEmpty) new Array[Double](a.length) else b._1
    var i = 0
    while (i < a.length) { acc(i) += a(i).toDouble; i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long),
      y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      var i = 0
      while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Array[Double] =
    b._1.map(s => BigDecimal(s / b._2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
