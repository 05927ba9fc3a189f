package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Arith
import graft.plans.Salt

/** Salted two-phase aggregation must be BIT-identical to the single-phase
  * aggregate (decimal partials are associative), for any bucket count.
  */
class SaltSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("salted sum/count equals single-phase dsum/count exactly") {
    val s = spark
    val li = Tables(s, sfDir, "lineitem")
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        Arith.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
      .collect().map(_.toSeq)
    for (buckets <- Seq(1, 7, 64)) {
      val salted = Salt.saltedSumCount(
        li, Seq("l_returnflag"), col("l_orderkey"), buckets,
        Seq("sum_qty" -> col("l_quantity")))
        .select("l_returnflag", "n_rows", "sum_qty")
        .orderBy("l_returnflag")
        .collect().map(_.toSeq)
      assert(salted.toSeq == plain.toSeq, s"mismatch at buckets=$buckets")
    }
  }

  test("approx_count_distinct lands within 10% of exact") {
    val s = spark
    val r = SparkEntry.queries("q_approx_distinct")(s, sfDir)
      .join(Tables(s, sfDir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("exact_supp")), "l_returnflag")
      .select(col("approx_supp"), col("exact_supp"))
      .collect()
    r.foreach { row =>
      val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
      assert(math.abs(a - e) / e < 0.10, s"approx $a vs exact $e")
    }
  }
}
