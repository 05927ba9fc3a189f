package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Graph

/** PageRank operator semantics (operators/Graph.scala). */
class GraphSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("pagerank matches the hand-computed fixed-point on a path graph") {
    // a–b–c symmetrized: outdeg a=1, b=2, c=1; micro-rank units.
    // round 1: r(a)=⌊150000+0.85·⌊1e6/2+½⌋+½⌋=575000, r(b)=150000+0.85·2e6
    //          =1850000, r(c)=575000
    // round 2: b's split is ⌊1850000/2+½⌋=925000 → r(a)=r(c)=936250;
    //          a+c send 575000 each → r(b)=150000+0.85·1150000=1127500
    val s = spark
    import s.implicits._
    val pairs = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val got = Graph.pagerank(s, edges, 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 936250L, "b" -> 1127500L, "c" -> 936250L))
    // rank mass is conserved across a round (each node's rank splits
    // fully over its out-edges; teleport re-injects 0.15 per node):
    // 936250 + 1127500 + 936250 = 3,000,000 micro-units = n exactly
    assert(got.values.sum == 3000000L)
  }

  test("q_pagerank is deterministic across runs") {
    // the fixed-point micro-unit arithmetic has no accumulation-order
    // dependence — two full runs must agree bit-for-bit (the cross-engine
    // half of this claim is the DuckDB oracle row)
    val s = spark
    val once = SparkEntry.queries("q_pagerank")(s, sfDir).collect().toSeq
    val twice = SparkEntry.queries("q_pagerank")(s, sfDir).collect().toSeq
    assert(once == twice)
    assert(once.nonEmpty)
    // every rank is at least the teleport floor
    assert(once.forall(_.getAs[Double]("rank") >= 0.15))
  }
}
