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

  test("salted join equals the plain join row-for-row") {
    val s = spark
    val li = Tables(s, sfDir, "lineitem")
    val sup = Tables(s, sfDir, "supplier")
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .select("l_orderkey", "l_linenumber", "s_suppkey", "s_nationkey")
      .collect()
    for (buckets <- Seq(1, 8)) {
      val salted = Salt.saltedJoin(li, sup, "l_suppkey", "s_suppkey",
        hash(col("l_orderkey")), buckets)
        .select("l_orderkey", "l_linenumber", "s_suppkey", "s_nationkey")
        .collect()
      assert(key(salted) == key(plain), s"mismatch at buckets=$buckets")
    }
  }

  test("salted join shuffles on (key, salt) when broadcast is impossible") {
    // the scenario the operator exists for: the small side is too big to
    // broadcast, the plain shuffle join funnels a hot key into one task —
    // salting must produce a SHUFFLE join keyed on BOTH the key and the
    // salt (the salt in the partitioning is the whole point)
    val s = spark
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = Salt.saltedJoin(
        Tables(s, sfDir, "lineitem"), Tables(s, sfDir, "supplier"),
        "l_suppkey", "s_suppkey", hash(col("l_orderkey")), 8)
        .queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(!p.contains("BroadcastHashJoin"), p)
      val joinLine = p.linesIterator
        .find(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
        .get
      assert(joinLine.contains("__salt"), s"salt not in join keys: $joinLine")
    } finally
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("approx_count_distinct lands within 10% of exact") {
    val s = spark
    val r = operators.Relational.approxDistinctRaw(s, sfDir)
      .join(Tables(s, sfDir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("exact_supp")), "l_returnflag")
      .select(col("hll_supp").as("approx_supp"), col("exact_supp"))
      .collect()
    r.foreach { row =>
      val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
      assert(math.abs(a - e) / e < 0.10, s"approx $a vs exact $e")
    }
  }
}
