package graft


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the 100 TB co-located-join technique. Writing both fact
  * tables bucketed by the join key lets the join run with NO shuffle
  * exchange at read time — the scan partitioning satisfies the join's
  * distribution requirement.
  */
class BucketingSpec extends AnyFunSuite {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val s = spark
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue

    Tables(s, "/root/testdata/sf0.001", "lineitem")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables(s, "/root/testdata/sf0.001", "orders")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    try {
      val joined = s.table("li_bucketed")
        .join(s.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinLine = plan.linesIterator
        .find(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
      assert(joinLine.isDefined, s"no join in plan:\n$plan")
      // the join inputs must NOT be re-shuffled: the only allowed Exchange
      // is the one AFTER the join for the groupBy on o_orderstatus
      val joinIdx = plan.indexOf(joinLine.get)
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey") &&
        !belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n$plan")
      // and it actually runs correctly
      val n = joined.agg(sum(col("n"))).collect()(0).getLong(0)
      assert(n == 6000L)
    } finally {
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS ord_bucketed")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  private def spark = TestSpark.spark
}
