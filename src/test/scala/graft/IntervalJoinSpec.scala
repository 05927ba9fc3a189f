package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

/** Unit tests for the bucketed interval join (Joins.intervalJoin):
  * exactly-once pairing for intervals spanning many buckets, half-open
  * boundary semantics, empty-interval elision, and the plan shape that
  * justifies its existence (equi-join, never a nested loop).
  */
class IntervalJoinSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def pairs(bucketWidth: Long): Set[(Long, String)] = {
    val s = spark
    import s.implicits._
    val points = Seq(0L, 5L, 10L, 15L, 99L, 100L, 250L).toDF("t")
    val intervals = Seq(
      ("a", 0L, 10L),    // half-open: matches 0,5 but not 10
      ("b", 10L, 11L),   // single-bucket sliver: matches exactly 10
      ("c", 5L, 200L),   // spans many buckets: 5,10,15,99,100
      ("d", 50L, 50L),   // empty (hi == lo): matches nothing
      ("e", 60L, 40L)    // inverted (hi < lo): matches nothing
    ).toDF("iv", "lo", "hi")
    Joins.intervalJoin(points, intervals, "t", "lo", "hi", bucketWidth)
      .select("t", "iv").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
  }

  private val expected = Set(
    (0L, "a"), (5L, "a"),
    (10L, "b"),
    (5L, "c"), (10L, "c"), (15L, "c"), (99L, "c"), (100L, "c"))

  test("pairs each point with exactly its containing intervals") {
    assert(pairs(bucketWidth = 16L) === expected)
  }

  test("result is bucket-width invariant (no duplicate pair per bucket)") {
    // A multi-bucket interval is replicated once per overlapped bucket;
    // the point's single bucket must select exactly one replica. Any
    // dedup bug shows up as a Set that silently hides multiset dupes, so
    // compare counts too, across widths straddling the interval lengths.
    for (w <- Seq(1L, 3L, 64L, 1000L)) {
      assert(pairs(w) === expected, s"bucketWidth=$w")
      val s = spark
      import s.implicits._
      val points = Seq(0L, 5L, 10L, 15L, 99L, 100L, 250L).toDF("t")
      val intervals = Seq(("c", 5L, 200L)).toDF("iv", "lo", "hi")
      val n = Joins.intervalJoin(points, intervals, "t", "lo", "hi", w).count()
      assert(n === 5L, s"bucketWidth=$w produced duplicate pairs")
    }
  }

  test("plans as an equi-join on the bucket, not a nested loop") {
    val s = spark
    import s.implicits._
    val points = s.range(0, 10000).select(col("id").as("t"))
    val intervals = s.range(0, 500)
      .select(col("id").as("iv"), (col("id") * 20).as("lo"),
        (col("id") * 20 + 40).as("hi"))
    val p = Joins.intervalJoin(points, intervals, "t", "lo", "hi", 32L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"interval join fell back to a nested loop:\n$p")
  }

  test("refuses reserved column names") {
    val s = spark
    import s.implicits._
    val points = Seq(1L).toDF("t").withColumn("__pb", lit(0L))
    val intervals = Seq((0L, 10L)).toDF("lo", "hi")
    intercept[IllegalArgumentException] {
      Joins.intervalJoin(points, intervals, "t", "lo", "hi", 16L)
    }
  }

  test("refuses non-integral columns (exact bucketing contract)") {
    val s = spark
    import s.implicits._
    val points = Seq(1.5).toDF("t")
    val intervals = Seq((0L, 10L)).toDF("lo", "hi")
    intercept[IllegalArgumentException] {
      Joins.intervalJoin(points, intervals, "t", "lo", "hi", 16L)
    }
  }

  test("exact past 2^53: bucketing never goes through a double") {
    // floor(col / w) computes in double precision: (2^60 - 1) rounds UP
    // to 2^60 as a double, so its double-floored bucket index differs
    // from the exact one. The pmod formulation keeps every value in
    // long arithmetic — points at magnitudes like unix nanos pair
    // exactly. Brute-force oracle over all (point, interval) pairs.
    val s = spark
    import s.implicits._
    val base = 1L << 60 // well past 2^53
    val w = 1000L
    val pts = Seq(base - 1001, base - 1000, base - 1, base,
      base + 999, base + 1000, Long.MaxValue - 1)
    val ivs = Seq(
      ("lo_edge", base - 1000, base),
      ("hi_edge", base, base + 1000),
      ("straddle", base - 1, base + 1),
      ("top", Long.MaxValue - 500, Long.MaxValue))
    val expect = (for {
      p <- pts; (n, lo, hi) <- ivs if p >= lo && p < hi
    } yield (p, n)).toSet
    val got = Joins.intervalJoin(
        pts.toDF("t"), ivs.toDF("iv", "lo", "hi"), "t", "lo", "hi", w)
      .select("t", "iv").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === expect)
  }

  test("randomized sweep matches a brute-force oracle (seeded)") {
    // 150 points × 60 intervals across negative, small, and >2^53
    // magnitudes, several bucket widths straddling the interval lengths —
    // every (point ∈ [lo, hi)) pair must appear exactly once.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val magnets = Seq(0L, -500000L, 1L << 60)
    def near(m: Long): Long = m + rnd.between(-30000L, 30000L)
    val pts = Seq.fill(150)(near(magnets(rnd.nextInt(magnets.size))))
    val ivs = Seq.tabulate(60) { i =>
      val lo = near(magnets(rnd.nextInt(magnets.size)))
      (i.toLong, lo, lo + rnd.between(-1000L, 50000L))
    }
    val expect = (for {
      p <- pts; (id, lo, hi) <- ivs if p >= lo && p < hi
    } yield (p, id)).groupBy(identity).view.mapValues(_.size).toMap
    for (w <- Seq(7L, 1024L, 99991L)) {
      val got = Joins.intervalJoin(
          pts.toDF("t"), ivs.toDF("iv", "lo", "hi"), "t", "lo", "hi", w)
        .select("t", "iv").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == expect, s"bucketWidth=$w diverged from brute force")
    }
  }

  test("negative values bucket by floor, not truncation") {
    // toward-zero division would put -1 in bucket 0 alongside +1; the
    // pmod lower-bound keeps floor semantics so [-1000, 0) pairs with
    // -1 and not with 0.
    val s = spark
    import s.implicits._
    val pts = Seq(-1001L, -1000L, -1L, 0L, 1L)
    val ivs = Seq(("neg", -1000L, 0L), ("pos", 0L, 1000L))
    val expect = (for {
      p <- pts; (n, lo, hi) <- ivs if p >= lo && p < hi
    } yield (p, n)).toSet
    val got = Joins.intervalJoin(
        pts.toDF("t"), ivs.toDF("iv", "lo", "hi"), "t", "lo", "hi", 64L)
      .select("t", "iv").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === expect)
  }
}
