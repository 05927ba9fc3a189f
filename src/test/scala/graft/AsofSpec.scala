package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

/** Unit tests for the generic as-of join (Joins.asof): strict vs
  * non-strict time matching, key isolation, and no-match nulls.
  */
class AsofSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def run(strict: Boolean): Map[(Long, Long), Option[Long]] = {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, 100L), // key 1, t=10
      (1L, 20L, 101L),
      (2L, 10L, 102L), // key 2: right side has only t=10 and t=30
      (3L, 5L, 103L)   // key 3: no right rows at or before t=5
    ).toDF("k", "t", "lid")
    // tiebreak column ("lid") must exist on both sides — on the right it
    // orders right rows at equal times (here: the rid doubles as it)
    val right = Seq(
      (1L, 10L, 200L, 200L),
      (1L, 15L, 201L, 201L),
      (2L, 10L, 202L, 202L),
      (2L, 30L, 203L, 203L),
      (3L, 50L, 204L, 204L)
    ).toDF("k", "t", "rid", "lid")
    Joins.asof(left, right, key = "k", time = "t", tiebreak = "lid",
      rightPayload = Seq("rid"), strict = strict)
      .withColumn("rid", col("__match.rid").cast("long"))
      .select("k", "lid", "rid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
  }

  test("non-strict: right row at the exact left time matches") {
    val m = run(strict = false)
    assert(m((1L, 100L)) == Some(200L)) // t=10 matches right t=10
    assert(m((1L, 101L)) == Some(201L)) // t=20 → latest right t=15
    assert(m((2L, 102L)) == Some(202L)) // t=10 matches right t=10, not t=30
    assert(m((3L, 103L)) == None)       // nothing at or before t=5
  }

  test("strict: right row at the exact left time is excluded") {
    val m = run(strict = true)
    assert(m((1L, 100L)) == None)       // right t=10 excluded, nothing earlier
    assert(m((1L, 101L)) == Some(201L)) // t=15 < 20 still matches
    assert(m((2L, 102L)) == None)
    assert(m((3L, 103L)) == None)
  }

  test("randomized sweep matches a brute-force oracle (seeded)") {
    // 5 keys, 80 rows a side, times drawn from 0..40 so ties (both
    // left-right and right-right) are dense — the contract under test:
    //   eligible right rows: rt < lt (strict) / rt ≤ lt (non-strict),
    //   winner = max by (time, tiebreak).
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(80)(i =>
      (rnd.between(1L, 6L), rnd.between(0L, 41L), 100L + i))
    val right = Seq.tabulate(80)(i =>
      (rnd.between(1L, 6L), rnd.between(0L, 41L), 500L + i))
    for (strict <- Seq(true, false)) {
      val got = Joins.asof(
          left.toDF("k", "t", "lid"),
          right.map(r => (r._1, r._2, r._3, r._3)).toDF("k", "t", "rid", "lid"),
          key = "k", time = "t", tiebreak = "lid",
          rightPayload = Seq("rid"), strict = strict)
        .withColumn("rid", col("__match.rid").cast("long"))
        .select("k", "lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
      val want = left.map { case (k, lt, lid) =>
        val elig = right.filter(r => r._1 == k &&
          (if (strict) r._2 < lt else r._2 <= lt))
        (k, lid) -> (if (elig.isEmpty) None
                     else Some(elig.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(got == want, s"strict=$strict diverged from brute force")
    }
  }

  private def nearestPlanted(): Map[Long, (Option[Long], Option[Long])] = {
    val s = spark
    import s.implicits._
    val left = Seq( // (k, t_us, lid)
      (1L, 12L, 100L), // equidistant 10|14 → tie prefers backward (200)
      (1L, 15L, 101L), // 14 at d1 beats 20 at d5 → 201
      (1L, 20L, 102L), // same-ts rights d0 → backward = max tiebreak (211)
      (1L, 100L, 103L), // nearest right d80 > tol 10 → null
      (2L, 5L, 104L)   // key has no rights → null
    ).toDF("k", "t_us", "lid").withColumn("ts", timestamp_micros(col("t_us")))
    val right = Seq( // (k, t_us, rid, lid)
      (1L, 10L, 200L, 200L),
      (1L, 14L, 201L, 201L),
      (1L, 20L, 210L, 210L),
      (1L, 20L, 211L, 211L)
    ).toDF("k", "t_us", "rid", "lid")
      .withColumn("ts", timestamp_micros(col("t_us")))
    Joins.asofNearest(left, right, key = "k", time = "ts", tiebreak = "lid",
        rightPayload = Seq("rid"), toleranceUs = 10L)
      .select(col("lid"), col("__match.rid").cast("long").as("rid"),
        (unix_micros(col("__match.ts")) - col("t_us")).as("delta"))
      .collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
  }

  test("nearest: tie→backward, same-ts tiebreaks, tolerance, key isolation") {
    val m = nearestPlanted()
    assert(m(100L) == ((Some(200L), Some(-2L))), "equidistant tie not backward")
    assert(m(101L) == ((Some(201L), Some(-1L))), "closer forward-of-backward")
    assert(m(102L) == ((Some(211L), Some(0L))), "same-ts backward max tiebreak")
    assert(m(103L) == ((None, None)), "tolerance not enforced")
    assert(m(104L) == ((None, None)), "keys leaked across partitions")
  }

  test("nearest: randomized sweep matches a brute-force oracle (seeded)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val tol = 6L
    val left = Seq.tabulate(80)(i =>
      (rnd.between(1L, 6L), rnd.between(0L, 41L), 100L + i))
    val right = Seq.tabulate(80)(i =>
      (rnd.between(1L, 6L), rnd.between(0L, 41L), 500L + i))
    val got = Joins.asofNearest(
        left.toDF("k", "t_us", "lid")
          .withColumn("ts", timestamp_micros(col("t_us"))),
        right.map(r => (r._1, r._2, r._3, r._3))
          .toDF("k", "t_us", "rid", "lid")
          .withColumn("ts", timestamp_micros(col("t_us"))),
        key = "k", time = "ts", tiebreak = "lid",
        rightPayload = Seq("rid"), toleranceUs = tol)
      .select(col("lid"), col("__match.rid").cast("long").as("rid"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val want = left.map { case (k, lt, lid) =>
      val back = right.filter(r => r._1 == k && r._2 <= lt && lt - r._2 <= tol)
        .sortBy(r => (r._2, r._3)).lastOption
      val fwd = right.filter(r => r._1 == k && r._2 >= lt && r._2 - lt <= tol)
        .sortBy(r => (r._2, r._3)).headOption
      lid -> ((back, fwd) match {
        case (Some(b), Some(f)) =>
          if (lt - b._2 <= f._2 - lt) Some(b._3) else Some(f._3)
        case (Some(b), None) => Some(b._3)
        case (None, Some(f)) => Some(f._3)
        case _ => None
      })
    }.toMap
    assert(got == want, "nearest diverged from brute force")
  }
}
