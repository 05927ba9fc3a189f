package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Relational

/** Data-QC operator semantics on planted frames: Relational.profile (the
  * testdata has no NULLs, so the q_profile oracle row never exercises the
  * null-counting path) and Relational.outliers (the oracle row pins the
  * events answer but not WHICH rows ought to be outliers; here the answer
  * is known by construction).
  */
class ProfileSpec extends AnyFunSuite {

  test("profile counts nulls, distincts and min/max per column") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, null), (2L, "a"), (null, "a"), (3L, null))
      .toDF("k", "v")
    val cols: Seq[(String, Column => Column)] = Seq(
      ("k", _.cast("string")), ("v", c => c))
    val got = Relational.profile(df, cols).collect().map { r =>
      r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
          r.getAs[Long]("n_distinct"),
          r.getAs[String]("min_val"), r.getAs[String]("max_val")))
    }.toMap
    // count/countDistinct/min/max all ignore NULLs; distinct counts
    // count VALUES, not rows
    assert(got("k") == ((5L, 1L, 3L, "1", "3")))
    assert(got("v") == ((5L, 2L, 2L, "a", "b")))
    // output is one row per profiled column, ordered by name
    assert(Relational.profile(df, cols).collect()
      .map(_.getString(0)).toSeq == Seq("k", "v"))
  }

  test("shard manifest covers the corpus with balanced md5 shards") {
    // q_shard_manifest's usefulness claims, which the oracle row can't
    // express: the 16 deterministic shards PARTITION the corpus (counts
    // sum back to the doc count — no doc dropped or double-assigned) and
    // the md5 assignment is uniform enough to size output files by
    // (loose 2× occupancy band; the md5 hex digit is uniform, so a big
    // imbalance means the salt or digit extraction regressed).
    val s = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val m = SparkEntry.queries("q_shard_manifest")(s, d).collect()
    val nDocs = Tables(s, d, "documents").count()
    assert(m.map(_.getLong(0)).toSet == (0L until 16L).toSet,
      "expected exactly shards 0..15")
    assert(m.map(_.getLong(1)).sum == nDocs,
      s"shard counts must sum to the $nDocs corpus docs")
    val occ = m.map(_.getLong(1))
    assert(occ.max <= 2 * occ.min,
      s"shard occupancy imbalance: min=${occ.min} max=${occ.max}")
  }

  test("outliers flags exactly the planted >3-sigma point per group") {
    val s = TestSpark.spark
    import s.implicits._
    // group a: ten 0s and one 100 — for the 100: (n·x−S)² = (11·100−100)²
    // = 1e6 > 9·(n·Sxx−S²) = 9·(11·10000−10000) = 9e5; for each 0:
    // (0−100)² = 1e4 < 9e5. Group b is constant: rhs = 0 and 0 > 0 is
    // false, so a zero-variance group must flag NOTHING.
    val df = ((1 to 10).map(i => ("a", i.toLong, 0L)) ++
      Seq(("a", 11L, 100L)) ++
      (1 to 5).map(i => ("b", 100L + i, 7L)))
      .toDF("g", "id", "x")
    val got = Relational.outliers(df, "g", col("x"))
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 11L)))
    // helper columns must not leak into the output schema
    assert(Relational.outliers(df, "g", col("x")).columns.toSeq ==
      Seq("g", "id", "x"))
  }
}
