package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Relational

/** Profiling operator semantics (Relational.profile) on a planted frame —
  * the testdata has no NULLs, so the q_profile oracle row never exercises
  * the null-counting path; this does.
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
}
