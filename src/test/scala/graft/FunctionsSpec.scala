package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CosineSim

/** Native function surface: the codegen'd CosineSim expression and its SQL
  * registration path.
  */
class FunctionsSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("cosine_sim matches a hand-computed value and the HOF formulation") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f, 1.0f), Array(1.0f, 0.0f, 1.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))
    ).toDF("a", "b")
    val got = df.select(round(CosineSim(s, $"a", $"b"), 6)).as[Double].collect()
    val hof = df.select(round(
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0d), (acc, x) => acc + x) /
        (sqrt(aggregate(transform($"a", x => x.cast("double") * x.cast("double")),
          lit(0.0d), (acc, x) => acc + x)) *
         sqrt(aggregate(transform($"b", x => x.cast("double") * x.cast("double")),
           lit(0.0d), (acc, x) => acc + x))), 6)).as[Double].collect()
    assert(got.toSeq == hof.toSeq)
    assert(got(0) == 1.0 && got(1) == 0.0)
    // 32/(sqrt(14)*sqrt(77)) = 0.974631...
    assert(got(2) == 0.974632)
  }

  test("cosine_sim is callable from plain SQL after registration") {
    val s = spark
    CosineSim.ensureRegistered(s)
    val r = s.sql(
      """SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
                           array(cast(1.0 as float), cast(0.0 as float))) AS c""")
      .collect()(0).getDouble(0)
    assert(r == 1.0)
  }

  test("cosine_sim propagates nulls") {
    val s = spark
    CosineSim.ensureRegistered(s)
    val r = s.sql(
      "SELECT cosine_sim(cast(null as array<float>), array(cast(1.0 as float)))")
      .collect()(0)
    assert(r.isNullAt(0))
  }
}
