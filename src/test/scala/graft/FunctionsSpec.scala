package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CosineSim, SimHash32}

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

  test("SimHash32 matches the declarative formulation on adversarial strings") {
    val s = spark
    import s.implicits._
    // empty text, lone/repeated spaces (empty tokens), unicode, long and
    // duplicate tokens — every split/md5 edge the native loop must mirror
    val texts = Seq(
      "", " ", "  ", "a", "a b", "a  b", "a a a", "héllo wörld",
      "日本語 トークン 空白", "x " * 50 + "x", "tab\tstays one-token",
      (1 to 40).map(i => s"tok$i").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val native = df
      .select($"doc_id", SimHash32(s, $"text").as("simhash"))
      .as[(Long, Long)].collect().toMap
    // the exact pipeline the expression replaced (operators/Dedup r2 form)
    val declarative = df
      .select($"doc_id",
        explode(array_distinct(split($"text", " "))).as("tok"))
      .select($"doc_id", posexplode(split(md5($"tok"), "")).as(Seq("j", "c")))
      .groupBy("doc_id", "j")
      .agg(sum(when($"c".isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L)
        .otherwise(-1L)).as("vote"))
      .groupBy("doc_id")
      .agg(sum(when($"vote" > 0, pow(lit(2.0), $"j".cast("double")))
        .otherwise(0.0d)).cast("long").as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(native == declarative)
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

  test("bloom sketchSize tracks the build side's statistics") {
    val s = spark
    import s.implicits._
    def build(n: Int) = (1 to n).map(_.toLong).toDF("k")
    val (smallItems, smallBits) = graft.functions.BloomFns.sketchSize(build(100))
    val (bigItems, bigBits) = graft.functions.BloomFns.sketchSize(build(500000))
    // a 5000× larger build side must get a larger sketch — the point of
    // stats-based sizing over the old hardcoded constants
    assert(bigItems > smallItems && bigBits > smallBits)
    // tiny build sides are floored, never degenerate
    assert(smallItems >= 4096 && smallBits >= smallItems)
    // items come from plan stats: a LocalRelation knows its exact rowCount
    assert(bigItems == 500000L)
    // optimal-m formula at the default fpp=0.03: ~7.3 bits/item
    assert(bigBits > bigItems * 7 && bigBits < bigItems * 8)
    // the broadcast cap binds rather than growing without bound
    val (_, cappedBits) =
      graft.functions.BloomFns.sketchSize(build(100), maxBits = 1024L)
    assert(cappedBits == 1024L)
  }
}
