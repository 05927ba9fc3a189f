package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CosineSim
import graft.plans.{CosineJoinStrategy, RewriteCosineSelfJoin}

/** The custom LogicalPlan + Rule + Strategy + SparkPlan path: a plain
  * declarative cosine self-join must auto-dispatch to the blocked-GEMM
  * physical operator once the corpus exceeds the configured broadcast
  * budget — with bit-identical results.
  */
class CosineRewriteSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** The canonical declarative formulation the rule recognizes. */
  private def declarativeJoin(s: SparkSession): DataFrame = {
    val e = Tables(s, sfDir, "embeddings")
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_v"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_v"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", round(CosineSim(s, col("a_v"), col("b_v")), 6))
      .filter(col("cos") >= 0.45)
      .select("a_id", "b_id", "cos")
  }

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("cosine self-join rewrites to BlockedCosineJoinExec past the size gate") {
    val s = spark
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ RewriteCosineSelfJoin
    s.experimental.extraStrategies =
      s.experimental.extraStrategies :+ CosineJoinStrategy
    try {
      // default 64 MB gate: the sf0.001 corpus stays on the BNLJ plan
      val base = declarativeJoin(s)
      assert(!base.queryExecution.executedPlan.toString
        .contains("BlockedCosineJoin"))
      val want = rows(base)
      assert(want.nonEmpty)

      // gate at 0 bytes: the SAME DataFrame code must plan the custom exec
      // (plan strings strip the "Exec" suffix; "!" would flag missing input)
      s.conf.set(RewriteCosineSelfJoin.ConfKey, "0")
      val rewritten = declarativeJoin(s)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("BlockedCosineJoin") &&
        !plan.contains("!BlockedCosineJoin"), plan)
      assert(rows(rewritten) == want)
    } finally {
      s.conf.unset(RewriteCosineSelfJoin.ConfKey)
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations.filterNot(_ == RewriteCosineSelfJoin)
      s.experimental.extraStrategies =
        s.experimental.extraStrategies.filterNot(_ == CosineJoinStrategy)
    }
  }

  test("rewrite preserves the declarative plan's zero-norm NaN semantics") {
    // Spark's NaN-is-largest comparison PASSES a NaN cosine through any
    // threshold, so a declarative join over a corpus with a zero-norm
    // vector returns its pairs with cos = NaN. The rewrite must return
    // the same rows — the API paths (cosinePairs) drop zero-norms up
    // front, but a SQL user's plan gets whatever semantics it wrote.
    val s = spark
    import s.implicits._
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ RewriteCosineSelfJoin
    s.experimental.extraStrategies =
      s.experimental.extraStrategies :+ CosineJoinStrategy
    try {
      val corpus = Seq(
        (0L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero-norm
        (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
        (2L, Array(1.0f, 0.1f, 0.0f, 0.0f))
      ).toDF("vec_id", "embedding")
      def selfJoin(e: org.apache.spark.sql.DataFrame) = {
        val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_v"))
        val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_v"))
        a.join(b, col("a_id") < col("b_id"))
          .withColumn("cos", round(CosineSim(s, col("a_v"), col("b_v")), 6))
          .filter(col("cos") >= 0.9)
          .select("a_id", "b_id", "cos")
      }
      // NaN-safe normalization: tuple equality on primitive NaN is false
      def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.getDouble(2).isNaN) "NaN" else r.getDouble(2).toString))
        .toSet
      val want = norm(selfJoin(corpus)) // BNLJ path
      assert(want.exists(_._3 == "NaN"), s"no NaN pair in baseline: $want")
      s.conf.set(RewriteCosineSelfJoin.ConfKey, "0")
      val rewritten = selfJoin(corpus)
      assert(rewritten.queryExecution.executedPlan.toString
        .contains("BlockedCosineJoin"))
      assert(norm(rewritten) == want)
    } finally {
      s.conf.unset(RewriteCosineSelfJoin.ConfKey)
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations.filterNot(_ == RewriteCosineSelfJoin)
      s.experimental.extraStrategies =
        s.experimental.extraStrategies.filterNot(_ == CosineJoinStrategy)
    }
  }

  test("rule refuses joins whose semantics it cannot absorb") {
    val s = spark
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ RewriteCosineSelfJoin
    s.experimental.extraStrategies =
      s.experimental.extraStrategies :+ CosineJoinStrategy
    s.conf.set(RewriteCosineSelfJoin.ConfKey, "0")
    try {
      // extra predicate on a_id: dropping it would change results — the
      // rule must leave the plan alone
      val e = Tables(s, sfDir, "embeddings")
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_v"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_v"))
      val guarded = a.join(b, col("a_id") < col("b_id") && col("a_id") < 100)
        .withColumn("cos", round(CosineSim(s, col("a_v"), col("b_v")), 6))
        .filter(col("cos") >= 0.45)
        .select("a_id", "b_id", "cos")
      assert(!guarded.queryExecution.executedPlan.toString
        .contains("BlockedCosineJoin"))
      // non-self join (different corpora): must not rewrite
      val half = e.filter(col("vec_id") < 250)
        .select(col("vec_id").as("b_id"), col("embedding").as("b_v"))
      val mixed = a.join(half, col("a_id") < col("b_id"))
        .withColumn("cos", round(CosineSim(s, col("a_v"), col("b_v")), 6))
        .filter(col("cos") >= 0.45)
        .select("a_id", "b_id", "cos")
      assert(!mixed.queryExecution.executedPlan.toString
        .contains("BlockedCosineJoin"))
      // a threshold over a DIFFERENT cosine (self-similarity sanity check,
      // not the pair cosine) must not be absorbed as the pair threshold
      val selfCos = a.join(b, col("a_id") < col("b_id"))
        .withColumn("cos", round(CosineSim(s, col("a_v"), col("b_v")), 6))
        .filter(round(CosineSim(s, col("a_v"), col("a_v")), 6) >= 0.99)
        .select("a_id", "b_id", "cos")
      assert(!selfCos.queryExecution.executedPlan.toString
        .contains("BlockedCosineJoin"))
      // array<double> embeddings (legal since CosineSim widened): the exec
      // kernel reads raw float arrays, so the rule must NOT fire — a
      // rewrite would reinterpret 8-byte elements as floats
      val ed = Tables(s, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val ad = ed.select(col("vec_id").as("a_id"), col("embedding").as("a_v"))
      val bd = ed.select(col("vec_id").as("b_id"), col("embedding").as("b_v"))
      val doubles = ad.join(bd, col("a_id") < col("b_id"))
        .withColumn("cos", round(CosineSim(s, col("a_v"), col("b_v")), 6))
        .filter(col("cos") >= 0.45)
        .select("a_id", "b_id", "cos")
      val dPlan = doubles.queryExecution.executedPlan.toString
      assert(!dPlan.contains("BlockedCosineJoin"), dPlan)
      // and the un-rewritten double path still computes correct cosines
      assert(rows(doubles) == rows(declarativeJoin(s)))
    } finally {
      s.conf.unset(RewriteCosineSelfJoin.ConfKey)
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations.filterNot(_ == RewriteCosineSelfJoin)
      s.experimental.extraStrategies =
        s.experimental.extraStrategies.filterNot(_ == CosineJoinStrategy)
    }
  }
}
