package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{BloomFns, CmsEstimate, CosineSim, DotProduct,
  SimHash32}
import graft.plans.{CosineJoinStrategy, RewriteCosineSelfJoin,
  RewritePrefixWindow}

/** Session extension wiring: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) makes the engine's native
  * functions available to plain SQL (e.g.
  * `SELECT cosine_sim(a.embedding, b.embedding)`) and installs the
  * cosine-self-join optimizer rule + planner strategy, so oversized
  * declarative similarity joins auto-dispatch to the blocked-GEMM physical
  * operator (see graft.plans.CosineJoin).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(CosineSim.registration)
    ext.injectFunction(DotProduct.registration)
    ext.injectFunction(SimHash32.registration)
    ext.injectFunction(BloomFns.aggRegistration)
    ext.injectFunction(BloomFns.containsRegistration)
    ext.injectFunction(CmsEstimate.registration)
    ext.injectOptimizerRule(_ => RewriteCosineSelfJoin)
    ext.injectOptimizerRule(_ => RewritePrefixWindow)
    ext.injectPlannerStrategy(_ => CosineJoinStrategy)
  }
}
