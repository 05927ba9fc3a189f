package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.CosineSim

/** Session extension wiring: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) makes the engine's native
  * functions available to plain SQL, e.g.
  * `SELECT cosine_sim(a.embedding, b.embedding)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(CosineSim.registration)
  }
}
