package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Shared registration plumbing for the engine's native SQL functions —
  * one definition of the (identifier, info, builder) triple shape, the
  * idempotent session registration, and an arity guard (a mis-called SQL
  * function fails with a clear message instead of IndexOutOfBounds).
  */
private[graft] object FnReg {

  type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  def make(name: String, clazz: Class[_], arity: Int,
      builder: Seq[Expression] => Expression): Registration = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == arity,
        s"$name expects $arity argument(s), got ${children.size}")
      builder(children)
    })

  /** Idempotently register in a session's function registry (for sessions
    * not built with [[graft.GraftExtensions]]). */
  def ensure(spark: SparkSession, reg: Registration): Unit = {
    val (id, info, builder) = reg
    val r = spark.sessionState.functionRegistry
    if (!r.functionExists(id)) r.registerFunction(id, info, builder)
  }
}
