package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 32-bit SimHash signature of a space-tokenized document.
  *
  * Semantics are EXACTLY the declarative pipeline it replaces
  * (explode(array_distinct(split(text,' '))) → md5 hex chars → ±1 votes →
  * bit pack, see operators/Dedup.scala q_dedup_simhash and its DuckDB
  * oracle): bit j of the signature is set iff Σ over distinct tokens of
  * (+1 if hex char j of md5(token) has its high bit set else −1) is
  * positive. Token split keeps trailing empties (Spark split limit −1).
  *
  * One per-row native loop replaces a docs×tokens×32-row double
  * aggregation — the signature computation becomes a pure map with ZERO
  * shuffles. CodegenFallback is deliberate: the expression is called once
  * per DOCUMENT (not per token), so the fallback's per-row boxing is noise
  * next to the MD5 work inside, and the md5 loop itself would not benefit
  * from codegen.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash32 requires a string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](32)
    // thread-local reuse (graft.plans.Md5): this eval runs once per ROW,
    // and a MessageDigest.getInstance is a provider lookup per call
    val md = graft.plans.Md5.threadDigest()
    // limit -1 keeps trailing empty tokens — matching Spark's split()
    text.split(" ", -1).foreach { tok =>
      if (seen.add(tok)) {
        md.reset()
        val digest = md.digest(tok.getBytes(StandardCharsets.UTF_8))
        var j = 0
        while (j < 32) {
          // hex char j = nibble j of the digest, high nibble first;
          // char ∈ {8..f} ⇔ nibble ≥ 8
          val b = digest(j >> 1)
          val nibble = if ((j & 1) == 0) (b >> 4) & 0xF else b & 0xF
          votes(j) += (if (nibble >= 8) 1 else -1)
          j += 1
        }
      }
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object SimHash32 {
  val registration: FnReg.Registration = FnReg.make(
    "simhash32", classOf[SimHash32], arity = 1,
    c => SimHash32(c.head))

  /** Column API: `simHash32(text)`. */
  def apply(spark: SparkSession, text: Column): Column = {
    FnReg.ensure(spark, registration)
    call_function("simhash32", text)
  }
}
