package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark-side implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query over the same
  * parquet tables. Column names/types and row order are aligned on both
  * sides so the driver's hash compare is exact.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  lazy val all: Seq[Q] =
    operators.Relational.queries ++
      operators.Joins.queries ++
      operators.Complex.queries ++
      operators.Multimodal.queries ++
      operators.TextOps.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Typed.queries ++
      operators.Graph.queries ++
      streaming.Streams.queries

  lazy val byName: Map[String, Q] = {
    // a duplicate name would silently SHADOW a query in this map — the
    // driver would verify one of the two and report it under both
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    all.map(q => q.name -> q).toMap
  }
}
