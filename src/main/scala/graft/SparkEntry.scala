package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator in the registry surfaces here: `queries` drives the
  * driver's Verify/CORRECTNESS harness, `oracleSql` the DuckDB compare.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_join = lineitem⋈orders⋈customer revenue rollup (TPC-H Q3 shape). */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q_join").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Goes through
    * Registry.byName so its duplicate-name guard fires here too (a dup
    * would otherwise silently shadow a query in this map). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.byName.view.mapValues(_.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
