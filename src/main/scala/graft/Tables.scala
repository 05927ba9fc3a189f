package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided TPC-H-ish parquet tables (TESTDATA.md).
  *
  * The reference engine's only "table" is a directory of text lines
  * (reference mapreduce/manager/__main__.py:257-259); these typed parquet
  * tables are the declared relational extension surface. Reads stay fully
  * declarative so Catalyst pushes filters/column pruning into the scan.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }

  /** events.ts is parquet TIMESTAMP(NANOS); Spark has no nanosecond
    * timestamp type, so we read it as raw nanos (legacy.parquet.nanosAsLong)
    * and truncate to microseconds. `ts div 1000` keeps the arithmetic in
    * exact integer space (a double division would lose precision at 1e18).
    *
    * nanosAsLong is a SESSION-LEVEL engine contract, not a per-read
    * option (Spark consults SQLConf at schema conversion, so it cannot be
    * scoped to one DataFrameReader): every nano-precision timestamp
    * column in the session reads back as a raw BIGINT. The engine's own
    * sessions (Bench/Verify/tests) pin it at build time; here it is
    * FORCE-PINNED to true (nanosAsLong is a registered SQLConf, so
    * `getOption` surfaces the `false` default even when the user never
    * set it — "set only if unset" is undecidable from the conf API) and
    * never toggled back, so concurrent readers in one session cannot
    * race it, and oracle comparisons must truncate
    * to microseconds wherever ts order/equality matters (they do — see
    * the epoch_us(CAST(ts AS TIMESTAMP)) convention).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true"))
      spark.conf.set(key, "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
