package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Run every registered query (optionally filtered by name prefix) and
    * dump each result to `outDir/<name>` as parquet. Returns the failures
    * as name → message; a query that throws writes NO output directory,
    * so callers (and the driver's gate) must treat a missing dir as a
    * failure, never as "not registered". Factored out of [[main]] so the
    * harness test can run the full surface inside the shared test session
    * without `main`'s session-lifecycle side effects (getOrCreate + stop
    * would hijack and then kill the suite-wide session).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      only: Option[Seq[String]] = None,
      queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
        SparkEntry.queries): Map[String, String] = {
    def keep(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    queries.toSeq.sortBy(_._1).filter(kv => keep(kv._1))
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          failed(name) =
            Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
        }
      }
    failed.toMap
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def jsonObj(m: Iterable[(String, String)]): String =
    m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated name prefixes] — the filter
    // is a local-iteration convenience; the driver always passes two args.
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(",").toSeq) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failed = run(spark, sfDir, outDir, only)
    // failed.json is ALWAYS written ({} when clean): its absence means the
    // dump itself died, never "no failures" — a vanishing query must be
    // loud (round 8-9's events breakage hid for two rounds because a
    // thrown query simply had no row anywhere).
    Files.writeString(Paths.get(s"$outDir/failed.json"), jsonObj(failed))
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] ${failed.size} queries FAILED: ${failed.keys.mkString(", ")}")
    Files.writeString(
      Paths.get(s"$outDir/oracle_sql.json"), jsonObj(SparkEntry.oracleSql))
    spark.stop()
  }
}
