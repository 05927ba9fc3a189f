package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Guards on the driver-facing harness itself, born from the round-8/9
  * incident where the regenerated events.parquet silently broke 23 queries
  * for two rounds: Verify swallowed the exceptions, the correctness gate
  * dropped the rows without an `err` entry, and Bench recorded the ~60 ms
  * it takes to throw as innocent-looking timings.
  *
  *  1. The full registered surface must DUMP at sf0.001 — a query that
  *     vanishes from the oracle compare can never again read as green.
  *  2. A throwing query must surface BY NAME in Verify's failure map (and
  *     hence failed.json) and must not leave a stale output directory.
  *  3. Tables.events must load every timestamp encoding the generator has
  *     shipped so far — TIMESTAMP(NANOS) (read as raw longs under
  *     nanosAsLong) AND timestamp[us] (read as TIMESTAMP_NTZ) — with
  *     identical downstream results on identical logical data.
  */
class HarnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- 1. every registered query dumps ----------------------------------

  test("Verify.run dumps every registered query at sf0.001 with no failures") {
    val out = Files.createTempDirectory("graft-verify-surface").toString
    try {
      val failed = Verify.run(spark, "/root/testdata/sf0.001", out)
      assert(failed.isEmpty,
        s"queries failed at sf0.001: ${failed.mkString("; ")}")
      val missing = SparkEntry.queries.keys.toSeq.sorted
        .filterNot(n => new java.io.File(s"$out/$n").isDirectory)
      assert(missing.isEmpty, s"no output directory for: $missing")
      // every oracle row must belong to a registered query, or the driver
      // compares against a dump that can never exist
      val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
      assert(orphans.isEmpty, s"oracleSql without a query: $orphans")
      // and every oracle must be real SQL: a Scala object-initialization
      // ordering slip (val referenced before definition) yields
      // Some(null), which crashes Verify's oracle_sql.json write AFTER
      // the dumps — invisible to the dump checks above
      val nullSql = SparkEntry.oracleSql.collect {
        case (k, v) if v == null || v.trim.isEmpty => k }
      assert(nullSql.isEmpty, s"null/empty oracle SQL for: $nullSql")
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(out))
  }

  // ---- 2. failures are loud ----------------------------------------------

  test("a throwing query lands in the failure map by name, with no output dir") {
    val out = Files.createTempDirectory("graft-verify-fail").toString
    try {
      val qs = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
        "q_ok" -> ((s, d) => Tables(s, d, "nation")),
        "q_boom" -> ((s, _) => s.sql("SELECT no_such_column FROM range(1)")))
      val failed = Verify.run(spark, "/root/testdata/sf0.001", out, queries = qs)
      assert(failed.keySet == Set("q_boom"))
      assert(failed("q_boom").nonEmpty)
      assert(new java.io.File(s"$out/q_ok").isDirectory)
      assert(!new java.io.File(s"$out/q_boom").isDirectory)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(out))
  }

  // ---- 3. events timestamp-encoding matrix -------------------------------

  /** The logical test rows: two users, gaps straddling the 30-min
    * sessionization threshold. All instants are whole microseconds so the
    * nanos arm (written as ts*1000) truncates back to exactly the same
    * values and BOTH encodings must produce identical session frames. */
  private val rows = Seq(
    // (event_id, ts_us, user_id, event_type, value, props)
    (1L, 1700000000000000L, 1L, "click", 1.0, "{}"),
    (2L, 1700000000500000L, 1L, "view", 2.0, "{}"),
    (3L, 1700000000500000L + 1801L * 1000000L, 1L, "click", 3.0, "{}"),
    (4L, 1700000100000000L, 2L, "purchase", 4.0, "{}"),
    (5L, 1700000100000000L + 1799L * 1000000L, 2L, "view", 5.0, "{}"))

  /** Write the rows micros-encoded the way the 2026-08-13 generator does:
    * parquet `timestamp[us]`, isAdjustedToUTC=false — i.e. a Spark
    * TIMESTAMP_NTZ column. */
  private def writeMicrosNtz(dir: String): Unit = {
    import spark.implicits._
    spark.createDataset(rows).toDF(
        "event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** Write the rows nanos-encoded the way the original generator did:
    * parquet physical int64 with a TIMESTAMP(NANOS) logical annotation
    * (Spark cannot write that type, so use parquet-hadoop's example API
    * directly). Under nanosAsLong the column reads back as raw LongType
    * nanoseconds — the loader contract rounds 7 and earlier ran on. */
  private def writeNanos(dir: String): Unit = {
    import org.apache.parquet.schema.{Types, LogicalTypeAnnotation, PrimitiveType}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.hadoop.fs.Path
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType).named("event_type")
      .required(PrimitiveType.PrimitiveTypeName.DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType).named("props")
      .named("events")
    val f = new java.io.File(s"$dir/events.parquet")
    if (f.exists()) org.apache.commons.io.FileUtils.deleteQuietly(f)
    val w = ExampleParquetWriter.builder(new Path(f.toString))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, tsUs, uid, typ, v, props) =>
      val g = gf.newGroup()
      g.add("event_id", id)
      g.add("ts", tsUs * 1000L) // micros → nanos
      g.add("user_id", uid)
      g.add("event_type", typ)
      g.add("value", v)
      g.add("props", props)
      w.write(g)
    } finally w.close()
  }

  private def sessions(dir: String): Seq[org.apache.spark.sql.Row] = {
    val df = SparkEntry.queries("q_sessionize")(spark, dir)
    df.collect().toSeq
  }

  test("Tables.events loads both generator encodings with identical results") {
    val microsDir = Files.createTempDirectory("graft-ev-us").toString
    val nanosDir = Files.createTempDirectory("graft-ev-ns").toString
    try {
      writeMicrosNtz(microsDir)
      writeNanos(nanosDir)
      for (d <- Seq(microsDir, nanosDir)) {
        val ev = Tables(spark, d, "events")
        assert(ev.schema("ts").dataType == TimestampType,
          s"$d: ts normalized to ${ev.schema("ts").dataType}")
        assert(ev.count() == rows.size)
      }
      val us = sessions(microsDir)
      val ns = sessions(nanosDir)
      assert(us == ns, s"encodings disagree:\nmicros: $us\nnanos:  $ns")
      // 30-min gap semantics on the canned rows: user 1 splits (1801 s gap),
      // user 2 does not (1799 s) — 3 sessions total
      assert(us.size == 3, s"expected 3 sessions, got: $us")
    } finally Seq(microsDir, nanosDir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }

  test("NTZ-encoded events load identically in a non-UTC session zone") {
    // The engine pins UTC, but a library user might not: the NTZ arm of
    // normalizeTs must read the wall-clock value AS UTC in any session
    // zone (timestampdiff on NTZ is zone-independent; a plain cast to
    // TimestampType would shift by the session offset).
    val dir = Files.createTempDirectory("graft-ev-tz").toString
    val key = "spark.sql.session.timeZone"
    val prev = spark.conf.get(key)
    try {
      writeMicrosNtz(dir)
      val utc = sessions(dir)
      spark.conf.set(key, "America/New_York")
      val ny = sessions(dir)
      assert(ny == utc, s"session zone leaked into NTZ load:\nUTC: $utc\nNY:  $ny")
    } finally {
      spark.conf.set(key, prev)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("normalizeTs rejects an unknown ts type loudly") {
    import spark.implicits._
    val bogus = Seq(("x", 1)).toDF("a", "ts")
      .withColumn("ts", col("ts").cast(StringType))
    val e = intercept[IllegalStateException](Tables.normalizeTs(bogus))
    assert(e.getMessage.contains("unsupported"))
  }

  test("events testdata satisfies the session_attrib key-packing invariant") {
    // q_session_attrib's DuckDB oracle packs the argmin/argmax key as
    // eus::HUGEINT * 10^12 + event_id while the Spark side orders by the
    // true struct(eus, event_id) — the packing is order-isomorphic ONLY
    // when 0 <= event_id < 10^12 and eus >= 0. That bound was previously
    // stated in a comment but never enforced (r11 ADVICE); this pins it
    // against every SF the driver verifies on, so a future testdata
    // generator that violates it fails HERE, not as a silent oracle
    // divergence.
    import org.apache.spark.sql.functions._
    val s = spark
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/events.parquet").exists) {
        val r = Tables(s, dir, "events")
          .agg(max(col("event_id")).as("max_id"),
            min(col("event_id")).as("min_id"),
            min(unix_micros(col("ts"))).as("min_eus"))
          .head()
        assert(r.getLong(0) < 1000000000000L && r.getLong(1) >= 0L,
          s"$sf: event_id outside [0, 10^12) — the oracle packing " +
            s"eus*10^12 + event_id is no longer order-isomorphic")
        assert(r.getLong(2) >= 0L,
          s"$sf: negative epoch-micros ts — the HUGEINT packing breaks")
      }
    }
  }

  test("q_repetition_filter gives token-less docs a verdict row") {
    // A doc whose text is empty or whitespace-only has no tokens —
    // plain explode/unnest would silently drop it from the verdict
    // table (a consumer joining the corpus against keep verdicts then
    // sees an ambiguous missing row). The row uses explode_outer (and
    // the oracle a [NULL]-list CASE) so every input doc gets exactly
    // one verdict; a token-less doc scores dup3_frac 0, top_share 0,
    // keep = true (repetition gates measure repetition — emptiness is
    // the length gate's job).
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-repfilter").toString
    try {
      Seq(
        (0L, "the quick brown fox jumps over the lazy dog", "en", "s0"),
        (1L, "", "en", "s0"),
        (2L, "   ", "en", "s0")
      ).toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length($"text"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q_repetition_filter")(s, dir)
        .select($"doc_id", $"n_tokens", $"dup3_frac", $"top_share",
          $"keep")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getBoolean(4))).toList
      assert(got.map(_._1) == List(0L, 1L, 2L),
        s"expected all three docs to get verdict rows, got $got")
      assert(got.filter(_._1 > 0).forall(x =>
        x._2 == 0L && x._3 == 0.0 && x._4 == 0.0 && x._5),
        s"token-less docs must score (0, 0.0, 0.0, keep=true): $got")
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }
}
