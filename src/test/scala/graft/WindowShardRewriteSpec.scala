package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RewritePrefixWindow

/** The prefix-window auto-dispatch rule (plans/WindowShard.scala): a
  * USER-written naive running-sum / row_number / ntile window must
  * rewrite to the sharded-prior dataflow past the size threshold — with
  * identical results — and must leave the plan alone below it, when the
  * shapes' semantics can't be absorbed, or when a partitioned window's
  * group size can't be estimated from column stats.
  */
class WindowShardRewriteSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def globalWindows(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }.size

  private def anyWindow(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.size

  /** Run `body` with the rule installed and the size gate at `gate`. */
  private def withRule[T](gate: String)(body: => T): T = {
    val s = spark
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ RewritePrefixWindow
    s.conf.set(RewritePrefixWindow.ConfKey, gate)
    try body
    finally {
      s.conf.unset(RewritePrefixWindow.ConfKey)
      s.experimental.extraOptimizations = s.experimental.extraOptimizations
        .filterNot(_ == RewritePrefixWindow)
    }
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case null => "NULL"
      case x => x.toString
    }).sortBy(_.mkString("|")).map(_.map(identity[Any]))

  // synthetic tie-free frame with nulls in both the order and value
  // columns: 4k rows, order key o (one null), value v (nulls every 7th)
  private def frame(): DataFrame = {
    val s = spark
    import s.implicits._
    s.range(4000).select(
      col("id"),
      when(col("id") === 1234, lit(null))
        .otherwise(pmod(col("id") * 2654435761L, lit(99991))).as("o"),
      when(pmod(col("id"), lit(7)) === 0, lit(null))
        .otherwise(pmod(col("id") * 31 + 7, lit(997))).as("v"),
      concat(lit("g"), pmod(col("id"), lit(3))).as("grp"))
  }

  test("global running SUM rewrites past the gate, bit-equal, incl. nulls") {
    val naive = frame().withColumn("run",
      sum(col("v")).over(Window.orderBy(col("o").asc_nulls_first, col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val want = rows(naive)
    assert(globalWindows(naive) == 1, "positive control: naive plan " +
      "must carry the global window")
    withRule("0") {
      val rewritten = frame().withColumn("run",
        sum(col("v")).over(Window.orderBy(col("o").asc_nulls_first,
            col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      assert(globalWindows(rewritten) == 0,
        "rewrite did not fire on the global running sum")
      assert(anyWindow(rewritten) >= 1,
        "shard-local window missing — wrong plan under test?")
      assert(rows(rewritten) == want, "rewritten running sum diverges")
    }
  }

  test("global row_number rewrites past the gate, bit-equal") {
    def build() = frame().withColumn("rn",
      row_number().over(Window.orderBy(col("o").asc_nulls_first, col("id"))))
    val want = rows(build())
    withRule("0") {
      val rewritten = build()
      assert(globalWindows(rewritten) == 0,
        "rewrite did not fire on the global row_number")
      assert(rows(rewritten) == want, "rewritten row_number diverges")
    }
  }

  test("global rank and dense_rank rewrite past the gate, bit-equal on a " +
      "TIED corpus (peer groups never straddle shards)") {
    // dense ties: ~41 peers per key over 4000 rows, nulls included —
    // rank must jump by peer-group size, dense_rank by one
    def tied() = {
      val s = spark
      s.range(4000).select(col("id"),
        when(col("id") === 1234, lit(null))
          .otherwise(pmod(col("id") * 131, lit(97))).as("o"))
    }
    for ((name, fn) <- Seq(
        "rank" -> (() => rank()), "dense_rank" -> (() => dense_rank()),
        "percent_rank" -> (() => percent_rank()),
        "cume_dist" -> (() => cume_dist()))) {
      def build() = tied().withColumn("r",
        fn().over(Window.orderBy(col("o").asc_nulls_first)))
      val want = rows(build())
      assert(globalWindows(build()) == 1,
        s"positive control: naive $name plan must carry the global window")
      withRule("0") {
        val rewritten = build()
        assert(globalWindows(rewritten) == 0,
          s"rewrite did not fire on the global $name")
        assert(rows(rewritten) == want, s"rewritten $name diverges on ties")
      }
    }
  }

  test("the q_curriculum shape (global ntile over quality desc) rewrites " +
      "past the gate with the oracle row's exact results") {
    val want = rows(SparkEntry.queries("q_curriculum")(spark, sfDir))
    withRule("0") {
      val rewritten = SparkEntry.queries("q_curriculum")(spark, sfDir)
      assert(globalWindows(rewritten) == 0,
        "rewrite did not fire on q_curriculum's global ntile")
      assert(rows(rewritten) == want, "rewritten q_curriculum diverges")
    }
    // ragged N too (Spark's uneven ntile bucket sizing is inlined as a
    // closed form — pin it off the even-split corpus)
    val s = spark
    import s.implicits._
    val ragged = (0 until 11).map(i => (i.toLong, 100L - i * 3, i * 17L))
      .toDF("doc_id", "q", "w")
    def nt(df: DataFrame) = df.withColumn("stage",
      ntile(4).over(Window.orderBy(col("q").desc, col("doc_id"))))
    val wantR = rows(nt(ragged))
    withRule("0") {
      val r = nt(ragged)
      assert(globalWindows(r) == 0, "ntile rewrite did not fire on ragged N")
      assert(rows(r) == wantR, "ragged-N ntile diverges")
    }
  }

  test("the q_sample_budget shape (partitioned running sum) refuses " +
      "without column stats, fires with them, bit-equal") {
    def shape(df: DataFrame) = df.withColumn("prior",
      sum(col("n_chars")).over(Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - col("n_chars"))
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars")
    val want = rows(shape(docs))
    withRule("0") {
      // no distinct-count stats on `source` → group size unknown → the
      // rule must refuse (blind sharding of a high-cardinality partition
      // would be a regression, not a rescue)
      val kept = shape(docs)
      assert(anyWindow(kept) == 1 && globalWindows(kept) == 0,
        "rule fired on a partitioned window WITHOUT column stats")
      assert(rows(kept) == want)
    }
    // with ANALYZE-computed column stats the group estimate exists: fires
    val s = spark
    s.conf.set("spark.sql.cbo.enabled", "true")
    try {
      docs.write.mode("overwrite").saveAsTable("gpx_docs_stats")
      s.sql("ANALYZE TABLE gpx_docs_stats COMPUTE STATISTICS " +
        "FOR COLUMNS source")
      withRule("0") {
        val analyzed = shape(s.table("gpx_docs_stats"))
        assert(analyzed.queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.nonEmpty &&
            !w.partitionSpec.exists(_.references.exists(
              _.name.startsWith("__ps_"))) => w
        }.isEmpty, "rule did not fire on the stats-backed partitioned " +
          s"window:\n${analyzed.queryExecution.optimizedPlan}")
        assert(rows(analyzed) == want, "rewritten partitioned sum diverges")
      }
    } finally {
      s.sql("DROP TABLE IF EXISTS gpx_docs_stats")
      s.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("keyed rewrite keeps NULL partition values (window semantics: " +
      "null is a partition) — sum and rank, stats-backed") {
    // a third of the rows carry a NULL partition key; the window form
    // keeps them as their own partition, so the rewrite's offset joins
    // must be null-safe or those rows drop/corrupt
    val s = spark
    import s.implicits._
    val base = s.range(3000).select(col("id"),
      when(pmod(col("id"), lit(3)) === 0, lit(null))
        .otherwise(concat(lit("s"), pmod(col("id"), lit(3)))).as("src"),
      pmod(col("id") * 2654435761L, lit(99991)).as("o"),
      pmod(col("id") * 31 + 7, lit(997)).as("v"))
    def sumShape(df: DataFrame) = df.withColumn("run",
      sum(col("v")).over(Window.partitionBy("src")
        .orderBy(col("o").asc_nulls_first, col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    def rankShape(df: DataFrame) = df.withColumn("r",
      rank().over(Window.partitionBy("src")
        .orderBy(pmod(col("o"), lit(41)).asc_nulls_first)))
    val wantSum = rows(sumShape(base))
    val wantRank = rows(rankShape(base))
    s.conf.set("spark.sql.cbo.enabled", "true")
    try {
      base.write.mode("overwrite").saveAsTable("gpx_null_stats")
      s.sql("ANALYZE TABLE gpx_null_stats COMPUTE STATISTICS " +
        "FOR COLUMNS src")
      withRule("0") {
        val t = s.table("gpx_null_stats")
        for ((name, shaped, want) <- Seq(
            ("sum", sumShape(t), wantSum), ("rank", rankShape(t), wantRank))) {
          assert(shaped.queryExecution.optimizedPlan.collect {
            case w: LWindow if w.partitionSpec.nonEmpty &&
              !w.partitionSpec.exists(_.references.exists(
                _.name.startsWith("__ps_"))) => w
          }.isEmpty, s"keyed $name did not fire on the stats-backed table")
          val got = rows(shaped)
          assert(got.size == want.size,
            s"keyed $name rewrite changed the row count " +
              s"(${got.size} vs ${want.size}) — null partitions dropped?")
          assert(got == want, s"keyed $name diverges on null partitions")
        }
      }
    } finally {
      s.sql("DROP TABLE IF EXISTS gpx_null_stats")
      s.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("multi-expression Window node: sum + row_number in ONE select " +
      "rewrite together (one sharded pass), bit-equal, incl. nulls") {
    // the most common real notebook shape — Catalyst groups same-spec
    // window expressions into one Window node, so a single-expression
    // rule left this exact pair on the one-task sort (r16 verdict item 2)
    val w = Window.orderBy(col("o").asc_nulls_first, col("id"))
    def build() = frame()
      .withColumn("run", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(w))
    val want = rows(build())
    assert(globalWindows(build()) == 1,
      "positive control: the pair must plan ONE global window node")
    withRule("0") {
      val rewritten = build()
      assert(globalWindows(rewritten) == 0,
        "rewrite did not fire on the sum + row_number node")
      assert(rows(rewritten) == want, "rewritten sum+row_number diverges")
    }
  }

  test("multi-expression Window node: sum + rank + ntile (all three " +
      "families in one node) rewrite together, bit-equal") {
    val w = Window.orderBy(col("o").asc_nulls_first, col("id"))
    def build() = frame()
      .withColumn("run", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("r", rank().over(w))
      .withColumn("stage", ntile(4).over(w))
    val want = rows(build())
    withRule("0") {
      val rewritten = build()
      assert(globalWindows(rewritten) == 0,
        "rewrite did not fire on the three-family node")
      assert(rows(rewritten) == want, "rewritten three-family node diverges")
    }
  }

  test("multi-expression Window node with ONE ineligible expression " +
      "refuses as a whole (no partial rewrite leaving a residual " +
      "one-task window)") {
    val w = Window.orderBy(col("o").asc_nulls_first, col("id"))
    def build() = frame()
      .withColumn("rn", row_number().over(w))
      // avg is not expressible in the sharded decomposition (per-row
      // float division) — its presence must keep the WHOLE node naive
      .withColumn("a", avg(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val want = rows(build())
    withRule("0") {
      val kept = build()
      assert(globalWindows(kept) >= 1,
        "rule partially rewrote a node with an ineligible expression")
      assert(rows(kept) == want)
    }
  }

  test("global percent_rank/cume_dist fire with crossJoin DISABLED — the " +
      "group-total join must be an explicit Cross join, not join(lit(true))") {
    // CheckCartesianProducts (active when spark.sql.crossJoin.enabled=false)
    // rejects an inner join with a trivially-true condition; the injected
    // rule runs BEFORE that batch, so a `join(tot, lit(true))` inside the
    // rewrite would surface as a hard AnalysisException outside
    // tryRewrite's try/catch — the explicit crossJoin (exempt Cross join
    // type) keeps the rewrite both firing and correct (r16 ADVICE, medium)
    def tied() = {
      val s = spark
      s.range(4000).select(col("id"),
        pmod(col("id") * 131, lit(97)).as("o"))
    }
    val s = spark
    s.conf.set("spark.sql.crossJoin.enabled", "false")
    try {
      for ((name, fn) <- Seq(
          "percent_rank" -> (() => percent_rank()),
          "cume_dist" -> (() => cume_dist()))) {
        def build() = tied().withColumn("r",
          fn().over(Window.orderBy(col("o").asc_nulls_first)))
        val want = rows(build())
        withRule("0") {
          val rewritten = build()
          assert(globalWindows(rewritten) == 0,
            s"$name rewrite did not fire with crossJoin disabled")
          assert(rows(rewritten) == want,
            s"rewritten $name diverges with crossJoin disabled")
        }
      }
    } finally s.conf.unset("spark.sql.crossJoin.enabled")
  }

  test("dense_rank over a DOUBLE order key with NaN, -0.0 and 0.0 is " +
      "bit-equal (aggregate float normalization == window peer comparison)") {
    // the earlier-shard offset counts DISTINCT order-key tuples; exactness
    // needs countDistinct's normalization of NaN and ±0.0 (SPARK-26021) to
    // match the window sort's peer grouping — pin it (r16 ADVICE, low)
    val s = spark
    import s.implicits._
    val weird = ((0 until 400).map(i => (i % 13).toDouble) ++
      Seq(Double.NaN, Double.NaN, -0.0, 0.0, -0.0,
        Double.PositiveInfinity, Double.NegativeInfinity))
      .zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("id", "o")
    for ((name, fn) <- Seq(
        "dense_rank" -> (() => dense_rank()), "rank" -> (() => rank()))) {
      def build() = weird.withColumn("r",
        fn().over(Window.orderBy(col("o").asc_nulls_first)))
      val want = rows(build())
      withRule("0") {
        val rewritten = build()
        assert(globalWindows(rewritten) == 0,
          s"$name rewrite did not fire on the double order key")
        assert(rows(rewritten) == want,
          s"rewritten $name diverges on NaN/±0.0 order keys")
      }
    }
  }

  test("global running SUM over DECIMAL(12,2) rewrites past the gate, " +
      "bit-equal incl. nulls (the running money total, r17 verdict item 3)") {
    // values carry live cents so any scale-losing promotion in the
    // decomposition's adds would round visibly
    def build() = frame().withColumn("run",
      sum((col("v") + lit(0.25)).cast("decimal(12,2)"))
        .over(Window.orderBy(col("o").asc_nulls_first, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val want = rows(build())
    assert(globalWindows(build()) == 1,
      "positive control: naive decimal sum must carry the global window")
    withRule("0") {
      val rewritten = build()
      assert(globalWindows(rewritten) == 0,
        "rewrite did not fire on the DECIMAL running sum")
      assert(rows(rewritten) == want, "rewritten decimal sum diverges")
      // the result type must be the window Sum's own widened decimal
      assert(rewritten.schema("run").dataType.simpleString == "decimal(22,2)")
    }
  }

  test("decimal running-sum overflow still FAILS under the rewrite " +
      "(ANSI semantics preserved, never a wrapped/rounded value)") {
    // 64 near-cap decimal(38,0) values: the prefix overflows 38 digits
    // at ~row 11, so BOTH forms must throw — a decomposition that
    // silently lost precision or wrapped would return rows instead
    val s = spark
    def build() = s.range(64).select(col("id"),
        lit("9" * 37).cast("decimal(38,0)").as("v"))
      .withColumn("run", sum(col("v")).over(Window.orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    intercept[Exception] { build().collect() } // naive form throws
    withRule("0") {
      val rewritten = build()
      assert(globalWindows(rewritten) == 0,
        "rewrite did not fire on the near-cap decimal sum")
      intercept[Exception] { rewritten.collect() }
    }
  }

  test("refusals: below the gate, float sums, non-default null ordering, " +
      "other frames") {
    val naiveSum = () => frame().withColumn("run",
      sum(col("v")).over(Window.orderBy(col("o").asc_nulls_first, col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // below the gate (default 1 GiB): tiny frame keeps its window
    withRule((1L << 30).toString) {
      assert(globalWindows(naiveSum()) == 1,
        "rule fired below the size gate")
    }
    withRule("0") {
      // float/double sums are not associative — must not rewrite
      val dbl = frame().withColumn("run",
        sum(col("v").cast("double")).over(
          Window.orderBy(col("o").asc_nulls_first, col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      assert(globalWindows(dbl) == 1, "rule fired on a DOUBLE running sum")
      // non-default null ordering: no monotone shard for the null rows
      val nl = frame().withColumn("run",
        sum(col("v")).over(Window.orderBy(col("o").asc_nulls_last, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      assert(globalWindows(nl) == 1, "rule fired on asc_nulls_last")
      // scale-8 decimal: precision promotion past 38 would ROUND the
      // last digits (adjustedScale < s for s ≥ 7) — must not rewrite
      val dec8 = frame().withColumn("run",
        sum(col("v").cast("decimal(20,8)")).over(
          Window.orderBy(col("o").asc_nulls_first, col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      assert(globalWindows(dec8) == 1, "rule fired on a scale-8 decimal sum")
      // a non-prefix frame (trailing 3 rows) must not rewrite
      val tail3 = frame().withColumn("run",
        sum(col("v")).over(Window.orderBy(col("o").asc_nulls_first,
            col("id")).rowsBetween(-2, Window.currentRow)))
      assert(globalWindows(tail3) == 1, "rule fired on a bounded frame")
      // avg (a non-integral aggregate — float division per row) must
      // not rewrite
      val av = frame().withColumn("r", avg(col("v"))
        .over(Window.orderBy(col("o").asc_nulls_first, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      assert(globalWindows(av) == 1, "rule fired on a running avg()")
    }
  }
}
