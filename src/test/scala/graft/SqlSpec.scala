package graft

import org.scalatest.funsuite.AnyFunSuite

/** The plain-SQL user surface: tables registered as views, analytics in
  * `spark.sql`, including the engine's injected native function.
  */
class SqlSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("spark.sql over registered views matches the DataFrame surface") {
    val s = spark
    Tables.names.foreach { n =>
      Tables(s, sfDir, n).createOrReplaceTempView(n)
    }
    val sql = s.sql(
      """SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_quantity, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""").collect()
    val df = SparkEntry.queries("q_agg")(s, sfDir)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect()
    assert(sql.map(_.toSeq).toSeq == df.map(_.toSeq).toSeq)
  }

  test("cosine_sim works in SQL joins over the registered views") {
    val s = spark
    graft.functions.CosineSim.ensureRegistered(s)
    Tables(s, sfDir, "embeddings").createOrReplaceTempView("embeddings")
    val rows = s.sql(
      """SELECT a.vec_id, ROUND(cosine_sim(a.embedding, a.embedding), 6) AS self
         FROM embeddings a WHERE a.vec_id < 5 ORDER BY a.vec_id""").collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getDouble(1) == 1.0))
  }

  test("count-min estimates are one-sided and within eps*N of exact") {
    // CMS guarantees estimate >= truth ALWAYS (hash collisions only add),
    // and overshoot <= eps*N with the configured confidence — at sf0.01's
    // ~60k lineitem rows and eps=0.001 that is a 61-count allowance.
    // Checks the RAW estimates (the registered q_heavy_hitters reduces
    // them to bound verdicts so the driver's DuckDB oracle can check the
    // same contract cross-engine).
    val s = spark
    val sf = "/root/testdata/sf0.01"
    val rows = operators.Relational.heavyHittersRaw(s, sf).collect()
    assert(rows.length == 10)
    val n = Tables(s, sf, "lineitem").count()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("est_n")
      assert(r.getAs[Long]("allow") == (0.001 * n).ceil.toLong)
      assert(est >= exact,
        s"CMS undercounted suppkey ${r.get(0)}: $est < $exact")
      assert(est <= exact + (0.001 * n).ceil.toLong,
        s"CMS overshoot beyond eps*N for suppkey ${r.get(0)}: $est vs $exact")
    }
    assert(SparkEntry.queries("q_heavy_hitters")(s, sf).collect()
      .forall(_.getAs[Boolean]("within_bound")))
  }

  test("approx_count_distinct stays within the configured rsd of exact") {
    // HLL register contents are implementation-defined, but the error
    // contract is checkable: at sf0.01 every per-group RAW estimate must
    // sit within 4× the configured relative standard deviation
    // (rsd = 0.05) of q_agg_distinct's independently-computed exact
    // counts. The sketch is deterministic for fixed input, so this is a
    // stable gate, and 4σ leaves room without ever accepting a broken
    // sketch (a wrong merge or register width lands orders of magnitude
    // off, not 20%). The registered q_approx_distinct reduces the same
    // estimates to bound verdicts checked cross-engine by the driver.
    val s = spark
    val sf = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q_agg_distinct")(s, sf).collect().map { r =>
      r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n_supp"), r.getAs[Long]("n_part"))
    }.toMap
    val approx = operators.Relational.approxDistinctRaw(s, sf).collect().map { r =>
      r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("hll_supp"), r.getAs[Long]("hll_part"))
    }.toMap
    assert(approx.keySet == exact.keySet)
    val tol = 4 * 0.05
    exact.foreach { case (flag, (eSupp, ePart)) =>
      val (aSupp, aPart) = approx(flag)
      assert(math.abs(aSupp - eSupp) <= tol * eSupp,
        s"$flag suppkey estimate $aSupp vs exact $eSupp beyond ${tol * 100}%")
      assert(math.abs(aPart - ePart) <= tol * ePart,
        s"$flag partkey estimate $aPart vs exact $ePart beyond ${tol * 100}%")
    }
    SparkEntry.queries("q_approx_distinct")(s, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("supp_ok") && r.getAs[Boolean]("part_ok"),
        s"bound verdict false for ${r.get(0)}")
    }
  }
}
