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
}
