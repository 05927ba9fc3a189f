package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The blocked (distributed-GEMM) similarity join must produce EXACTLY the
  * broadcast path's result — same pairs, same rounded cosines — for any
  * block count.
  */
class SimilaritySpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("blockedCosineJoin == broadcast q_cosine_pairs at several block counts") {
    val s = spark
    val want = SparkEntry.queries("q_cosine_pairs")(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty)
    for (blocks <- Seq(1, 3, 8)) {
      val got = Similarity.blockedCosineJoin(
        s, Tables(s, sfDir, "embeddings"), threshold = 0.45, blocks = blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, s"mismatch at blocks=$blocks")
    }
  }
}
