package graft

import org.scalatest.funsuite.AnyFunSuite

/** Approximation-quality measurement for the IVF path: recall@3 against
  * the exact brute-force ranking. Documents the accuracy/cost trade
  * (2-of-8 buckets probed ⇒ ~25% of the corpus scanned).
  */
class AnnSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("IVF probe recall@3 vs exact top-k stays above 0.5") {
    val s = spark
    val exact = SparkEntry.queries("q_ann_topk")(s, sfDir)
      .filter("rk <= 3").collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = SparkEntry.queries("q_ann_ivf")(s, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.keySet == exact.keySet)
    val recalls = exact.map { case (q, nn) =>
      (nn intersect ivf(q)).size.toDouble / nn.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF recall@3 = $mean%.2f over ${recalls.size} queries")
    assert(mean >= 0.5, f"recall collapsed: $mean%.2f")
  }
}
