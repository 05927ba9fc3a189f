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

  test("k-means reassignment never decreases the cosine objective") {
    // Lloyd-step monotonicity, the property that makes iterating this
    // converge: holding the refined centroids FIXED, the reassignment
    // (argmax cosine) cannot score worse than the seeding assignment —
    // exactly comparable because both sides evaluate the same centroids.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    import graft.functions.{CosineSim, VecCentroid}
    val s = spark
    val e = Similarity.dropZeroNorm(s,
      Tables(s, sfDir, "embeddings").select(col("vec_id"), col("embedding")))
    val a0 = Similarity.ivfAssign(s, e, 8)
    val centroid = udaf(VecCentroid)
    val cents1 = a0.groupBy(col("bucket").as("c_id"))
      .agg(centroid(col("embedding")).as("c_v"))
      .filter(aggregate(col("c_v"), lit(0.0d), (acc, x) => acc + x * x) > 0.0)
    val a1 = Similarity.kmeansRefine(s, e, 8)
    def objective(a: DataFrame): Double = a
      .join(cents1, a("bucket") === cents1("c_id"))
      .agg(avg(CosineSim(s, col("embedding"), col("c_v"))).as("o"))
      .head.getDouble(0)
    val before = objective(a0)
    val after = objective(a1)
    info(f"mean cosine to refined centroid: seed=$before%.4f refined=$after%.4f")
    assert(after >= before - 1e-9,
      f"reassignment worsened the objective: $before%.6f -> $after%.6f")
  }
}
