package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the mixture-sampling / held-out-LM pipeline rows
  * (operators/TextOps.scala): q_sample_temperature against a fully
  * independent JVM recomputation (MessageDigest + math.sqrt — no Spark
  * expressions anywhere in the expectation), and q_perplexity_filter's
  * train/held-out backoff contract. The cross-engine halves of both
  * claims are their DuckDB oracle rows.
  */
class MixLmSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("q_sample_temperature matches an independent JVM recomputation") {
    val s = spark
    val docs = Tables(s, sfDir, "documents").select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sMicro = n.view
      .mapValues(c => math.floor(math.sqrt(c.toDouble) * 1e6).toLong).toMap
    val z = sMicro.values.sum
    val expect = docs.filter { case (id, lang) =>
      val u = java.lang.Long.parseLong(md5hex(s"t_$id").take(8), 16)
        .toDouble / 4294967296.0
      u < (200L * sMicro(lang)).toDouble / (z.toDouble * n(lang))
    }.map(_._1).toSet
    val kept = SparkEntry.queries("q_sample_temperature")(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.map(_._1).toSet == expect)
    assert(kept.nonEmpty)
    // the α=½ point: the dominant language keeps at a LOWER rate than
    // every minority language (the raw share is flattened toward √n)
    val rate = n.keys.map { l =>
      l -> kept.count(_._2 == l).toDouble / n(l)
    }.toMap
    assert(rate.collect { case (l, r) if l != "en" => r }.forall(_ > rate("en")),
      s"per-lang keep rates not flattened: $rate")
  }

  test("nbClassify learns a planted label-vocabulary correlation") {
    // the q_nb_classifier row's oracle pins the ARITHMETIC exactly, but
    // the synthetic corpus draws text independently of `lang`, so its
    // accuracy sits at the class prior by construction. This plants a
    // frame where labels DO correlate with vocabulary (disjoint word
    // sets + shared noise words) and asserts the same kernel reaches
    // 100% held-out accuracy — i.e. it actually learns.
    val s = spark
    import s.implicits._
    val mk: Int => (Long, String, Boolean, Seq[String]) = i => {
      val label = if (i % 2 == 0) "cat" else "dog"
      val core = if (label == "cat") Seq("purr", "whisker", "meow")
                 else Seq("bark", "fetch", "tail")
      (i.toLong, label, i >= 20, core ++ Seq("the", "a", s"noise$i"))
    }
    val base = (0 until 100).map(mk)
      .toDF("doc_id", "label", "is_train", "toks")
    val out = operators.TextOps.nbClassify(base).collect()
    assert(out.length == 100)
    val heldOut = out.filter(_.getAs[Long]("doc_id") < 20)
    assert(heldOut.length == 20)
    assert(heldOut.forall(_.getAs[Boolean]("correct")),
      "held-out prediction missed on separable planted vocab")
  }

  test("q_perplexity_filter backs off only on held-out documents") {
    val out = SparkEntry.queries("q_perplexity_filter")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    // a train document's bigrams ARE the LM — backoff can never fire
    assert(out.filter(!_.getAs[Boolean]("held_out"))
      .forall(_.getAs[Long]("n_backoff") == 0L),
      "a train document hit the backoff arm")
    // the held-out side must actually exercise the backoff arm (the
    // fixed sf0.001 corpus has unseen bigrams — 2 as generated)
    assert(out.filter(_.getAs[Boolean]("held_out"))
      .map(_.getAs[Long]("n_backoff")).sum > 0,
      "no held-out bigram ever backed off — smoothing path untested")
    // keep is exactly the τ predicate over the emitted score
    assert(out.forall(r =>
      r.getAs[Boolean]("keep") == (r.getAs[Double]("avg_logprob") >= -3.46)))
  }
}
