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

  test("q_mixture_weights matches an independent JVM recomputation and " +
      "amplifies in the excess direction on a planted corpus") {
    val s = spark
    import s.implicits._
    // planted corpus: a high-quality source (long prose, stopwords), a
    // low-quality one (short token runs), and TWO byte-identical ones
    // (equal aggregates must yield equal weights)
    val good = (("the quick brown fox and " * 24) + "jumps").trim
    val bad = "aa bb cc"
    val eq = "a plain middle sentence of steady words here to hold"
    val rows = Seq.tabulate(4)(i => (i.toLong, good, "en", "hi")) ++
      Seq.tabulate(4)(i => (100L + i, bad, "en", "lo")) ++
      Seq.tabulate(4)(i => (200L + i, eq, "en", "eqA")) ++
      Seq.tabulate(4)(i => (300L + i, eq, "en", "eqB"))
    val dir = java.nio.file.Files.createTempDirectory("graft-mw").toString
    try {
      rows.toDF("doc_id", "text", "lang", "source")
        .withColumn(
          "n_chars",
          org.apache.spark.sql.functions.length($"text").cast("long"))
        .write.parquet(s"$dir/documents.parquet")

      // independent recomputation: plain JVM arithmetic, no Spark
      // expressions anywhere (the q_sample_temperature pattern)
      def micro6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
      val stopRe = "^(a|the|of|and|to|in)$".r
      def qm(text: String): Long = {
        val toks = text.toLowerCase.split(" ", -1)
        val n = toks.length
        val mwl = micro6((text.length - n + 1).toDouble / n)
        val sr = micro6(
          toks.count(t => stopRe.findFirstIn(t).isDefined).toDouble / n)
        val q = micro6(math.min(n.toDouble / 100, 1.0) * 0.5 +
          (if (mwl >= 3.0 && mwl <= 10.0) 0.3 else 0.0) +
          (if (sr > 0.02) 0.2 else 0.0))
        math.floor(q * 1e6 + 0.5).toLong
      }
      val per = rows.groupBy(_._4).map { case (src, rs) =>
        src -> (rs.size.toLong, rs.map(r => qm(r._2)).sum)
      }
      val nn = per.values.map(_._1).sum
      val qq = per.values.map(_._2).sum
      val ns = per.size
      val meanAll = math.floor(qq.toDouble / nn + 0.5).toLong
      var w = per.map { case (src, (n, qsum)) =>
        val mean = math.floor(qsum.toDouble / n + 0.5).toLong
        src -> (n, mean, mean - meanAll,
          math.floor(1000000.0 / ns).toLong)
      }
      for (_ <- 1 to 5) {
        val raw = w.map { case (src, (n, mean, ex, wv)) =>
          val step = math.floor(ex.toDouble * 0.1 + 0.5).toLong
          src -> (n, mean, ex,
            math.floor((wv * (1000000L + step)).toDouble / 1e6).toLong)
        }
        val tot = raw.values.map(_._4).sum
        w = raw.map { case (src, (n, mean, ex, r)) =>
          src -> (n, mean, ex,
            math.floor((r * 1000000L).toDouble / tot.toDouble).toLong)
        }
      }
      val expect = w.map { case (src, (n, mean, ex, wv)) =>
        (src, n, mean.toDouble / 1e6, ex, wv)
      }.toSet

      val got = SparkEntry.queries("q_mixture_weights")(s, dir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getLong(4)))
      assert(got.toSet == expect,
        s"engine ${got.toSet} != JVM recompute $expect")
      // direction + symmetry: hi amplified above uniform, lo damped
      // below, identical sources identical
      val byom = got.map(r => r._1 -> r._5).toMap
      val w0 = math.floor(1000000.0 / ns).toLong
      assert(byom("eqA") == byom("eqB"), s"equal sources unequal: $byom")
      assert(byom("hi") > w0 && byom("lo") < w0 &&
        byom("hi") > byom("eqA") && byom("eqA") > byom("lo"),
        s"weights not ordered with excess: $byom (uniform $w0)")
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
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
