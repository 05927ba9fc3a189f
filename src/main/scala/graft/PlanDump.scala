package graft

import java.nio.file.{Files, Paths}

/** Optimization-round evidence dump: `runMain graft.PlanDump <outDir>
  * [name1,name2,...]` writes each registered query's
  * `.explain("formatted")` text to `<outDir>/<name>.txt` (all registered
  * queries when no filter is given). Used to produce the committed
  * `plans/r{N}/<query>_{before,after}.txt` artifacts the optimization
  * judge checks plan claims against — run it from the round's HEAD for
  * the `_after` files and from a worktree of the pre-round commit for
  * `_before`. Session recipe matches Bench so the plans are the ones the
  * sweep actually executes (same shuffle partitions / AQE defaults).
  */
object PlanDump {
  /** Per-round frames of the iterative loops (pagerank / CC min-label /
    * CC star / LPA): their registered queries localCheckpoint every
    * round, so the final `.explain` shows only a Scan ExistingRDD above
    * the last checkpoint and the per-round JOIN STRATEGY — the thing the
    * r18 shuffle-hash work changed — would be invisible to a plan audit.
    * These pseudo-queries build round 1 with the loops' own checkpointed
    * inputs via the factored round-body functions the loops execute. */
  private val roundFrames
      : Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
    "pagerank_round" -> (operators.Graph.prRoundPlanFrame _),
    "cc_round" -> (operators.Dedup.ccRoundPlanFrame _),
    "cc_star_round" -> (operators.Dedup.starRoundPlanFrame _),
    "lpa_round" -> (operators.Dedup.lpaRoundPlanFrame _))

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <outDir> [name1,name2,...]")
    val outDir = args(0)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Bench.benchSession(cpus)
    Files.createDirectories(Paths.get(outDir))
    val qs = (SparkEntry.queries ++ roundFrames).toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    only.foreach { want =>
      val missing = want -- qs.map(_._1).toSet
      require(missing.isEmpty, s"unknown queries: ${missing.mkString(", ")}")
    }
    qs.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
        println(s"[plandump] wrote $outDir/$name.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
