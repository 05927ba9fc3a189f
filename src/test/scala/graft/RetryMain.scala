package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession

import graft.operators.{JobSpec, MapReduce}

/** Forked-JVM entry for the task-retry exactly-once test: runs the native
  * wordcount with an injected FIRST-ATTEMPT failure in the chosen stage and
  * exits 0 only if the job completes. The spec then byte-compares the output
  * to the reference golden — proving Spark's task retry (the analog of the
  * reference manager reassigning a dead worker's task, reference
  * mapreduce/manager/__main__.py:304-333, asserted by
  * tests/test_manager_05.py:168-235) re-executes failed tasks without
  * duplicating or losing records (SURVEY.md invariant §2.5-5).
  *
  * Forked because retry needs `local[2, 2]` (maxFailures=2) — the shared
  * test session runs plain local mode where any task failure is fatal.
  *
  * args: <inputDir> <outputDir> <failStage: map|reduce>
  */
object RetryMain {
  def main(args: Array[String]): Unit = {
    val Array(in, out, failStage) = args
    val spark = SparkSession.builder()
      .master("local[2, 2]") // 2 threads, 2 task attempts
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def failFirstAttempt(): Unit = {
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0)
        throw new RuntimeException(
          s"injected first-attempt failure (partition ${tc.partitionId()})")
    }

    MapReduce.runNative(
      spark,
      JobSpec(in, out, "<retry-wc-map>", "<retry-wc-reduce>",
        numMappers = 2, numReducers = 2),
      mapper = { line =>
        if (failStage == "map") failFirstAttempt()
        Engine.wcMapLine(line)
      },
      reducer = { lines =>
        // throws BEFORE any output line is produced on attempt 0; the
        // retried attempt must still see the complete sorted partition and
        // the sink must contain no partial attempt-0 file
        if (failStage == "reduce") failFirstAttempt()
        Engine.wcReduce(lines)
      })
    spark.stop()
  }
}
