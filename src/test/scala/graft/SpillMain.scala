package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forked-JVM entry for the shuffle-spill budget test: a high-cardinality
  * hash aggregation over ~350 MB of generated rows inside a 320 MB heap.
  * The per-partition aggregation state (1.5 M groups × ~120 B of key +
  * counters + carried max-pad, two concurrent tasks) cannot fit the
  * execution-memory region, so HashAggregate MUST fall back to
  * sort-based spilling — the mechanism a 100 TB shuffle lives on.
  *
  * The main FAILS (nonzero exit) if either (a) any exact result is wrong
  * — spilled data that merges incorrectly shows up here — or (b) nothing
  * spilled at all, which would mean the test stopped exercising the
  * spill path (premise rot, e.g. sizes drifted after a refactor).
  */
object SpillMain {
  def main(args: Array[String]): Unit = {
    val n = 3000000L
    val groups = 1500000L
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.testing.memory", Runtime.getRuntime.maxMemory.toString)
      .config("spark.testing.reservedMemory", (64L << 20).toString)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spilled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          spilled.addAndGet(t.taskMetrics.memoryBytesSpilled)
    })
    val pad = "x" * 96
    val df = spark.range(0, n, 1, 2)
      .select(col("id"), pmod(col("id"), lit(groups)).as("k"),
        concat(lit(pad), col("id")).as("pad"))
    val agg = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum(col("id")).as("s"),
        max(col("pad")).as("mp"))
    val row = agg.agg(sum(col("cnt")), sum(col("s")),
      count(lit(1)), countDistinct(col("mp"))).collect().head
    require(row.getLong(0) == n, s"row count ${row.getLong(0)} != $n")
    require(row.getLong(1) == n * (n - 1) / 2,
      s"id sum ${row.getLong(1)} != ${n * (n - 1) / 2}")
    require(row.getLong(2) == groups, s"groups ${row.getLong(2)} != $groups")
    require(row.getLong(3) == groups,
      s"distinct max-pads ${row.getLong(3)} != $groups")
    require(spilled.get() > 0,
      "nothing spilled — the workload no longer stresses execution memory")
    println(s"[spill] memoryBytesSpilled=${spilled.get()}")
    spark.stop()
  }
}
