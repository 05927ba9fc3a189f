package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM entry for the FIFO admission-order test (SURVEY §2.2 C3):
  * the reference manager runs one job at a time in arrival order
  * (reference mapreduce/manager/__main__.py:175-189); the engine
  * delegates that queue to Spark's default FIFO scheduler. With ONE task
  * slot (`local[1]`) the delegation is observable: a job submitted while
  * another runs must wait for the running job's task to finish. The
  * first job's task sleeps 400 ms; the second is submitted only AFTER
  * the first's task is observed running (a volatile flag set inside the
  * task closure — local mode executes tasks in this JVM), so the
  * "submitted while another runs" premise holds even on a loaded
  * machine where a fixed delay could miss. The second job's task may
  * then start only after the first's finishes. Exits 0 iff that
  * ordering held.
  */
object FifoMain {
  @volatile private var aStarted = false

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[1]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    assert(sc.getConf.get("spark.scheduler.mode", "FIFO") == "FIFO",
      "engine sessions must keep Spark's FIFO default (C3)")
    sc.parallelize(1 to 4, 1).count() // warm the scheduler path
    @volatile var aEnd = 0L
    @volatile var bStart = 0L
    val ta = new Thread(() => {
      aEnd = sc.parallelize(Seq(1), 1).map { _ =>
        FifoMain.aStarted = true
        Thread.sleep(400); System.nanoTime()
      }.collect()(0)
    })
    val tb = new Thread(() => {
      bStart = sc.parallelize(Seq(1), 1).map { _ =>
        System.nanoTime()
      }.collect()(0)
    })
    ta.start()
    val deadline = System.nanoTime() + 10_000_000_000L
    while (!aStarted && System.nanoTime() < deadline) Thread.sleep(5)
    assert(aStarted, "job A's task never started within 10 s")
    tb.start()
    ta.join(); tb.join()
    spark.stop()
    if (aEnd > 0 && bStart > aEnd) sys.exit(0)
    System.err.println(s"FIFO admission violated: bStart=$bStart aEnd=$aEnd")
    sys.exit(1)
  }
}
