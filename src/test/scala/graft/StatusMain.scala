package graft

import org.apache.spark.sql.SparkSession

/** Forked end-to-end check of [[Cli.probeUi]] — the cross-process arm of
  * `Cli status`. The suite's shared session runs with the UI disabled,
  * so this main builds the one UI-enabled session of the test run
  * (fresh JVM — the default port 4040 is free) and probes it over real
  * loopback HTTP, the same path a `spark-submit Cli status` in ANOTHER
  * process takes: the REST server doesn't care which JVM connects.
  * Exits 0 iff the probe reports the live app with its task slots while
  * the session is up AND reports nothing once it stops.
  */
object StatusMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[3]")
      .appName("graft-status")
      .config("spark.ui.enabled", "true")
      .config("spark.sql.shuffle.partitions", "3")
      .getOrCreate()
    val appId = spark.sparkContext.applicationId
    // the REST store is fed by the ASYNC listener bus, so /applications
    // is briefly empty right after getOrCreate — poll (test-only race: a
    // real cross-process `status` probes an app that is already up)
    val deadline = System.nanoTime() + 15000000000L
    var up = Cli.probeUi()
    def okNow(o: Option[(String, Int)]) = o.exists { case (app, cores) =>
      app.contains(appId) && cores == 3
    }
    while (!okNow(up) && System.nanoTime() < deadline) {
      Thread.sleep(200)
      up = Cli.probeUi()
    }
    val okUp = okNow(up)
    if (!okUp)
      System.err.println(s"STATUS| probe while up: $up " +
        s"(want app $appId with 3 cores)")
    spark.stop()
    val down = Cli.probeUi()
    if (down.nonEmpty)
      System.err.println(s"STATUS| probe after stop: $down")
    sys.exit(if (okUp && down.isEmpty) 0 else 1)
  }
}
