package graft

import org.apache.spark.sql.SparkSession

/** Forked end-to-end check of [[Cli.probeUi]] — the cross-process arm of
  * `Cli status`. The suite's shared session runs with the UI disabled,
  * so this main builds the UI-enabled sessions of the test run (fresh
  * JVM — the default port 4040 is free) and probes them over real
  * loopback HTTP, the same path a `spark-submit Cli status` in ANOTHER
  * process takes: the REST server doesn't care which JVM connects.
  *
  * Two scenarios, sequentially:
  *  1. default UI port — the portless `status` walk must find the live
  *     app with its task slots, and find nothing once it stops;
  *  2. explicit `spark.ui.port` OUTSIDE the default walk (4099) — the
  *     default walk must MISS it (the documented blind spot) and
  *     `status --port 4099`'s range must find it.
  * Exits 0 iff all of the above hold.
  */
object StatusMain {
  // the REST store is fed by the ASYNC listener bus, so /applications
  // is briefly empty right after getOrCreate — poll (test-only race: a
  // real cross-process `status` probes an app that is already up)
  private def poll(ports: Range,
      ok: Option[(String, Int)] => Boolean): Option[(String, Int)] = {
    val deadline = System.nanoTime() + 15000000000L
    var r = Cli.probeUi(ports)
    while (!ok(r) && System.nanoTime() < deadline) {
      Thread.sleep(200)
      r = Cli.probeUi(ports)
    }
    r
  }

  private def session(port: Option[Int]): SparkSession = {
    val b = SparkSession.builder()
      .master("local[3]")
      .appName("graft-status")
      .config("spark.ui.enabled", "true")
      .config("spark.sql.shuffle.partitions", "3")
    port.foreach(p => b.config("spark.ui.port", p.toString))
    b.getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    def okFor(appId: String)(o: Option[(String, Int)]) = o.exists {
      case (app, cores) => app.contains(appId) && cores == 3
    }

    // scenario 1: default port, portless walk
    val a = session(None)
    val aId = a.sparkContext.applicationId
    val aUp = poll(Cli.defaultUiPorts, okFor(aId))
    val okAUp = okFor(aId)(aUp)
    if (!okAUp)
      System.err.println(s"STATUS| default-walk probe while up: $aUp " +
        s"(want app $aId with 3 cores)")
    a.stop()
    val aDown = Cli.probeUi(Cli.defaultUiPorts)
    if (aDown.nonEmpty)
      System.err.println(s"STATUS| probe after stop: $aDown")

    // scenario 2: explicit port outside the walk — default walk blind,
    // `status --port` sighted
    val bPorts = Cli.parseStatusPorts(Seq("--port", "4099"))
    val b = session(Some(4099))
    val bId = b.sparkContext.applicationId
    val bUp = poll(bPorts, okFor(bId))
    val okBUp = okFor(bId)(bUp)
    if (!okBUp)
      System.err.println(s"STATUS| --port 4099 probe while up: $bUp " +
        s"(want app $bId with 3 cores)")
    val blind = Cli.probeUi(Cli.defaultUiPorts)
    if (blind.nonEmpty)
      System.err.println(
        s"STATUS| default walk unexpectedly saw the 4099 app: $blind")
    b.stop()
    val bDown = Cli.probeUi(bPorts)
    if (bDown.nonEmpty)
      System.err.println(s"STATUS| --port probe after stop: $bDown")

    sys.exit(if (okAUp && aDown.isEmpty &&
      okBUp && blind.isEmpty && bDown.isEmpty) 0 else 1)
  }
}
