package graft.operators

/** Shared per-JVM scratch-directory registry: every directory registered
  * here is recursively deleted by ONE shutdown hook. The sink round-trips
  * (Complex), the bucketed storage tables (Joins), and the streaming
  * sink/checkpoint dirs (Streams) all write full table copies under
  * /tmp — without a registered cleanup each bench/test JVM would leave
  * them behind permanently.
  */
object Scratch {

  private val dirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hook: Unit = {
    sys.addShutdownHook {
      dirs.forEach { dir =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(dir))
      }
    }
    ()
  }

  /** Register `dir` for recursive best-effort deletion at JVM exit. */
  def register(dir: String): Unit = { dirs.add(dir); hook }
}
