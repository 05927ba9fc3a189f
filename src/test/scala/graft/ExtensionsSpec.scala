package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end proof of the GraftExtensions wiring in a FRESH session:
  * extensions only apply at session construction, and the shared test
  * session already exists, so this forks a JVM running [[ExtensionsMain]]
  * (SQL function injection + optimizer rule + planner strategy from plain
  * SQL).
  */
class ExtensionsSpec extends AnyFunSuite {

  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("withExtensions(GraftExtensions) wires functions + rewrite in a fresh session") {
    val cp = (Seq("target/scala-2.13/classes", "target/scala-2.13/test-classes")
      .map(new File(_).getAbsolutePath) ++
      new File("/opt/spark/jars").listFiles.map(_.getAbsolutePath))
      .mkString(File.pathSeparator)
    val java = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(java, "-Xmx2g", "-cp", cp) ++ jdk17AddOpens ++
      Seq("graft.ExtensionsMain", "/root/testdata/sf0.001")
    val proc = new ProcessBuilder(cmd: _*).inheritIO().start()
    assert(proc.waitFor() == 0, "forked extensions JVM failed")
  }
}
