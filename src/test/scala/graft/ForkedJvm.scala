package graft

import java.io.File

/** Shared scaffolding for tests that must fork a fresh JVM (tiny-heap
  * memory budgets, session-construction-time extensions): assembles the
  * classpath from the compiled class dirs + the Spark jars (sbt's layered
  * classloader hides java.class.path) and applies the JDK-17 module opens
  * Spark needs outside spark-submit.
  */
object ForkedJvm {

  val jdk17AddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Run `mainClass` with the given heap cap and args; returns the exit
    * code. Output is inherited so failures show in the test log. */
  def run(mainClass: String, heap: String, args: Seq[String]): Int = {
    val cp = (Seq("target/scala-2.13/classes", "target/scala-2.13/test-classes")
      .map(new File(_).getAbsolutePath) ++
      new File("/opt/spark/jars").listFiles.map(_.getAbsolutePath))
      .mkString(File.pathSeparator)
    val java = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(java, s"-Xmx$heap", "-cp", cp) ++ jdk17AddOpens ++
      (mainClass +: args)
    new ProcessBuilder(cmd: _*).inheritIO().start().waitFor()
  }
}
