package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextDirSource

/** The DSv2 text-dir connector: D1 listing semantics, per-file partitions,
  * and column pruning down to the scan.
  */
class SourcesSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("textdir source reads a directory of text files with provenance") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-textdir")
    java.nio.file.Files.writeString(dir.resolve("b.txt"), "b1\nb2\n")
    java.nio.file.Files.writeString(dir.resolve("a.txt"), "a1\n")
    java.nio.file.Files.writeString(dir.resolve("_SUCCESS"), "skip me\n")
    java.nio.file.Files.writeString(dir.resolve(".hidden"), "skip me\n")

    val df = s.read.format(TextDirSource.Name).load(dir.toString)
    // one partition per (visible) file, sorted listing
    assert(df.rdd.getNumPartitions == 2)
    val got = df.select(
      element_at(split(col("file"), "/"), -1).as("f"), col("line"))
      .as[(String, String)].collect().toSet
    assert(got == Set(("a.txt", "a1"), ("b.txt", "b1"), ("b.txt", "b2")))
  }

  test("textdir source prunes unused columns from the scan") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-textdir-prune")
    java.nio.file.Files.writeString(dir.resolve("x.txt"), "x\n")
    val onlyLine = s.read.format(TextDirSource.Name).load(dir.toString)
      .select(col("line"))
    val plan = onlyLine.queryExecution.executedPlan.toString
    assert(plan.contains("columns=line"), plan)
    assert(onlyLine.collect().map(_.getString(0)).toSeq == Seq("x"))
  }

  test("textdir source prunes whole files on pushed file predicates") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-textdir-pushdown")
    java.nio.file.Files.writeString(dir.resolve("a.txt"), "a1\n")
    java.nio.file.Files.writeString(dir.resolve("b.txt"), "b1\nb2\n")
    java.nio.file.Files.writeString(dir.resolve("c.log"), "c1\n")

    def scan = s.read.format(TextDirSource.Name).load(dir.toString)
    assert(scan.rdd.getNumPartitions == 3) // baseline: one per file

    // suffix predicate prunes c.log at PLANNING — 2 partitions, not a
    // 3-partition scan with a post-filter
    val txt = scan.filter(col("file").endsWith(".txt"))
    assert(txt.rdd.getNumPartitions == 2, "file filter did not prune listing")
    assert(txt.queryExecution.executedPlan.toString.contains("pushed=["))
    assert(txt.select("line").as[String].collect().sorted.toSeq ==
      Seq("a1", "b1", "b2"))

    // equality on the full path prunes to exactly one file
    val one = scan.filter(col("file") === s"file:$dir/b.txt")
    assert(one.rdd.getNumPartitions == 1)
    assert(one.select("line").as[String].collect().sorted.toSeq ==
      Seq("b1", "b2"))

    // a line predicate is NOT pushable: partitions stay at 3 and the
    // filter evaluates post-scan (results still correct)
    val lineF = scan.filter(col("line").startsWith("b"))
    assert(lineF.rdd.getNumPartitions == 3)
    assert(lineF.select("line").as[String].collect().sorted.toSeq ==
      Seq("b1", "b2"))

    // three-valued logic: NOT IN over a list containing NULL is never
    // true in SQL — the pushed filter must return ZERO files, not the
    // two-valued complement (all non-matching files)
    val notIn = scan.filter(
      !col("file").isin(s"file:$dir/b.txt", lit(null)))
    assert(notIn.count() == 0, "NOT IN (.., NULL) must yield no rows")
  }

  test("textdir source pushes LIMIT into the per-file readers") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-textdir-limit")
    java.nio.file.Files.writeString(dir.resolve("a.txt"),
      (1 to 1000).map(i => s"a$i").mkString("", "\n", "\n"))
    java.nio.file.Files.writeString(dir.resolve("b.txt"),
      (1 to 1000).map(i => s"b$i").mkString("", "\n", "\n"))
    val limited = s.read.format(TextDirSource.Name).load(dir.toString)
      .limit(3)
    // the limit reached the scan (each reader stops after 3 lines rather
    // than draining its file; Spark's own global Limit still applies on
    // top — partial pushdown)
    val plan = limited.queryExecution.executedPlan.toString
    assert(plan.contains("limit=3"), s"limit not pushed to the scan:\n$plan")
    assert(limited.select("line").as[String].collect().length == 3)
  }
}
