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
}
