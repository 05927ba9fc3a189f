package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{JobSpec, MapReduce}

/** Golden-output tests against the reference's own fixtures and compare
  * rules:
  *  - grep: byte-exact part-00000 vs tests/testdata/correct/grep_correct.txt
  *    (rule: reference tests/test_integration_01.py:81-85)
  *  - word count: sorted-line multiset vs word_count_correct.txt
  *    (rule: reference tests/test_integration_02.py:83-87)
  *  - multi-reducer: part-file count == num_reducers, merged content
  *    matches (rule: reference tests/test_integration_03.py:85-98)
  */
class MapReduceCompatSpec extends AnyFunSuite {

  private val ref = "/root/reference/tests/testdata"
  private def spark = TestSpark.spark

  private def tmpOut(): String = {
    val d = Files.createTempDirectory("graft-mr").resolve("out")
    d.toString
  }

  private def readLines(p: Path): Seq[String] =
    Files.readAllLines(p).asScala.toSeq

  private def partFiles(dir: String): Seq[Path] =
    Files.list(Paths.get(dir)).iterator.asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .toSeq.sortBy(_.getFileName.toString)

  test("grep job via external executables is byte-identical to the golden") {
    val out = tmpOut()
    MapReduce.run(spark, JobSpec(
      s"$ref/input", out,
      s"$ref/exec/grep_map.py", s"$ref/exec/grep_reduce.py",
      numMappers = 2, numReducers = 1))
    val got = Files.readAllBytes(Paths.get(out, "part-00000"))
    val want = Files.readAllBytes(Paths.get(s"$ref/correct/grep_correct.txt"))
    assert(got.sameElements(want))
  }

  test("word count via external executables matches the golden multiset") {
    val out = tmpOut()
    MapReduce.run(spark, JobSpec(
      s"$ref/input", out,
      s"$ref/exec/wc_map.sh", s"$ref/exec/wc_reduce.sh",
      numMappers = 2, numReducers = 1))
    val got = readLines(Paths.get(out, "part-00000")).sorted
    val want = readLines(Paths.get(s"$ref/correct/word_count_correct.txt")).sorted
    assert(got == want)
  }

  test("multi-reducer word count: file count and merged content") {
    val out = tmpOut()
    MapReduce.run(spark, JobSpec(
      s"$ref/input", out,
      s"$ref/exec/wc_map.sh", s"$ref/exec/wc_reduce.sh",
      numMappers = 2, numReducers = 2))
    val parts = partFiles(out)
    assert(parts.map(_.getFileName.toString) == Seq("part-00000", "part-00001"))
    val got = parts.flatMap(readLines).sorted
    val want = readLines(Paths.get(s"$ref/correct/word_count_correct.txt")).sorted
    assert(got == want)
  }

  test("native word count matches the golden multiset") {
    val out = tmpOut()
    Engine.wordCount(spark, s"$ref/input", out, numReducers = 1)
    val got = readLines(Paths.get(out, "part-00000")).sorted
    val want = readLines(Paths.get(s"$ref/correct/word_count_correct.txt")).sorted
    assert(got == want)
  }

  test("native grep is byte-identical to the golden") {
    val out = tmpOut()
    Engine.grep(spark, s"$ref/input", out, numReducers = 1)
    val got = Files.readAllBytes(Paths.get(out, "part-00000"))
    val want = Files.readAllBytes(Paths.get(s"$ref/correct/grep_correct.txt"))
    assert(got.sameElements(want))
  }

  test("empty input directory still writes num_reducers empty part files") {
    val inDir = Files.createTempDirectory("graft-mr-empty")
    val out = tmpOut()
    MapReduce.run(spark, JobSpec(
      inDir.toString, out,
      s"$ref/exec/wc_map.sh", s"$ref/exec/wc_reduce.sh",
      numMappers = 2, numReducers = 2))
    val parts = partFiles(out)
    assert(parts.map(_.getFileName.toString) == Seq("part-00000", "part-00001"))
    assert(parts.forall(p => Files.size(p) == 0))
  }

  test("blank lines produce empty-key records that group correctly") {
    // reference tests/test_worker_04.py:109-115: blank input lines map to
    // "\t1" records; the empty string is a real key and groups like any
    // other (MD5 of "" decides its partition)
    val inDir = Files.createTempDirectory("graft-mr-blank")
    Files.writeString(inDir.resolve("f1"), "a b\n\na\n\n\nb\n")
    val out = tmpOut()
    Engine.wordCount(spark, inDir.toString, out, numReducers = 2)
    val lines = partFiles(out).flatMap(readLines)
    val counts = lines.map { l =>
      val i = l.indexOf('\t'); (l.substring(0, i), l.substring(i + 1).toLong)
    }.toMap
    assert(counts == Map("a" -> 2L, "b" -> 2L, "" -> 3L))
    // the empty key lands on the partition md5("") % 2 selects — all of
    // its records together (grouping totality)
    val emptyKeyPart = graft.plans.Md5.mod("", 2)
    val partWithEmpty = partFiles(out).zipWithIndex.collect {
      case (p, i) if readLines(p).exists(_.startsWith("\t")) => i
    }
    assert(partWithEmpty == Seq(emptyKeyPart))
  }

  test("round-robin split matches the reference grouping at m=2") {
    // reference tests/test_manager_02.py:139-159: task 0 gets files
    // 01,03,05,07 and task 1 gets 02,04,06,08
    val files = MapReduce.listInputs(spark, s"$ref/input")
    assert(files.map(_.split('/').last) ==
      (1 to 8).map(i => f"file$i%02d"))
    val groups = MapReduce.splitRoundRobin(files, 2)
      .map(_.map(_.split('/').last))
    assert(groups == Seq(
      Seq("file01", "file03", "file05", "file07"),
      Seq("file02", "file04", "file06", "file08")))
  }

  test("task retry: first-attempt map failures still yield the exact golden") {
    // Reference behavior: a dead worker's task is reassigned and the output
    // is still correct (manager/__main__.py:304-333, asserted by reference
    // tests/test_manager_05.py:168-235). Spark analog: task retry. Forked
    // JVM because retry needs local[2,2] (maxFailures=2) — in the shared
    // plain-local session any task failure is fatal.
    val out = tmpOut()
    assert(ForkedJvm.run("graft.RetryMain", "2g",
      Seq(s"$ref/input", out, "map")) == 0)
    val parts = partFiles(out)
    assert(parts.map(_.getFileName.toString) == Seq("part-00000", "part-00001"))
    val got = parts.flatMap(readLines).sorted
    val want = readLines(Paths.get(s"$ref/correct/word_count_correct.txt")).sorted
    assert(got == want)
  }

  test("task retry: first-attempt reduce failures write no partial output") {
    // the retried reduce attempt must re-read the complete sorted shuffle
    // partition, and the committer must discard the failed attempt's file —
    // exactly num_reducers part files, content equal to the golden multiset
    val out = tmpOut()
    assert(ForkedJvm.run("graft.RetryMain", "2g",
      Seq(s"$ref/input", out, "reduce")) == 0)
    val parts = partFiles(out)
    assert(parts.map(_.getFileName.toString) == Seq("part-00000", "part-00001"))
    val got = parts.flatMap(readLines).sorted
    val want = readLines(Paths.get(s"$ref/correct/word_count_correct.txt")).sorted
    assert(got == want)
  }

  test("two jobs submitted back-to-back serialize correctly (C3 queue)") {
    // reference manager queues jobs FIFO and runs one at a time
    // (manager/__main__.py:125-139,175-189); the Spark analog is the
    // driver's job queue — two sequential submits through the same session
    // must each produce their own correct, isolated output
    val out1 = tmpOut()
    val out2 = tmpOut()
    Engine.submit(spark, JobSpec(s"$ref/input", out1,
      s"$ref/exec/wc_map.sh", s"$ref/exec/wc_reduce.sh", 2, 1))
    Engine.submit(spark, JobSpec(s"$ref/input", out2,
      s"$ref/exec/grep_map.py", s"$ref/exec/grep_reduce.py", 2, 1))
    val wantWc = readLines(Paths.get(s"$ref/correct/word_count_correct.txt")).sorted
    assert(readLines(Paths.get(out1, "part-00000")).sorted == wantWc)
    val gotGrep = Files.readAllBytes(Paths.get(out2, "part-00000"))
    val wantGrep = Files.readAllBytes(Paths.get(s"$ref/correct/grep_correct.txt"))
    assert(gotGrep.sameElements(wantGrep))
  }

  test("two jobs submitted concurrently stay isolated (C3 admission)") {
    // the reference admits concurrent submissions into its queue without
    // cross-corruption; Spark's scheduler interleaves the two jobs' stages
    // but each job's scratch (_temporary attempt dirs under its own output
    // directory) and sink are per-job — both outputs must be exact
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val out1 = tmpOut()
    val out2 = tmpOut()
    val f1 = Future(Engine.submit(spark, JobSpec(s"$ref/input", out1,
      s"$ref/exec/wc_map.sh", s"$ref/exec/wc_reduce.sh", 2, 1)))
    val f2 = Future(Engine.submit(spark, JobSpec(s"$ref/input", out2,
      s"$ref/exec/grep_map.py", s"$ref/exec/grep_reduce.py", 2, 1)))
    Await.result(f1, 120.seconds)
    Await.result(f2, 120.seconds)
    val wantWc = readLines(Paths.get(s"$ref/correct/word_count_correct.txt")).sorted
    assert(readLines(Paths.get(out1, "part-00000")).sorted == wantWc)
    val gotGrep = Files.readAllBytes(Paths.get(out2, "part-00000"))
    val wantGrep = Files.readAllBytes(Paths.get(s"$ref/correct/grep_correct.txt"))
    assert(gotGrep.sameElements(wantGrep))
  }

  test("FIFO admission: a queued job waits for the running job (forked)") {
    // the delegated C3 ordering pinned observably: in a 1-slot forked JVM
    // (the shared session has 32 slots — both jobs would just run), the
    // second of two concurrent submissions starts only after the first
    // completes. See FifoMain for the timing contract.
    val code = ForkedJvm.run("graft.FifoMain", "1g", Seq.empty)
    assert(code == 0, s"forked FIFO run exited $code")
  }

  test("status sees a job in another process via the REST probe (forked)") {
    // bin/mapreduce status parity across process boundaries: the forked
    // JVM hosts the UI-enabled sessions of the test run and probes them
    // over real loopback HTTP — up ⇒ app id + task slots, stopped ⇒
    // nothing; plus the --port scenario (UI on 4099: default walk blind,
    // explicit port sighted). See StatusMain for the exact assertions.
    val code = ForkedJvm.run("graft.StatusMain", "1g", Seq.empty)
    assert(code == 0, s"forked status probe exited $code")
  }

  test("pipePerFile spawns the mapper exactly once per input file") {
    // reference worker/__main__.py:94-101: one Popen per input FILE. A
    // mapper with per-invocation state (here: a header record per run)
    // observes the difference — default per-partition piping splits a
    // large file across several processes, per-file mode never does.
    val inDir = Files.createTempDirectory("graft-mr-perfile")
    Files.writeString(inDir.resolve("file01"), "alpha\n")
    Files.writeString(inDir.resolve("file02"), "beta\ngamma\n")
    // large enough that textFile's goalSize splits it into >=2 blocks
    val bigLines = (1 to 4000).map(i => f"line$i%06d")
    Files.writeString(inDir.resolve("file03"), bigLines.mkString("", "\n", "\n"))
    val mapper = inDir.resolve("header_map.sh")
    Files.writeString(mapper, "#!/bin/sh\nprintf 'HEADER\\t1\\n'\ncat\n")
    val reducer = inDir.resolve("identity_reduce.sh")
    Files.writeString(reducer, "#!/bin/sh\ncat\n")
    import java.nio.file.attribute.PosixFilePermissions
    Seq(mapper, reducer).foreach(p =>
      Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwxr-xr-x")))
    // input files only — the scripts must not be scanned as data
    val dataDir = Files.createTempDirectory("graft-mr-perfile-in")
    Seq("file01", "file02", "file03").foreach(f =>
      Files.copy(inDir.resolve(f), dataDir.resolve(f)))

    def headerCount(out: String): Int =
      partFiles(out).flatMap(readLines).count(_ == "HEADER\t1")

    val outPerFile = tmpOut()
    MapReduce.run(spark, JobSpec(
      dataDir.toString, outPerFile, mapper.toString, reducer.toString,
      numMappers = 2, numReducers = 2, pipePerFile = true))
    assert(headerCount(outPerFile) == 3,
      "per-file mode must spawn exactly one mapper per file")
    // content parity: every data line still flows through the shuffle
    val dataLines = partFiles(outPerFile).flatMap(readLines)
      .filterNot(_ == "HEADER\t1").sorted
    assert(dataLines == (Seq("alpha", "beta", "gamma") ++ bigLines).sorted)

    // default mode on the same input splits file03 across processes —
    // the divergence this flag exists to close
    val outDefault = tmpOut()
    MapReduce.run(spark, JobSpec(
      dataDir.toString, outDefault, mapper.toString, reducer.toString,
      numMappers = 2, numReducers = 2))
    assert(headerCount(outDefault) > 3)
  }

  test("native and executable word count agree per part file at r=3") {
    val outN = tmpOut()
    val outX = tmpOut()
    Engine.wordCount(spark, s"$ref/input", outN, numReducers = 3)
    MapReduce.run(spark, JobSpec(
      s"$ref/input", outX,
      s"$ref/exec/wc_map.sh", s"$ref/exec/wc_reduce.sh",
      numMappers = 2, numReducers = 3))
    (0 until 3).foreach { i =>
      val p = f"part-$i%05d"
      assert(readLines(Paths.get(outN, p)) == readLines(Paths.get(outX, p)),
        s"partition $p differs")
    }
  }
}
