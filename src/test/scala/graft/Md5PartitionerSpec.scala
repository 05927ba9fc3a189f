package graft

import scala.sys.process._
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{Md5, Md5LinePartitioner}

/** Property tests for the MD5 partitioner against the reference rule
  * `int(md5(key.encode("utf-8")).hexdigest(), 16) % n`
  * (reference mapreduce/worker/__main__.py:105-109; empty-key semantics
  * per tests/test_worker_04.py:109-115). Expected values come from running
  * the actual Python expression.
  */
class Md5PartitionerSpec extends AnyFunSuite {

  /** Compute the reference's partition assignment in actual Python. */
  private def pythonMd5Mod(keys: Seq[String], n: Int): Seq[Int] = {
    val script =
      s"""import hashlib, sys
         |n = $n
         |for key in sys.stdin.read().split("\\x00")[:-1]:
         |    print(int(hashlib.md5(key.encode("utf-8")).hexdigest(), 16) % n)
         |""".stripMargin
    val input = keys.map(_ + "\u0000").mkString
    val out = (Seq("python3", "-c", script) #<
      new java.io.ByteArrayInputStream(input.getBytes("UTF-8"))).!!
    out.trim.split("\n").toSeq.map(_.toInt)
  }

  test("matches Python md5 % n on edge-case keys (empty, unicode, tabs)") {
    val keys = Seq("", "a", "the", "product", "hello world", "naïve",
      "日本語", "x" * 300, "0", "-1", "ключ", "line\nwith\nnewlines")
    for (n <- Seq(1, 2, 3, 7, 64)) {
      val expected = pythonMd5Mod(keys, n)
      val got = keys.map(Md5.mod(_, n))
      assert(got == expected, s"mismatch at n=$n")
    }
  }

  test("matches Python on 200 random keys at random moduli") {
    val rnd = new Random(42)
    val keys = Seq.fill(200)(rnd.alphanumeric.take(rnd.nextInt(30)).mkString)
    for (n <- Seq.fill(5)(rnd.nextInt(99) + 1)) {
      assert(keys.map(Md5.mod(_, n)) == pythonMd5Mod(keys, n),
        s"mismatch at n=$n")
    }
  }

  test("partition assignment is total, in range, and stable") {
    val rnd = new Random(7)
    (1 to 500).foreach { _ =>
      val key = rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      val n = rnd.nextInt(100) + 1
      val p = Md5.mod(key, n)
      assert(p >= 0 && p < n)
      assert(p == Md5.mod(key, n))
    }
  }

  test("line-key extraction matches split-on-first-tab semantics") {
    assert(Md5.lineKey("foo\tbar\n") == "foo")
    assert(Md5.lineKey("foo\tbar\tbaz\n") == "foo")
    assert(Md5.lineKey("\t1\n") == "")
    assert(Md5.lineKey("notab\n") == "notab\n") // newline stays, as in Python
    assert(Md5.lineKey("") == "")
  }

  test("partitioner groups equal keys together regardless of value") {
    val part = new Md5LinePartitioner(8)
    assert(part.getPartition("key\tvalue1\n") == part.getPartition("key\tvalue2\n"))
  }
}
