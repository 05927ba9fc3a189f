package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.Partitioner

/** Hash partitioning with the reference engine's exact assignment rule:
  * `partition = int(md5(key_utf8).hexdigest(), 16) % num_partitions`
  * (reference mapreduce/worker/__main__.py:105-109).
  *
  * Spark's default `HashPartitioner` uses `hashCode % n`, so a custom
  * [[Partitioner]] is required for part-file-level output parity with the
  * reference. MD5-mod is uniform, stable across JVMs and languages, and —
  * unlike `hashCode` — well-defined for empty keys (blank lines are real
  * keys, reference tests/test_worker_04.py:109-115).
  */
object Md5 {
  /** Non-negative MD5(key) mod n, bit-identical to Python's
    * `int(hexdigest, 16) % n`. */
  def mod(key: String, n: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
    val digest = md.digest(key.getBytes(StandardCharsets.UTF_8))
    // BigInt(1, bytes) treats the digest as unsigned, matching int(hex, 16)
    (BigInt(1, digest) mod BigInt(n)).toInt
  }

  /** The record key of a raw `key\tvalue` line: everything before the first
    * tab, or the whole line when no tab is present — `line.split("\t")[0]`
    * semantics (reference mapreduce/worker/__main__.py:105). Note the
    * reference extracts from the line WITH its trailing newline, so a
    * tab-less line hashes with the `\n` included; callers pass the raw
    * newline-terminated line for exact parity.
    */
  def lineKey(line: String): String = {
    val i = line.indexOf('\t')
    if (i >= 0) line.substring(0, i) else line
  }
}

/** Partitioner over raw shuffle lines (newline-terminated): extracts the
  * tab-delimited key, then MD5-mod assigns the partition.
  */
final class Md5LinePartitioner(n: Int) extends Partitioner {
  require(n > 0, s"numPartitions must be positive: $n")
  override def numPartitions: Int = n
  override def getPartition(key: Any): Int =
    Md5.mod(Md5.lineKey(key.asInstanceOf[String]), n)
  override def equals(other: Any): Boolean = other match {
    case o: Md5LinePartitioner => o.numPartitions == n
    case _                     => false
  }
  override def hashCode: Int = n
}
