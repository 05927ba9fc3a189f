package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.TextOps

/** Planted-frame semantics for the context-window chunker
  * (TextOps.chunkTokens) and the character-entropy signal
  * (TextOps.charEntropy). The oracle rows pin cross-engine agreement on
  * the real corpus; here the right answers are known by construction.
  */
class ChunkSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** A doc of n tokens "t1 t2 ... tn". */
  private def docOf(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")

  test("chunk count follows 1 + ceil(max(n-32,0)/24) and windows tile the doc") {
    val s = TestSpark.spark
    import s.implicits._
    // boundary token counts around the window(32)/stride(24) grid
    val ns = Seq(1, 24, 32, 33, 56, 57, 90)
    val df = ns.map(n => (n.toLong, docOf(n))).toDF("doc_id", "text")
    val rows = TextOps.chunkTokens(df, 32, 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val byDoc = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc.keySet == ns.map(_.toLong).toSet)
    val expectChunks = Map(1 -> 1, 24 -> 1, 32 -> 1, 33 -> 2, 56 -> 2,
      57 -> 3, 90 -> 4)
    for (n <- ns) {
      val cs = byDoc(n.toLong)
      assert(cs.length == expectChunks(n), s"n=$n")
      // chunks start on the stride grid, are clipped to the doc end, and
      // together cover every token index exactly (the last chunk ends at
      // n; interior chunks are full windows, so consecutive chunks
      // overlap by window − stride = 8 tokens)
      for (((_, id, start, len, _), i) <- cs.zipWithIndex) {
        assert(id == i && start == 24L * i, s"n=$n chunk $i")
        assert(len == math.min(32L, n - start), s"n=$n chunk $i")
        assert(len >= 1, s"n=$n chunk $i empty")
      }
      assert(cs.last._3 + cs.last._4 == n, s"n=$n last chunk must end at n")
      val covered = cs.flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert(covered == (0L until n).toSet, s"n=$n coverage")
    }
  }

  test("chunk_md5 hashes the exact lowercased token slice") {
    val s = TestSpark.spark
    import s.implicits._
    // 40 tokens with double spaces and mixed case: the chunker must
    // lowercase and drop empty tokens BEFORE windowing
    val toks = (1 to 40).map(i => s"W$i")
    val df = Seq((7L, toks.mkString("  "))).toDF("doc_id", "text")
    val got = TextOps.chunkTokens(df, 32, 24).orderBy("chunk_id")
      .select("chunk_md5").as[String].collect().toSeq
    val lower = toks.map(_.toLowerCase)
    assert(got == Seq(
      md5hex(lower.slice(0, 32).mkString(" ")),
      md5hex(lower.slice(24, 40).mkString(" "))))
  }

  test("charEntropy matches hand-computed values on planted docs") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(
      (1L, "aaaa"),         // one char class → entropy exactly 0
      (2L, "ab"),           // two singletons → ln 2
      (3L, "aabb"),         // two classes of 2 → ln 2 again
      (4L, "aab")           // H = ln 3 − (2 ln 2)/3
    ).toDF("doc_id", "text")
    val got = TextOps.charEntropy(df).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got(0) == ((1L, 4L, 1L, 0.0)))
    assert(got(1) == ((2L, 2L, 2L, 0.693147)))
    assert(got(2) == ((3L, 4L, 2L, 0.693147)))
    // round(ln 3 − round(2·ln 2, 6)/3, 6) = round(1.0986122886 −
    // 1.386294/3, 6) = round(0.6365142886, 6)
    assert(got(3) == ((4L, 3L, 2L, 0.636514)))
    // the +0.0 normalization: no −0.0 can ever surface
    assert(!got.exists(r => r._4.equals(-0.0)))
  }
}
