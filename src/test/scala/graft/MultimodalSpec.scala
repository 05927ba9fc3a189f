package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The multimodal plumbing contract: typed binary media schema, decode
  * output schema, per-partition execution shape.
  */
class MultimodalSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("media table exposes binary payloads with typed metadata") {
    val m = Multimodal.media(spark, sfDir)
    assert(m.schema("blob").dataType == BinaryType)
    assert(m.schema("media_type").dataType == StringType)
    assert(m.schema("n_bytes").dataType == LongType)
    val types = m.select("media_type").distinct().collect()
      .map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("TRUE binary payloads: byte-exact hashing, slicing and decode " +
      "(full 0-255 range, NULs, invalid UTF-8)") {
    // r17 audit note: the media table is synthesized from documents.text,
    // so the byte-range/decode paths had never seen real binary. This
    // plants genuinely binary blobs — every byte value 0-255, embedded
    // NULs, standalone invalid-UTF-8 bytes — and pins the three
    // properties a production blob store needs:
    //   1. md5-on-binary groups BYTES exactly: blobs differing in one
    //      invalid-UTF-8 byte (0x80 vs 0x81) hash apart, byte-identical
    //      copies group;
    //   2. frame fingerprints (the q_multimodal_frames kernel: md5 over
    //      a BinaryType substring) are byte-indexed and distinguish that
    //      pair — byte slicing is well-defined on arbitrary payloads,
    //      where the character-indexed slice it replaced walks invalid
    //      bytes with UTF-8 code-point heuristics;
    //   3. decode's mapPartitions plumbing survives arbitrary bytes and
    //      stays deterministic (same blob → same checksum across runs).
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val allBytes = Array.tabulate[Byte](256)(i => i.toByte)
    val b80 = Array[Byte](0x41, 0x80.toByte, 0x00, 0x42)
    val b81 = Array[Byte](0x41, 0x81.toByte, 0x00, 0x42)
    val rows = Seq(
      (0L, allBytes), (1L, allBytes), // byte-identical pair
      (2L, b80), (3L, b81))           // string-image-identical pair
    val m = rows.toDF("doc_id", "blob")
      .withColumn("media_type", lit("image"))
      .withColumn("n_bytes", length(col("blob")).cast("long"))
    // 1. binary-safe content hashing
    val groups = m.groupBy(md5(col("blob")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
      .collect().map(r => (r.getAs[Long]("n"), r.getAs[Long]("keeper")))
      .sortBy(_._2).toList
    assert(groups == List((2L, 0L), (1L, 2L), (1L, 3L)),
      s"md5-on-binary grouped wrong: $groups")
    // 2. byte-sliced frame fingerprints (the q_multimodal_frames kernel)
    val fps = m.filter(col("doc_id") >= 2)
      .select(md5(substring(col("blob"), lit(1), lit(100))))
      .distinct().count()
    assert(fps == 2, "BinaryType substring fingerprints collided on " +
      "invalid-UTF-8 bytes")
    // 3. decode plumbing over arbitrary bytes, deterministic
    def dec() = Multimodal.decode(s, m).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getLong(5)))
      .sortBy(_._1).toList
    val d1 = dec()
    assert(d1 == dec(), "decode not deterministic on binary payloads")
    assert(d1.map(_._1) == List(0L, 1L, 2L, 3L))
    // width/height derive from BYTE length (256 and 4), not char count
    assert(d1.head._2 == (256 % 64) + 16 && d1.head._3 == (256 % 48) + 9)
    assert(d1(2)._2 == (4 % 64) + 16)
    // byte-identical blobs decode identically; the invalid-UTF-8 pair's
    // checksums MAY agree (both smear to U+FFFD in the stub's text
    // decode — the documented stub seam), but ids/dims must not
    assert(d1(0)._4 == d1(1)._4)
  }

  test("decode emits the typed struct and keeps the input partitioning") {
    val s = spark
    val media = Multimodal.media(s, sfDir).repartition(6)
    val dec = Multimodal.decode(s, media)
    assert(dec.schema.fieldNames.toSeq ==
      Seq("doc_id", "media_type", "width", "height", "n_px", "checksum"))
    // mapPartitions is a narrow transformation: no shuffle, 6 in → 6 out
    assert(dec.rdd.getNumPartitions == 6)
    val row = dec.filter("doc_id = 0").collect()(0)
    assert(row.getLong(4) == row.getInt(2).toLong * row.getInt(3))
    assert(row.getLong(5) > 0) // checksum of real bytes
  }
}
