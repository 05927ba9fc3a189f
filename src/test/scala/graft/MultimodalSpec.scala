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
