package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("resizeStub: nearest-neighbor indices, identity at same length, empty in = empty out") {
    val bytes = Array.tabulate(8)(i => (i * 10).toByte)
    // downsample 8 → 4: indices (i*8)/4 = 0,2,4,6
    assert(Multimodal.resizeStub(bytes, 4).toSeq == Seq(0, 20, 40, 60))
    // identity when outLen == n
    assert(Multimodal.resizeStub(bytes, 8).toSeq == bytes.map(_ & 0xff).toSeq)
    // upsample repeats neighbors: 2 → 4 gives indices 0,0,1,1
    assert(Multimodal.resizeStub(Array[Byte](1, 2), 4).toSeq == Seq(1, 1, 2, 2))
    assert(Multimodal.resizeStub(Array.empty[Byte], 4).isEmpty)
    // high bytes are unsigned
    assert(Multimodal.resizeStub(Array[Byte](-1), 2).toSeq == Seq(255, 255))
  }

  test("resize Dataset path: schema, means, and empty payloads") {
    import spark.implicits._
    val docs = Seq((1L, "abcd"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.withBinaryColumn(docs, "text", "doc_id")
    val out = Multimodal.resize(media, outLen = 2).collect()
      .map(r => r.id -> r).toMap
    assert(out(1L).resized == Seq('a'.toInt, 'c'.toInt))
    assert(out(1L).resized_mean == ('a'.toInt + 'c'.toInt) / 2.0)
    assert(out(2L).resized.isEmpty && out(2L).resized_mean == 0.0)
    intercept[IllegalArgumentException](Multimodal.resize(media, 0))
  }
}
