package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The multimodal plumbing: binary payload round-trip, batch shape, and
  * stub-decode determinism.
  */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("binary payload survives the typed round-trip byte-for-byte") {
    val payload = Array[Byte](0, 1, -1, 127, -128, 42)
    val ds      = Seq(MediaRecord(1L, "image", payload)).toDS()
    val back    = ds.collect().head.payload
    assert(back.toSeq == payload.toSeq)
  }

  test("features are computed per record and schema is stable") {
    val out = Multimodal.features(spark, Sf0001)
    assert(out.columns.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "first_byte", "fake_width", "fake_height"))
    assert(out.count() == 500)
  }

  test("decode stub is deterministic and total (empty payload)") {
    assert(Multimodal.decodeStub(Array.emptyByteArray) == ((0L, 0L, 0L)))
    assert(Multimodal.decodeStub("abc".getBytes) == (('a'.toLong, 3L, 3L)))
  }

  test("batching covers all rows regardless of partition layout") {
    val recs = (1L to 100L).map(i => MediaRecord(i, "image", Array.fill(i.toInt)(7.toByte)))
    val ds   = spark.createDataset(recs).repartition(7)
    val got  = Multimodal.extractFeatures(ds, batchSize = 3).collect()
    assert(got.length == 100)
    assert(got.map(_.n_bytes).sorted.toSeq == (1L to 100L).toSeq)
  }
}
