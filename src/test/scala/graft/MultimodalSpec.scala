package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary-column plumbing + stubbed decode. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "x" * 100), (2L, "abcd"), (3L, "y" * 64)).toDF("doc_id", "text")

  test("asMedia: binary payload with typed metadata") {
    val m = Multimodal.asMedia(docs).orderBy("doc_id").collect()
    assert(m(0).getAs[Array[Byte]]("payload").length === 100)
    val meta = m(0).getStruct(2)
    assert(meta.getAs[Int]("byte_len") === 100)
    assert(meta.getAs[String]("mime") === "text/plain")
    assert(meta.getAs[String]("content_md5").matches("[0-9a-f]{32}"))
  }

  test("frameSample: floor(byte_len / frame) frames, strided indices, empty payloads dropped") {
    val f = Multimodal.frameSample(Multimodal.asMedia(docs), 32, 2)
    val byDoc = f.groupBy("doc_id").agg(collect_list("frame_idx").as("idx"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).sorted).toMap
    assert(byDoc(1L) === Seq(0, 2)) // 100/32 = 3 frames, stride 2 → 0,2
    assert(!byDoc.contains(2L))     // 4 bytes → 0 frames
    assert(byDoc(3L) === Seq(0))    // 64/32 = 2 frames → 0
  }

  test("decodeFeatures: per-partition stub decode yields normalized histograms") {
    val feats = Multimodal.decodeFeatures(spark, Multimodal.asMedia(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).byte_len === 100)
    val hist = feats(1L).histogram
    assert(hist.length === 16)
    assert(math.abs(hist.sum - 1.0) < 1e-9)
    // "x" = 0x78 → bin 7 gets everything
    assert(hist(7) === 1.0)
  }

  test("resizePayload: truncates or zero-pads to the target, meta stays honest") {
    val resized = Multimodal.resizePayload(Multimodal.asMedia(docs), 16)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]]("payload"), r.getStruct(2).getInt(0))).toMap
    resized.foreach { case (_, (payload, metaLen)) =>
      assert(payload.length === 16)
      assert(metaLen === 16)
    }
    // doc 2's 4-byte payload is zero-padded
    val d2 = resized(2L)._1
    assert(d2.drop(4).forall(_ === 0.toByte))
  }
}
