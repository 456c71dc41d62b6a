package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fromDocuments(
    Seq((1L, "hello world", "s1"), (2L, "abcabcabc", "s2"))
      .toDF("doc_id", "text", "source"))

  test("fromDocuments produces binary content with typed metadata") {
    val rows = media.orderBy("media_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Array[Byte]]("content").sameElements("hello world".getBytes("UTF-8")))
    val meta = rows(0).getStruct(rows(0).fieldIndex("meta"))
    assert(meta.getAs[Long]("n_bytes") == 11L)
  }

  test("extractFeatures: deterministic stub features, batch shape preserved") {
    val f1 = Multimodal.extractFeatures(media, batchSize = 1).orderBy("media_id").collect()
    val f64 = Multimodal.extractFeatures(media, batchSize = 64).orderBy("media_id").collect()
    assert(f1.length == 2 && f64.length == 2)
    // batch size must not change results
    (f1 zip f64).foreach { case (a, b) =>
      assert(a.getSeq[Float](2) == b.getSeq[Float](2))
    }
    val feats = f1(0).getSeq[Float](2)
    assert(feats.length == Multimodal.featureDim)
    assert(math.abs(feats.sum - 1.0f) < 1e-5) // L1-normalized histogram
  }

  test("repartitionForDecode spreads rows by id hash") {
    val parts = Multimodal.repartitionForDecode(media, 4).rdd.getNumPartitions
    assert(parts == 4)
  }

  test("resize stride-samples content and updates metadata") {
    val r = Multimodal.resize(media, targetBytes = 4).orderBy("media_id").collect()
    val c1 = r(0).getAs[Array[Byte]]("content")
    assert(c1.length == 4)
    // deterministic stride: byte i = input(floor(i*11/4)) -> indices 0,2,5,8
    assert(new String(c1, "UTF-8") == "hl r")
    assert(r(0).getStruct(r(0).fieldIndex("meta")).getAs[Long]("n_bytes") == 4L)
    // short payloads pass through untouched
    val small = Multimodal.resize(media, targetBytes = 1024).orderBy("media_id").collect()
    assert(small(0).getAs[Array[Byte]]("content").length == 11)
  }

  test("sampleFrames explodes evenly-spaced slices") {
    val frames = Multimodal.sampleFrames(media, frames = 2, frameBytes = 4)
      .where(col("media_id") === 1L)
      .orderBy("frame_idx")
      .collect()
    assert(frames.length == 2)
    assert(new String(frames(0).getAs[Array[Byte]]("frame"), "UTF-8") == "hell")
  }
}
