package graft

import graft.mm.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payloadMeta extracts size/magic without decoding") {
    val assets = Seq((1L, "text", "AB".getBytes("UTF-8")))
      .toDF("asset_id", "media_type", "payload")
    val r = Multimodal.payloadMeta(assets).collect().head
    assert(r.getAs[Long]("n_bytes") == 2L)
    assert(r.getAs[Int]("magic_byte") == 'A'.toInt)
  }

  test("decodeFeatures stub is deterministic and bounded") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(50)
    val feats = Multimodal.decodeFeatures(Multimodal.documentsAsAssets(docs))
    val a = feats.orderBy("asset_id").collect().toSeq
    val b = feats.orderBy("asset_id").collect().toSeq
    assert(a == b)
    assert(a.forall(f => f.width >= 1 && f.width <= 640 && f.n_frames == 1))
  }

  test("sampleFrames emits strided frame indexes per asset") {
    import org.apache.spark.sql.functions.col
    val feats = Seq(
      Multimodal.AssetFeatures(1L, "video", 100, 100, 7, 0.5),
      Multimodal.AssetFeatures(2L, "image", 100, 100, 1, 0.5))
      .toDS()
    val out = Multimodal.sampleFrames(feats, stride = 3)
      .select("asset_id", "frame_idx").as[(Long, Int)].collect().toSet
    assert(out == Set((1L, 0), (1L, 3), (1L, 6), (2L, 0)))
  }

  test("fakeDecode matches direct computation") {
    val payload = "hello".getBytes("UTF-8")
    val f = Multimodal.fakeDecode(7L, "video", payload)
    val sum = payload.map(_ & 0xff).sum.toLong
    assert(f.width == (sum % 640).toInt + 1)
    assert(f.n_frames == (payload.length % 24) + 1)
  }
}
