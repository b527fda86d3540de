package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "abcd", "src0"),
      (1L, "x" * 600, "src1")   // 3 frames of 256
    ).toDF("doc_id", "text", "source")
  }

  test("binary payload round-trip with typed Dataset and stub decode") {
    val feats = Multimodal.decodeFeatures(Multimodal.asMediaTable(spark, docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(0L).byte_len == 4)
    assert(feats(0L).brightness_sum == 'a' + 'b' + 'c' + 'd')
    assert(feats(0L).n_frames == 1)
    assert(feats(1L).byte_len == 600)
    assert(feats(1L).brightness_sum == 'x'.toInt * 16)
    assert(feats(1L).n_frames == 3)
    assert(feats(1L).mime == "src1")
  }

  test("frame sampling emits every nth 256-byte frame") {
    val frames = Multimodal.sampleFrames(Multimodal.asMediaTable(spark, docs), everyN = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getInt(3))).toMap
    // doc 1: frames 0,1,2 → sampled 0 and 2; frame 2 has 600-512=88 bytes
    assert(frames.keySet == Set((0L, 0), (1L, 0), (1L, 2)))
    assert(frames((1L, 0))._1 == 256)
    assert(frames((1L, 2))._1 == 88)
    assert(frames((1L, 0))._2 == 'x'.toInt * 4)
  }
}
