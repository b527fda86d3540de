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

  test("real WAV decode through the same windowRms algebra (javax.sound.sampled)") {
    import spark.implicits._
    import Multimodal.{MediaRow, WavDecoder}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // deterministic 16-bit signed little-endian mono PCM: a ramp with
    // negative excursions, so signedness and endianness both matter
    val pcm: Array[Int] = (0 until 300).map(i => (i * 37) % 2000 - 1000).toArray
    def wav(samples: Array[Int], bigEndian: Boolean): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (v, i) =>
        val (hi, lo) = ((v >> 8).toByte, (v & 0xff).toByte)
        if (bigEndian) { bytes(2 * i) = hi; bytes(2 * i + 1) = lo }
        else { bytes(2 * i) = lo; bytes(2 * i + 1) = hi }
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, bigEndian)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      MediaRow(1L, "audio/wav", wav(pcm, bigEndian = false)),
      MediaRow(2L, "audio/wav", wav(pcm, bigEndian = true))).toDS().repartition(2)
    val rows = Multimodal.windowRms(media, windowSamples = 128, codec = WavDecoder.samples)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getDouble(3), r.getInt(4))).toMap
    // expected straight from the source samples
    val expect = pcm.grouped(128).zipWithIndex.map { case (s, i) =>
      i -> (s.length, math.sqrt(s.map(v => v.toLong * v).sum.toDouble / s.length),
        s.map(math.abs).max)
    }.toMap
    for (doc <- Seq(1L, 2L); (i, (n, rms, peak)) <- expect) {
      assert(rows((doc, i)) == ((n, rms, peak)),
        s"doc $doc window $i: ${rows((doc, i))} != ${(n, rms, peak)}")
    }
    assert(rows.size == 2 * expect.size) // 300 samples -> 3 windows per doc
    // a non-audio payload fails loudly at the codec, not silently
    val bad = Seq(MediaRow(3L, "audio/wav", Array[Byte](9, 9, 9))).toDS()
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.windowRms(bad, codec = WavDecoder.samples).collect()
    }
    assert(err.getMessage != null)
  }

  test("real PNG decode through the same mapPartitions boundary (javax.imageio)") {
    import spark.implicits._
    import Multimodal.{ImageIoDecoder, MediaRow}
    // deterministic 3x2 PNG: known RGB per pixel → known integer-luma sum
    def png(pixels: Seq[Seq[Int]]): Array[Byte] = {
      val h = pixels.size; val w = pixels.head.size
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def luma(rgb: Int): Long =
      ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
    val pxA = Seq(Seq(0xffffff, 0x000000, 0x804020), Seq(0x123456, 0xabcdef, 0x00ff00))
    val pxB = Seq(Seq(0x101010), Seq(0xfefefe))
    val bytesA = png(pxA); val bytesB = png(pxB)
    val media = Seq(MediaRow(1L, "image/png", bytesA), MediaRow(2L, "image/png", bytesB))
      .toDS().repartition(2)
    val feats = Multimodal.decodeFeatures(media, ImageIoDecoder.decode)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).brightness_sum == pxA.flatten.map(luma).sum)
    assert(feats(2L).brightness_sum == pxB.flatten.map(luma).sum)
    assert(feats(1L).byte_len == bytesA.length && feats(1L).n_frames == 1)
    assert(feats(2L).mime == "image/png")
    // a non-image payload fails loudly at the codec, not silently
    val bad = Seq(MediaRow(3L, "image/png", Array[Byte](1, 2, 3))).toDS()
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(bad, ImageIoDecoder.decode).collect()
    }
    assert(err.getMessage != null)
  }

  test("box downsample: real decoded PNG luma through the same integer kernel") {
    // 8x8 gradient, PNG round-trip (lossless), Rec.601 integer luma — the
    // REAL-decode path feeding the SAME kernel the stub-grid census uses
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = y * 8 + x * 2
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val luma = (for (y <- 0 until 8; x <- 0 until 8) yield {
      val rgb = decoded.getRGB(x, y)
      ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
    }).toArray
    val (h, w, out) = Multimodal.boxDownsample(luma, 8, 2)
    assert(h == 4 && w == 4)
    for (r0 <- 0 until 4; c0 <- 0 until 4) {
      val s = (for (i <- 0 until 2; j <- 0 until 2)
        yield luma((r0 * 2 + i) * 8 + c0 * 2 + j)).sum
      assert(out(r0 * 4 + c0) == s / 4, s"block ($r0,$c0)")
    }
    // ragged tail is cropped: 6 extra pixels do not form a full row
    val (h2, _, out2) = Multimodal.boxDownsample(luma ++ Array(9, 9, 9, 9, 9, 9), 8, 2)
    assert(h2 == 4 && out2.toSeq == out.toSeq)
    // width not a multiple of the factor fails loudly
    intercept[IllegalArgumentException](Multimodal.boxDownsample(luma, 8, 3))
  }

  test("silence segmentation: a quiet middle window splits speech into two segments") {
    import spark.implicits._
    // 'z' (122² = 14884 ≥ thr²=10000) is speech; ' ' (32² = 1024) is
    // silence — windows 0 and 2 are speech islands split by window 1
    val d = Seq((7L, "z" * 128 + " " * 128 + "z" * 128, "src"))
      .toDF("doc_id", "text", "source")
    val segs = Multimodal.silenceSegments(Multimodal.asMediaTable(spark, d),
        windowSamples = 128, thr = 100)
      .orderBy("seg_no").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(segs.toSeq == Seq((1, 0, 0, 1L), (2, 2, 2, 1L)))
  }
}
