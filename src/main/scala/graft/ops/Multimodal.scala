package graft.ops

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads as opaque `binary` with typed
  * metadata, processed by batch-shaped partition iterators.
  *
  * The corpus carries no real image/audio bytes, so the payload is the
  * UTF-8 document text standing in for an encoded frame, and the decoder is
  * a STUB — [[StubDecoder.decode]] marks exactly where a real codec
  * (JPEG/ffmpeg) would run. Everything around the stub is real engine
  * plumbing: a typed `Dataset[MediaRow]` with case-class Encoders, per-
  * partition batch processing via `mapPartitions` (one decoder instance per
  * partition, amortized across rows — the Scala analog of a batched
  * `mapInPandas`), deterministic feature schema out.
  *
  * Scale: payload bytes never leave the executor that scanned them — the
  * pipeline is mapPartitions-only (zero shuffles); media tables partition by
  * (source, doc_id range) so a decode pass is embarrassingly parallel. Large
  * payloads should use binary parquet with `spark.sql.files.maxPartitionBytes`
  * tuned so one partition's payloads fit executor memory.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long, mime: String, byte_len: Int,
      brightness_sum: Int, n_frames: Int)

  /** Deterministic stand-in for the media codec. A real deployment replaces
    * this object; the Dataset plumbing around it does not change.
    */
  object StubDecoder {
    /** STUB: real image decode would parse `payload` with an image library
      * (not available in this environment). The fake is deterministic:
      * "brightness" = sum of the first 16 byte values, "frames" = one per
      * 256 bytes — enough to exercise schema, batching, and the oracle.
      */
    def decode(row: MediaRow): MediaFeatures = {
      val bytes = row.payload
      val brightness = bytes.take(16).map(_ & 0xff).sum
      MediaFeatures(row.doc_id, row.mime, bytes.length, brightness,
        bytes.length / 256 + 1)
    }
  }

  /** A REAL image codec behind the same boundary — javax.imageio (JDK
    * built-in readers: PNG, BMP, GIF, JPEG). Proves the `mapPartitions`
    * plumbing carries an actual decoder unchanged: same input contract
    * (opaque payload bytes), same [[MediaFeatures]] schema out.
    * `brightness_sum` is the integer-luma sum over all pixels
    * (Rec.601 weights in integer arithmetic — bit-reproducible across
    * JVMs, no float accumulation), `n_frames` = 1 for stills. The stub
    * remains the registry/oracle path because the synthetic corpus
    * carries text bytes, not encoded images; `MultimodalSpec` drives this
    * decoder over real generated PNGs.
    */
  object ImageIoDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
      require(img != null, s"payload of doc ${row.doc_id} is not a decodable image")
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          x += 1
        }
        y += 1
      }
      MediaFeatures(row.doc_id, row.mime, row.payload.length,
        math.min(sum, Int.MaxValue).toInt, 1)
    }
  }

  /** documents → media table: text bytes as the opaque payload, source as a
    * mime-ish tag. Real pipelines read binary parquet directly.
    */
  def asMediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("source").as("mime"), col("text"))
      .as[(Long, String, String)]
      .map { case (id, mime, text) =>
        MediaRow(id, mime, text.getBytes(StandardCharsets.UTF_8)) }
  }

  /** Batch decode: one iterator pass per partition, decoder state
    * instantiated once per partition, not per row. The codec is a plain
    * function so the SAME plumbing carries the deterministic stub (the
    * registry/oracle path) or a real codec ([[ImageIoDecoder]]) — swapping
    * decoders changes zero plan shape.
    */
  def decodeFeatures(media: Dataset[MediaRow],
                     codec: MediaRow => MediaFeatures = StubDecoder.decode)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init of the codec happens here
      rows.map(codec)
    }
  }

  /** Frame sampling: every nth 256-byte "frame" of the payload, keyed
    * (doc_id, frame_no) — shape of a video frame-sampling pass.
    */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val frames = r.payload.grouped(256).zipWithIndex
      frames.collect { case (bytes, i) if i % everyN == 0 =>
        (r.doc_id, i, bytes.length, bytes.take(4).map(_ & 0xff).sum) }
    }.toDF("doc_id", "frame_no", "frame_bytes", "frame_header_sum")
  }

  /** PCM stand-in codec: the payload bytes read directly as unsigned 8-bit
    * samples — the registry/oracle path (the synthetic corpus carries text
    * bytes, not encoded audio; DuckDB mirrors u8 sample algebra exactly).
    */
  object StubPcm {
    def samples(row: MediaRow): Array[Int] = row.payload.map(_ & 0xff)
  }

  /** A REAL audio codec behind the same boundary — javax.sound.sampled
    * (JDK built-in WAV/AIFF/AU parsers), mirroring [[ImageIoDecoder]] on
    * the image side. Decodes the container to channel-0 integer PCM
    * amplitudes (8-bit unsigned or 16-bit signed, either endianness — the
    * formats the JDK emits), which then flow through the SAME
    * [[windowRms]] algebra as the stub: swapping codecs changes zero plan
    * shape. A non-audio payload fails loudly at the codec.
    */
  object WavDecoder {
    def samples(row: MediaRow): Array[Int] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(row.payload))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        require(bits == 8 || bits == 16,
          s"doc ${row.doc_id}: unsupported sample size $bits")
        val frameSize = fmt.getFrameSize
        val bytes = in.readAllBytes()
        val n = bytes.length / frameSize
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val off = i * frameSize // channel 0 leads each frame
          out(i) =
            if (bits == 8) bytes(off) & 0xff // WAV 8-bit is unsigned
            else if (fmt.isBigEndian) (bytes(off) << 8) | (bytes(off + 1) & 0xff)
            else (bytes(off + 1) << 8) | (bytes(off) & 0xff)
          i += 1
        }
        out
      } finally in.close()
    }
  }

  /** Audio-shaped pass: the payload decoded to integer PCM samples,
    * per-window RMS energy + peak — the feature shape of a VAD /
    * loudness-normalization stage, completing the modality trio next to
    * the image-shaped [[decodeFeatures]] and video-shaped
    * [[sampleFrames]]. Integer sum-of-squares per window with ONE final
    * division and sqrt (IEEE sqrt is correctly rounded, so the doubles
    * are engine-reproducible); peak is max |amplitude|. The codec is a
    * plain function like [[decodeFeatures]]'s: [[StubPcm]] is the
    * registry/oracle path, [[WavDecoder]] the real-container path
    * (`MultimodalSpec` proves both through the same algebra).
    * mapPartitions-shaped like the rest: payload bytes never shuffle.
    */
  def windowRms(media: Dataset[MediaRow], windowSamples: Int = 128,
                codec: MediaRow => Array[Int] = StubPcm.samples): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      codec(r).grouped(windowSamples).zipWithIndex.map { case (s, i) =>
        var sumSq = 0L
        var peak = 0
        s.foreach { v => sumSq += v.toLong * v; if (math.abs(v) > peak) peak = math.abs(v) }
        (r.doc_id, i, s.length, math.sqrt(sumSq.toDouble / s.length), peak)
      }
    }.toDF("doc_id", "window_no", "n_samples", "rms", "peak")
  }

  /** Voice-activity segmentation over the decoded PCM stream: per-window
    * integer energy (sum of squares — no division, no floats), a window is
    * SPEECH when energy ≥ thr²·n (the integer form of rms ≥ thr), and
    * maximal consecutive speech runs become segments via gaps-and-islands
    * (window_no − row_number per doc). The silence-split deliverable a
    * speech pipeline cuts clips with, one step past [[windowRms]]'s raw
    * feature pass; same codec boundary, payload bytes never shuffle, the
    * islands windows are doc-partitioned.
    */
  def silenceSegments(media: Dataset[MediaRow], windowSamples: Int = 128,
                      thr: Int = 100,
                      codec: MediaRow => Array[Int] = StubPcm.samples): DataFrame = {
    import media.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val wins = media.flatMap { r =>
      codec(r).grouped(windowSamples).zipWithIndex.map { case (s, i) =>
        var sumSq = 0L
        s.foreach { v => sumSq += v.toLong * v }
        (r.doc_id, i, s.length, sumSq)
      }
    }.toDF("doc_id", "window_no", "n_samples", "energy")
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("window_no"))
    wins.filter(col("energy") >= lit(thr.toLong * thr) * col("n_samples"))
      .withColumn("grp", col("window_no") - row_number().over(wOrd))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("window_no")).as("start_window"),
        max(col("window_no")).as("end_window"),
        count(lit(1)).as("n_windows"),
        sum(col("energy")).as("energy_sum"))
      .withColumn("seg_no", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("start_window"))).cast("int"))
      .select(col("doc_id"), col("seg_no"), col("start_window"),
        col("end_window"), col("n_windows"), col("energy_sum"))
  }

  /** Contrast (luma variance) census — the flat/blurred-image filter an
    * image-curation pass runs before spending embedding compute: per doc
    * the exact integer pixel moments (n, Σ, Σ²) and the variance
    * numerator n·Σ² − (Σ)², with variance itself as the one terminal
    * double division. Same stub-codec convention as the other mm_*
    * surfaces; one map over payload bytes, nothing shuffles but the
    * per-doc census row.
    */
  def contrastCensus(media: Dataset[MediaRow],
                     codec: MediaRow => Array[Int] = StubPcm.samples): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      val px = codec(r)
      var s = 0L; var s2 = 0L
      px.foreach { v => s += v; s2 += v.toLong * v }
      (r.doc_id, px.length, s, s2)
    }.toDF("doc_id", "n_px", "lum_sum", "lum_sumsq")
      .withColumn("var_num",
        col("n_px") * col("lum_sumsq") - col("lum_sum") * col("lum_sum"))
      .withColumn("contrast_var",
        col("var_num").cast("double") /
          (col("n_px").cast("double") * col("n_px").cast("double")))
  }

  /** Pure integer k×k box downsample of a row-major pixel grid — the
    * resize kernel itself, decoder-agnostic: the census below feeds it
    * stub-grid pixels (payload bytes as a `srcW`-wide u8 grid), and
    * `MultimodalSpec` feeds it REAL decoded image luma (javax.imageio),
    * proving the same arithmetic serves both paths. Integer mean
    * (truncating div by k²) keeps every output bit-reproducible — no
    * float accumulation, no platform rounding.
    *
    * @return (outH, outW, row-major downsampled pixels)
    */
  def boxDownsample(px: Array[Int], srcW: Int, factor: Int): (Int, Int, Array[Int]) = {
    require(srcW > 0 && factor > 0 && srcW % factor == 0,
      s"srcW=$srcW must be a positive multiple of factor=$factor")
    val h = px.length / srcW          // full rows only; a ragged tail is cropped
    val outH = h / factor
    val outW = srcW / factor
    val out = new Array[Int](outH * outW)
    var r0 = 0
    while (r0 < outH) {
      var c0 = 0
      while (c0 < outW) {
        var s = 0
        var i = 0
        while (i < factor) {
          var j = 0
          while (j < factor) {
            s += px((r0 * factor + i) * srcW + c0 * factor + j)
            j += 1
          }
          i += 1
        }
        out(r0 * outW + c0) = s / (factor * factor)
        c0 += 1
      }
      r0 += 1
    }
    (outH, outW, out)
  }

  /** Image-resize census: payload interpreted as a `srcW`-wide u8 pixel
    * grid, box-downsampled by `factor`, summarized per document (the
    * thumbnail-generation pass of a vision-data pipeline, with the same
    * stub-codec convention as the other mm_* surfaces — the plumbing,
    * schema, and integer kernel are real; a deployment swaps the grid
    * source for decoded frames). mapPartitions-shaped: payload bytes
    * never shuffle; emitting the per-doc census rather than per-pixel
    * rows keeps output O(docs) however large the media.
    */
  def resizeBoxCensus(media: Dataset[MediaRow], srcW: Int = 16,
                      factor: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      val px = r.payload.map(_ & 0xff)
      val (outH, outW, out) = boxDownsample(px, srcW, factor)
      val sum = out.foldLeft(0L)(_ + _)
      val mn = if (out.isEmpty) -1 else out.min
      val mx = if (out.isEmpty) -1 else out.max
      (r.doc_id, outH, outW, sum, mn, mx)
    }.toDF("doc_id", "out_h", "out_w", "px_sum", "px_min", "px_max")
  }

  /** Perceptual-hash near-dup pairs (the pHash shape with the exact-integer
    * Walsh-Hadamard transform — see `mm_phash_neardup`): banded Hamming
    * candidate join (4 bands × 16 bits; Hamming ≤ 3 pigeonholes into one
    * untouched band) + exact popcount verify. Returns (doc_a, doc_b,
    * hamming). Shared by the pair census, the cluster resolution and the
    * cross-modal census.
    */
  def phashPairs(spark: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val sig = docs
      .withColumn("sig", expr("graft_wht_sign_hash(text)"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("sig"))
    val bands = sig
      .withColumn("b", explode(expr("sequence(0, 3)")))
      .withColumn("v", expr("shiftright(sig, CAST(b * 16 AS INT)) & 65535"))
    bands.as("a")
      .join(bands.as("c"),
        col("a.b") === col("c.b") && col("a.v") === col("c.v") &&
          col("a.doc_id") < col("c.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.sig").as("sa"),
        col("c.doc_id").as("doc_b"), col("c.sig").as("sb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS INT)"))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Audio-fingerprint near-dup pairs (the Shazam constellation shape —
    * see `mm_audio_fingerprint`): frame-energy peak constellation hashed
    * as consecutive-peak pairs, df-capped (≤20) inverted index, pairs with
    * ≥2 shared hashes. Returns (doc_a, doc_b, n_shared). */
  def audioFingerprintPairs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fr = docs
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, CAST(ceil(length(text) / 64.0) AS INT) - 1),
          |  i -> aggregate(
          |         transform(sequence(1, least(4, length(text) - i * 64)),
          |                   k -> ascii(substring(text, i * 64 + k, 1))),
          |         0, (acc, x) -> acc + x))""".stripMargin))
        .as(Seq("frame_no", "energy")))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
    val peaks = fr
      .withColumn("prev", lag(col("energy"), 1).over(wd))
      .withColumn("next", lead(col("energy"), 1).over(wd))
      .filter(col("prev").isNotNull && col("next").isNotNull &&
        col("energy") > col("prev") && col("energy") >= col("next"))
      .select(col("doc_id"), col("frame_no"), col("energy"))
    val wp = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
    val fp = peaks
      .withColumn("e2", lead(col("energy"), 1).over(wp))
      .withColumn("f2", lead(col("frame_no"), 1).over(wp))
      .filter(col("e2").isNotNull)
      .select(col("doc_id"), (col("energy") * 102000 + col("e2") * 100 +
        least(col("f2") - col("frame_no"), lit(99))).as("h"))
      .distinct()
    val df = fp.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val rare = fp.join(df.filter(col("df") <= 20), Seq("h"))
    rare.as("a").join(rare.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
  }
}
