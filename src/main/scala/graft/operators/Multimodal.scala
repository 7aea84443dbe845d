package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decode output row. Top-level (not nested/private) on purpose: the
  * Dataset encoder's generated Java resolves the accessors with Janino,
  * which cannot see a `private` nested class — the whole decode projection
  * would silently fall back to interpreted mode (observed in the r1 bench
  * log as repeated CodeGenerator compile errors). */
case class Decoded(
    media_id: Long, kind: String, width: Int, height: Int, channels: Int,
    n_samples: Long, sample_rate: Int, feature: Array[Float])

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The codec is REAL for the pure-JVM formats: BMP and PNG decode through
  * `javax.imageio` (both readers ship in the JDK, headless-safe) and WAV
  * through `javax.sound.sampled` — no native libs. Payloads whose magic
  * bytes match none of those fall back to a documented deterministic
  * byte-hash pseudo-decode (kind `opaque`), so heterogeneous corpora — the
  * 100 TB reality, where a scrape always contains formats the fleet's
  * codecs don't know — degrade row-by-row instead of failing the stage.
  * The per-partition shape is the one that matters at scale: codecs open
  * once per partition, rows stream through, payloads never hit the driver,
  * and partitions map 1:1 onto codec instances.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("duration_ms", LongType),
      StructField("sample_rate", IntegerType))))))

  /** Cheap metadata that needs no decode: size, digest, magic bytes —
    * pure codegen'd projection. */
  def withPayloadMeta(df: DataFrame, payload: Column): DataFrame =
    df.withColumn("byte_len", length(payload).cast("long"))
      .withColumn("digest", sha2(payload, 256))
      .withColumn("magic_hex", substring(hex(payload), 1, 8))

  // ---- pure-JVM reference encoders (fixture generation: specs + q46) ----

  /** Deterministic 24-bit RGB test image: pixel (x, y) derives from the
    * seed by integer arithmetic only, so encode→decode round-trips are
    * bit-stable across JVMs. */
  private def testImage(w: Int, h: Int, seed: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = seed * 31 + y * w + x
        r.setSample(x, y, 0, math.floorMod(v, 256).toInt)
        r.setSample(x, y, 1, math.floorMod(v >> 8, 256).toInt)
        r.setSample(x, y, 2, math.floorMod(v >> 16, 256).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Real BMP or PNG bytes via the JDK's `javax.imageio` writers. */
  def imageBytes(format: String, w: Int, h: Int, seed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(testImage(w, h, seed), format, out),
      s"no JDK ImageIO writer for '$format'")
    out.toByteArray
  }

  val WavSampleRate = 8000

  /** Real RIFF/WAVE bytes (16-bit signed PCM mono, little-endian) via
    * `javax.sound.sampled` — `n` frames of a deterministic integer wave. */
  def wavBytes(n: Int, seed: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      WavSampleRate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = math.floorMod(seed * 131 + i * 7919, 65536).toInt - 32768
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Encode stage: (media_id, kind, w, h, n) → real payload bytes, one
    * codec instance per partition (mapPartitions, same shape as decode).
    * `kind` ∈ bmp | png | wav; image rows use (w, h), audio rows use n. */
  def encodeMedia(spec: DataFrame): DataFrame = {
    val spark = spec.sparkSession
    import spark.implicits._
    spec.select(col("media_id"), col("kind"), col("w"), col("h"), col("n"))
      .as[(Long, String, Int, Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, kind, w, h, n) =>
          val payload = kind match {
            case "bmp" | "png" => imageBytes(kind, w, h, seed = id)
            case "wav"         => wavBytes(n, seed = id)
            case other => throw new IllegalArgumentException(
              s"unknown media kind '$other'")
          }
          (id, kind, payload)
        }
      }
      .toDF("media_id", "media_type", "payload")
  }

  // ---- decode ----

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
  private def isBmp(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 'B' && b(1) == 'M'
  private def isWav(b: Array[Byte]): Boolean =
    b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def decodeImage(id: Long, kind: String, b: Array[Byte],
                          dim: Int): Decoded = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    if (img == null) return decodeOpaque(id, b, dim)
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val nb = raster.getNumBands
    // Per-band integer pixel sums → exact, JVM-stable normalized means.
    val sums = new Array[Long](nb)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var bd = 0
        while (bd < nb) { sums(bd) += raster.getSample(x, y, bd); bd += 1 }
        x += 1
      }
      y += 1
    }
    val feat = Array.tabulate(dim) { i =>
      (sums(i % nb).toDouble / (255.0 * w * h)).toFloat
    }
    Decoded(id, kind, w, h, nb, 0L, 0, feat)
  }

  private def decodeWav(id: Long, b: Array[Byte], dim: Int): Decoded = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val fmt = ais.getFormat
      // The sample loop below is written for 16-bit signed little-endian
      // PCM only. An 8-bit / u-law / ADPCM WAV is VALID audio we just
      // don't decode — degrade to opaque rather than index past the
      // frame (or divide by bytesPerSample=0 for sub-byte encodings).
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
          fmt.getChannels < 1)
        return decodeOpaque(id, b, dim)
      val frames = ais.getFrameLength
      val ch = fmt.getChannels
      val bytesPerSample = 2
      val data = ais.readAllBytes()
      val n = data.length / (bytesPerSample * ch)
      // Mean |amplitude| per dim-bucket (16-bit LE assumed — our writer's
      // format; exact integer sums, divided once).
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var i = 0
      while (i < n) {
        val lo = data(i * bytesPerSample * ch) & 0xff
        val hi = data(i * bytesPerSample * ch + 1).toInt
        val s = (hi << 8) | lo
        sums(i % dim) += math.abs(s)
        counts(i % dim) += 1
        i += 1
      }
      val feat = Array.tabulate(dim) { i =>
        if (counts(i) == 0) 0.0f
        else (sums(i).toDouble / (32768.0 * counts(i))).toFloat
      }
      Decoded(id, "wav", 0, 0, ch, frames, fmt.getSampleRate.toInt, feat)
    } finally ais.close()
  }

  /** Unknown-format fallback: the deterministic byte-hash pseudo-decode
    * (dims + features from a rolling hash) — keeps heterogeneous corpora
    * flowing row-by-row instead of failing the partition. */
  private def decodeOpaque(id: Long, b: Array[Byte], dim: Int): Decoded = {
    var h = 1125899906842597L
    b.foreach(x => h = h * 31 + x)
    val w = 64 + math.floorMod(h, 448).toInt
    val hgt = 64 + math.floorMod(h >> 16, 448).toInt
    val ch = 1 + math.floorMod(h >> 32, 4).toInt
    val feat = Array.tabulate(dim) { i =>
      math.floorMod(h >> (i * 7), 1000).toFloat / 1000.0f
    }
    Decoded(id, "opaque", w, hgt, ch, 0L, 0, feat)
  }

  /** Exceptions a MALFORMED payload can legitimately raise inside the
    * JDK codecs: stream/plugin failures surface as IOException
    * (javax.imageio.IIOException included), an unrecognized RIFF body as
    * UnsupportedAudioFileException, and the ImageIO/AudioSystem plugin
    * internals are documented to throw IllegalArgumentException /
    * IndexOutOfBoundsException / NegativeArraySizeException on corrupt
    * headers (fuzzed sizes, negative dimensions). ONLY these degrade a
    * row to opaque — anything else (an NPE or arithmetic bug in OUR
    * sample loops) is a codec-logic defect and fails the task loudly
    * instead of being silently converted into opaque rows. */
  private def isExpectedDecodeFailure(t: Throwable): Boolean = t match {
    case _: java.io.IOException => true
    case _: javax.sound.sampled.UnsupportedAudioFileException => true
    case _: IllegalArgumentException => true
    case _: IndexOutOfBoundsException => true
    case _: NegativeArraySizeException => true
    case _ => false
  }

  /** Name of the accumulator counting degraded (caught-exception) rows —
    * visible in the Spark UI / status API per job, so a corpus whose
    * decode silently opaques 30% of its rows is observable without
    * re-scanning. Sniff-miss opaques are NOT counted here; those are
    * visible in-data as kind='opaque' with no exception involved. */
  val DegradedAccumulator = "graft.multimodal.decode.degraded"

  /** Decode + feature-extract stage: mapPartitions, magic-byte sniffing,
    * REAL pure-JVM codecs (BMP/PNG via ImageIO, WAV via javax.sound);
    * anything else degrades to [[decodeOpaque]]. Output schema: media_id,
    * kind, width, height, channels, n_samples, sample_rate,
    * feature ARRAY<FLOAT>(dim). Features are computed from exact integer
    * pixel/sample sums so they are bit-stable across JVMs and partitions.
    * Malformed payloads (see [[isExpectedDecodeFailure]]) degrade
    * row-by-row and are counted in [[DegradedAccumulator]]. */
  def decode(df: DataFrame, dim: Int = 8,
             degradedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val degraded = degradedAcc.getOrElse(
      spark.sparkContext.longAccumulator(DegradedAccumulator))
    val ds: Dataset[Decoded] = df.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // Codecs (ImageIO plugin registry, AudioSystem providers) resolve
        // once per JVM; per-partition we only stream rows through them.
        rows.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          try {
            if (isBmp(b)) decodeImage(id, "bmp", b, dim)
            else if (isPng(b)) decodeImage(id, "png", b, dim)
            else if (isWav(b)) decodeWav(id, b, dim)
            else decodeOpaque(id, b, dim)
          } catch { // truncated/corrupt payload: degrade, don't fail the task
            case t: Throwable if isExpectedDecodeFailure(t) =>
              degraded.add(1L)
              decodeOpaque(id, b, dim)
          }
        }
      }
    ds.toDF()
  }

  /** Resize stage: pure metadata transform (a real one maps the payload
    * too — same shape, still per-row, no shuffle). */
  def resizeMeta(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    decoded
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame sampling for video-typed rows: one output row per sampled
    * frame index — a generator, not a driver loop. */
  def frameSample(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("media_type") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))))
      .select(col("media_id"), col("frame_ms"))

  /** Batched model-inference over decoded features: rows stream through
    * `grouped(batchSize)` so a real model gets ONE forward call per
    * batch (the amortization that makes GPU/accelerator inference viable
    * at 100 TB), while per-row results stay independent of batch
    * boundaries — MultimodalSpec asserts batchSize/partitioning
    * invariance. The model is a real DETERMINISTIC linear probe —
    * `score = Σ_d feature_d · weights_d + bias`, an ordered fold in
    * double precision (float→double widening is exact), so the whole
    * decode→score path is oracle-mirrorable where the features are
    * (q122 gates it on the WAV rows, whose sample generator is plain
    * integer arithmetic both engines compute). The weight vector is the
    * "model" and is loaded once per partition; swapping in a neural
    * scorer changes only the scoreBatch body and keeps the
    * open-once-per-partition, batch-iterator shape. */
  def batchScore(decoded: DataFrame, weights: Seq[Double], bias: Double = 0.0,
                 batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    val spark = decoded.sparkSession
    import spark.implicits._
    val w = weights.toArray
    def scoreBatch(batch: Seq[(Long, Array[Float])]): Seq[(Long, Double)] =
      // real impl: one model.forward(batch) here
      batch.map { case (id, f) =>
        require(f.length == w.length,
          s"feature dim ${f.length} != weight dim ${w.length}")
        var s = 0.0
        var i = 0
        while (i < f.length) { s += f(i).toDouble * w(i); i += 1 }
        (id, s + bias) // bias LAST: score(w, b) == score(w, 0) + b exactly
      }
    decoded.select(col("media_id"), col("feature"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        // the model loads ONCE here per partition (for the linear probe
        // that is the closed-over weight array)
        rows.grouped(batchSize).flatMap(scoreBatch)
      }
      .toDF("media_id", "score")
  }
}
