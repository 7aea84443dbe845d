package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Opaque payloads: no real container magic → decodeOpaque path. */
  private def media = {
    val rows = Seq(
      Row(1L, "image", "fake-jpeg-bytes-aaaa".getBytes("UTF-8"),
          Row(null, null, null, null, null)),
      Row(2L, "image", "fake-png-bytes-bbbbbb".getBytes("UTF-8"),
          Row(null, null, null, null, null)),
      Row(3L, "video", "fake-mp4-bytes".getBytes("UTF-8"),
          Row(null, null, null, 2500L, null)),
      Row(4L, "audio", "fake-wav".getBytes("UTF-8"),
          Row(null, null, null, 1000L, 16000))
    )
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      Multimodal.mediaSchema)
  }

  /** Real container bytes from the encode stage: ids 0..8 cycle
    * bmp/png/wav with spec dims derived from the id. */
  private def realMedia = {
    val spec = spark.range(0, 9).select(
      col("id").as("media_id"),
      element_at(array(lit("bmp"), lit("png"), lit("wav")),
        (col("id") % 3 + 1).cast("int")).as("kind"),
      (col("id") % 7 + 4).cast("int").as("w"),
      (col("id") % 5 + 3).cast("int").as("h"),
      (col("id") % 50 + 10).cast("int").as("n"))
    Multimodal.encodeMedia(spec)
  }

  test("payload metadata: byte length, digest, magic — no decode needed") {
    val out = Multimodal.withPayloadMeta(media, col("payload"))
    val r = out.filter($"media_id" === 1L)
      .select("byte_len", "digest", "magic_hex").head()
    assert(r.getLong(0) == 20L)
    assert(r.getString(1).length == 64)
    assert(r.getString(2) == "66616B65") // hex("fake")
  }

  test("real codec round-trip: BMP/PNG/WAV dims survive encode→decode") {
    val d = Multimodal.decode(realMedia, dim = 8)
      .orderBy("media_id").collect()
    assert(d.length == 9)
    d.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val kind = r.getAs[String]("kind")
      assert(kind == Seq("bmp", "png", "wav")((id % 3).toInt),
        s"sniff miss for media $id: got $kind")
      if (kind == "wav") {
        assert(r.getAs[Int]("width") == 0 && r.getAs[Int]("height") == 0)
        assert(r.getAs[Int]("channels") == 1)
        assert(r.getAs[Long]("n_samples") == id % 50 + 10)
        assert(r.getAs[Int]("sample_rate") == Multimodal.WavSampleRate)
      } else {
        assert(r.getAs[Int]("width") == (id % 7 + 4).toInt)
        assert(r.getAs[Int]("height") == (id % 5 + 3).toInt)
        assert(r.getAs[Int]("channels") == 3)
        assert(r.getAs[Long]("n_samples") == 0L)
      }
      val feat = r.getAs[scala.collection.Seq[Float]]("feature")
      assert(feat.length == 8)
      assert(feat.forall(f => f >= 0.0f && f <= 1.0f && !f.isNaN))
    }
  }

  test("decode is partitioning-invariant and degrades unknown bytes to opaque") {
    val mixed = realMedia.union(
      media.select(col("media_id") + 100, col("media_type"), col("payload")))
    val d1 = Multimodal.decode(mixed, dim = 8).orderBy("media_id").collect()
    val d2 = Multimodal.decode(mixed.repartition(5), dim = 8)
      .orderBy("media_id").collect()
    assert(d1.map(_.toString).toSeq == d2.map(_.toString).toSeq)
    // fake payloads decode deterministically as opaque, never crash
    d1.filter(_.getAs[Long]("media_id") > 100).foreach { r =>
      assert(r.getAs[String]("kind") == "opaque")
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 512)
    }
  }

  test("valid non-16-bit WAV degrades to opaque instead of crashing") {
    // 8-bit unsigned PCM: real RIFF/WAVE container, an encoding the
    // 16-bit sample loop must NOT attempt (regression: index-past-end).
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val raw = Array.tabulate[Byte](100)(i => (i * 37 % 256).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, raw.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val df = Seq((1L, out.toByteArray)).toDF("media_id", "payload")
    val r = Multimodal.decode(df, dim = 4).head()
    assert(r.getAs[String]("kind") == "opaque")
  }

  test("truncated container bytes degrade to opaque instead of failing the task") {
    val wav = Multimodal.wavBytes(50, seed = 7L)
    val png = Multimodal.imageBytes("png", 6, 4, seed = 3L)
    val df = Seq(
      (1L, wav.take(16)),          // RIFF/WAVE magic, body gone
      (2L, png.take(12))           // PNG magic, IHDR truncated
    ).toDF("media_id", "payload")
    val acc = spark.sparkContext.longAccumulator("test.decode.degraded")
    val rows = Multimodal.decode(df, dim = 4, degradedAcc = Some(acc))
      .orderBy("media_id").collect()
    assert(rows.forall(_.getAs[String]("kind") == "opaque"))
    // degrades are COUNTED, not silent (the truncated WAV throws inside
    // the codec; a magic-only PNG may return null instead, uncounted)
    assert(acc.value >= 1)
  }

  test("resize: metadata scaling caps the long side, never upscales") {
    val decoded = Multimodal.decode(media)
    val out = Multimodal.resizeMeta(decoded, maxSide = 128).collect()
    out.foreach { r =>
      val (w, h) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      assert(math.max(w, h) <= 128)
      assert(w <= r.getAs[Int]("width") && h <= r.getAs[Int]("height"))
    }
  }

  test("frame sampling: one row per interval, videos only") {
    val frames = Multimodal.frameSample(media, everyMs = 1000)
    val idx = frames.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(idx.toSeq == Seq((3L, 0L), (3L, 1000L), (3L, 2000L)))
  }

  test("batched scoring: results independent of batch size and partitioning") {
    val decoded = Multimodal.decode(realMedia)
    val w = (1 to 8).map(_.toDouble)
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val one = scores(Multimodal.batchScore(decoded, w, batchSize = 1))
    val big = scores(Multimodal.batchScore(decoded, w, batchSize = 64))
    val rep = scores(Multimodal.batchScore(decoded.repartition(7), w, batchSize = 2))
    assert(one == big && one == rep)
    assert(one.nonEmpty && one.values.forall(s => !s.isNaN))
    // bias shifts every score by exactly its value (double fold, no
    // float re-rounding)
    val biased = scores(Multimodal.batchScore(decoded, w, bias = 2.5))
    assert(biased.forall { case (id, s) => s == one(id) + 2.5 })
    // a weight/feature dim mismatch fails loudly, not silently truncated
    intercept[org.apache.spark.SparkException] {
      Multimodal.batchScore(decoded, Seq(1.0, 2.0)).collect()
    }
  }
}
