package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

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

  test("payload metadata: byte length, digest, magic — no decode needed") {
    val out = Multimodal.withPayloadMeta(media, col("payload"))
    val r = out.filter($"media_id" === 1L)
      .select("byte_len", "digest", "magic_hex").head()
    assert(r.getLong(0) == 20L)
    assert(r.getString(1).length == 64)
    assert(r.getString(2) == "66616B65") // hex("fake")
  }

  test("decode stub: deterministic dims + fixed-size float features, partition-shaped") {
    val d1 = Multimodal.decodeStub(media, dim = 8).orderBy("media_id").collect()
    val d2 = Multimodal.decodeStub(media.repartition(3), dim = 8)
      .orderBy("media_id").collect()
    assert(d1.length == 4)
    d1.foreach { r =>
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 512)
      assert(r.getAs[scala.collection.Seq[Float]]("feature").length == 8)
    }
    // same payload → same decode regardless of partitioning
    assert(d1.map(_.toString).toSeq == d2.map(_.toString).toSeq)
  }

  test("resize: metadata scaling caps the long side, never upscales") {
    val decoded = Multimodal.decodeStub(media)
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
    val decoded = Multimodal.decodeStub(media)
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    val one = scores(Multimodal.batchScoreStub(decoded, batchSize = 1))
    val big = scores(Multimodal.batchScoreStub(decoded, batchSize = 64))
    val rep = scores(Multimodal.batchScoreStub(decoded.repartition(7), batchSize = 2))
    assert(one == big && one == rep)
    assert(one.nonEmpty && one.values.forall(s => !s.isNaN))
  }
}
