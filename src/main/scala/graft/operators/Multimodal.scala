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
    media_id: Long, width: Int, height: Int, channels: Int,
    feature: Array[Float])

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The Spark-side plumbing (schema, batch shape, partitioning) is real;
  * the codec itself is a STUB — the container has no image/audio libs, so
  * `decodeStub` derives deterministic fake dimensions/features from the
  * payload bytes. Swapping in a real codec changes only the body of the
  * per-partition function: it keeps the batch-iterator shape (open codec
  * once per partition, stream rows through it), which is the pattern that
  * matters at 100 TB — payloads never hit the driver and partitions map
  * 1:1 onto codec instances.
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

  /** Decode + feature-extract stage: mapPartitions with a per-partition
    * "codec" (stubbed). Output schema: media_id, width, height, channels,
    * feature ARRAY<FLOAT>(dim). */
  def decodeStub(df: DataFrame, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[Decoded] = df.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // A real implementation opens the codec ONCE here per partition.
        rows.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          // Deterministic fake decode: dims from a rolling byte hash.
          var h = 1125899906842597L
          b.foreach(x => h = h * 31 + x)
          val w = 64 + math.floorMod(h, 448).toInt
          val hgt = 64 + math.floorMod(h >> 16, 448).toInt
          val ch = 1 + math.floorMod(h >> 32, 4).toInt
          val feat = Array.tabulate(dim) { i =>
            math.floorMod(h >> (i * 7), 1000).toFloat / 1000.0f
          }
          Decoded(id, w, hgt, ch, feat)
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

  /** Batched model-inference shape over decoded features: rows stream
    * through `grouped(batchSize)` so a real model gets ONE forward call
    * per batch (the amortization that makes GPU/accelerator inference
    * viable at 100 TB), while per-row results stay independent of batch
    * boundaries — MultimodalSpec asserts batchSize/partitioning
    * invariance. The "model" is a deterministic stub (weighted feature
    * sum); swapping in a real one changes only the scoreBatch body and
    * keeps the open-once-per-partition, batch-iterator shape. */
  def batchScoreStub(decoded: DataFrame, batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    val spark = decoded.sparkSession
    import spark.implicits._
    def scoreBatch(batch: Seq[(Long, Array[Float])]): Seq[(Long, Float)] =
      // real impl: one model.forward(batch) here
      batch.map { case (id, f) =>
        var s = 0.0f
        var i = 0
        while (i < f.length) { s += f(i) * (i + 1); i += 1 }
        (id, s)
      }
    decoded.select(col("media_id"), col("feature"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        // A real implementation loads the model ONCE here per partition.
        rows.grouped(batchSize).flatMap(scoreBatch)
      }
      .toDF("media_id", "score")
  }
}
