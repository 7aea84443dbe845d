package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling for corpus curation — the "give me a
  * k-doc quality-weighted subsample per stratum" step of a training-data
  * mixture build. Systematic probability-proportional-to-size (PPS)
  * sampling: walk each stratum in id order accumulating weight, and take
  * a pick every tot/k weight units. Entirely INTEGER arithmetic (floor
  * divisions on BIGINT cumulative sums), so the selection is exact,
  * reproducible, and oracle-mirrorable — no RNG, no transcendental keys
  * (an Efraimidis–Spirakis u^(1/w) key would hinge on libm ulps and
  * could flip the marginal pick between engines).
  *
  * Docs heavier than the step are selected once (classic systematic PPS
  * — a stratum yields at MOST k picks, fewer when single docs absorb
  * multiple steps).
  */
object Sampling {

  /** Per-stratum systematic PPS selection. A row is picked iff its
    * weight interval (cum-w, cum] crosses a step boundary:
    * `(cum*k) div tot > ((cum-w)*k) div tot`.
    *
    * The cumulative sum is computed as a TWO-LEVEL prefix sum so no
    * stratum ever becomes one task: rows prefix-sum inside
    * (stratum, bucket = id div bucketSize) windows — parallel across
    * buckets — while the stratum-wide carry runs over the tiny
    * per-bucket totals relation; bucket offsets join back on the SAME
    * (stratum, bucket) key the inner window just shuffled on, and the
    * per-stratum totals are a broadcast. At 100 TB the only stratum-wide
    * pass is over n/bucketSize summary rows (recurse the same trick if
    * even that outgrows a window). Overflow envelope: cum*k must fit a
    * signed 64-bit — 10^14 total weight × k=10^3 is 10^17 < 2^63.
    *
    * Output: (stratum, id, w, pick) for selected rows, pick = the step
    * index landed on. */
  /** Both the id (div'd into buckets) and the weight (cast to long for
    * the exact cumulative arithmetic) must be INTEGRAL: a string id
    * would null the bucket key and silently empty the join, and a
    * fractional weight in (0,1) would truncate to 0 and null the step
    * division — the same silently-empty failure modes BandIndex guards
    * against. Scale fractional weights to integers first (the q72
    * scaled-ratio convention). */
  private def requireIntegral(df: DataFrame, c: String, role: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(c).dataType
    require(dt.isInstanceOf[ByteType] || dt.isInstanceOf[ShortType] ||
            dt.isInstanceOf[IntegerType] || dt.isInstanceOf[LongType],
      s"$role column '$c' must be an integral type, got $dt")
  }

  def systematicPps(df: DataFrame, strataCol: String, idCol: String,
                    weightCol: String, k: Int,
                    bucketSize: Long = 1L << 20): DataFrame = {
    require(k > 0, s"sample size k ($k) must be positive")
    require(bucketSize > 0, s"bucketSize ($bucketSize) must be positive")
    requireIntegral(df, idCol, "id")
    requireIntegral(df, weightCol, "weight")
    val base = df.select(col(strataCol).as("stratum"), col(idCol).as("id"),
        col(weightCol).cast("long").as("w"))
      .withColumn("bucket", expr(s"id div ${bucketSize}L"))
    val inner = Window.partitionBy(col("stratum"), col("bucket")).orderBy(col("id"))
    val carry = Window.partitionBy(col("stratum")).orderBy(col("bucket"))
    val btot = base.groupBy(col("stratum"), col("bucket"))
      .agg(sum(col("w")).as("bw"))
    val boff = btot
      .withColumn("off", sum(col("bw")).over(carry) - col("bw"))
      .select(col("stratum"), col("bucket"), col("off"))
    val tot = btot.groupBy(col("stratum")).agg(sum(col("bw")).as("tot"))
    base
      .withColumn("icum", sum(col("w")).over(inner))
      .join(boff, Seq("stratum", "bucket"))
      .join(broadcast(tot), Seq("stratum"))
      .withColumn("cum", col("icum") + col("off"))
      .withColumn("pick", expr(s"(cum * ${k}L) div tot"))
      .filter(col("pick") > expr(s"((cum - w) * ${k}L) div tot"))
      .select(col("stratum"), col("id"), col("w"), col("pick"))
  }

  /** EXACT global rank by (weight DESC, id ASC) — curriculum ordering
    * for a whole corpus — without the single-task global window a naive
    * `row_number() OVER (ORDER BY ...)` plans. Range-partition on the
    * ordering key (each partition then holds a contiguous slice of the
    * global order), rank WITHIN partitions in parallel, and add each
    * partition's offset = rows in all earlier partitions, computed from
    * the per-partition counts relation (≤ `partitions` rows — control
    * plane). Correct for ANY boundary placement the range sampler picks:
    * (weight, id) is a total order, so partition i's rows all precede
    * partition i+1's, and offsets absorb where the cut fell.
    *
    * At 100 TB this is the shape Spark's own sort uses (range exchange +
    * local sort) with the rank arithmetic kept declarative. */
  def globalRankByWeight(df: DataFrame, idCol: String, weightCol: String,
                         partitions: Int = 64): DataFrame = {
    require(partitions > 0, s"partitions ($partitions) must be positive")
    requireIntegral(df, weightCol, "weight") // fractional would truncate
    val ranked = df
      .select(col(idCol).as("id"), col(weightCol).cast("long").as("w"))
      .repartitionByRange(partitions, col("w").desc, col("id").asc)
      .withColumn("pid", spark_partition_id())
      .withColumn("within", row_number().over(
        Window.partitionBy(col("pid"))
          .orderBy(col("w").desc, col("id").asc)))
    // the ranked relation feeds BOTH the offsets aggregation and the
    // final join — pin it (withPersisted lifecycle) or the scan + range
    // exchange + window would execute once per consumer. The offsets
    // window is over ≤ `partitions` summary rows: control-plane sized,
    // its single-partition WindowExec is deliberate.
    Dedup.withPersisted(ranked) { r =>
      val offsets = r.groupBy(col("pid"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("off", sum(col("cnt")).over(
          Window.orderBy(col("pid"))) - col("cnt"))
        .select(col("pid"), col("off"))
      r.join(broadcast(offsets), Seq("pid"))
        .select(col("id"), col("w"), (col("off") + col("within")).as("rank"))
    }
  }
}
