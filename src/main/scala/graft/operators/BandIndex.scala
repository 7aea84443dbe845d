package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED MinHash-LSH band index — what makes daily-delta dedup
  * real across sessions instead of replayed: the corpus is banded ONCE,
  * the (doc_id, band, bkey) rows land on disk directory-partitioned on a
  * stable hash bucket of (band, bkey) (the PartitionedSnapshot layout
  * move: partition dirs + a sidecar carrying the layout state), and each
  * day's delta probes it by computing its own band keys, collecting the
  * ≤ numBuckets touched bucket ids (control-plane), and reading ONLY
  * those directories — a partition-pruned scan, so the probe's cost is
  * O(delta + matched buckets), never O(corpus).
  *
  * The sidecar records the bucket count AND the banding layout
  * (numHashes, bands): a probe that banded the delta with a different
  * hash family than the index would silently lose recall (bands would
  * never collide) — reading the layout from the index makes that drift
  * impossible, the same state-lives-with-the-layout reasoning as
  * PartitionedSnapshot's bucket-count sidecar.
  *
  * Verification still needs the corpus SHINGLES of candidate docs (at
  * 100 TB those are likewise a persisted table); Dedup.verifyPairs
  * semi-join-restricts that relation to candidate docs before the window
  * count, so the verify stage is O(candidate docs' shingles) — no
  * corpus-wide exchange anywhere in the probe (DedupSpec asserts the
  * pruned scan programmatically).
  *
  * Reference analog: the persisted per-source watermark that makes the
  * reference's increments real (handlers/mongodb_handler.py:212-225) —
  * here the persisted state is the candidate-generation index itself.
  */
object BandIndex {
  val BucketCol = "band_bucket"
  private val MetaFile = "_graft_band_index"

  /** Uniform, deterministic, stable across ticks: a (band, bkey) always
    * lands in the same directory, so probe pruning is sound. */
  def bucketOf(band: Column, bkey: Column, n: Int): Column =
    pmod(xxhash64(band, bkey), lit(n.toLong))

  final case class Layout(buckets: Int, numHashes: Int, bands: Int) {
    def rowsPerBand: Int = numHashes / bands
  }

  // Resolve the filesystem FROM the index path (not the default FS): the
  // sidecar must live next to the parquet buckets even when the index is
  // on an explicit file:/ or object-store URI and fs.defaultFS is HDFS —
  // a default-FS sidecar would be missing (or STALE from an older build)
  // exactly when another session probes the index.
  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeMeta(spark: SparkSession, path: String, l: Layout): Unit = {
    val out = fs(spark, path).create(new Path(path, MetaFile), true)
    try out.write(s"${l.buckets} ${l.numHashes} ${l.bands}"
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def layout(spark: SparkSession, path: String): Layout = {
    val in = fs(spark, path).open(new Path(path, MetaFile))
    val parts =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        .split("\\s+").map(_.toInt)
      finally in.close()
    Layout(parts(0), parts(1), parts(2))
  }

  /** Band the corpus shingle relation and write the index. One corpus
    * pass (signatures → band keys), one shuffle into the bucket layout.
    * Overwrite-idempotent: re-running a build converges. */
  def write(corpusSh: DataFrame, path: String, numHashes: Int = 64,
            bands: Int = 16, buckets: Int = 64): Unit = {
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    val sig = Dedup.signaturesFromExploded(corpusSh, numHashes)
    Dedup.bandKeys(sig, bands, numHashes / bands, numHashes)
      .withColumn(BucketCol, bucketOf(col("band"), col("bkey"), buckets))
      // cluster each bucket into one task before the partitioned write:
      // without this every shuffle partition writes a sliver into every
      // bucket directory (buckets × partitions tiny files — 2k at sf0.1,
      // and the same small-files explosion on a cluster); with it the
      // file count is O(buckets) and the probe opens one file per
      // touched directory
      .repartition(buckets, col(BucketCol))
      .write.partitionBy(BucketCol).mode("overwrite").parquet(path)
    writeMeta(corpusSh.sparkSession, path, Layout(buckets, numHashes, bands))
  }

  /** The band-key schema the probe expects back from the index. */
  private val probeSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("band",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("bkey",
      org.apache.spark.sql.types.LongType)))

  /** The partition-pruned probe read: only directories holding a touched
    * bucket are scanned (exposed for the spec's plan assertion). An index
    * built from an EMPTY corpus (day zero: sidecar + _SUCCESS, no bucket
    * directories) reads as zero corpus rows — the probe then yields
    * delta-internal pairs only, instead of crashing schema inference. */
  def readTouched(spark: SparkSession, path: String,
                  touched: Seq[Long]): DataFrame = {
    val p = new Path(path)
    val hasBuckets = fs(spark, path).listStatus(p).exists { st =>
      val n = st.getPath.getName
      st.isDirectory && !n.startsWith("_") && !n.startsWith(".")
    }
    if (!hasBuckets)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], probeSchema)
    else
      spark.read.parquet(path)
        .filter(col(BucketCol).isin(touched: _*))
        .select("doc_id", "band", "bkey")
  }

  /** Incremental near-dup pairs of `deltaSh` against the ON-DISK index at
    * `path` — the cross-session variant of Dedup.minhashPairsIncremental
    * (same candidates by construction: same hash family ⇒ identical
    * banding; DedupSpec asserts equality, q106 oracle-gates it).
    *
    * Probe shape: delta band keys are computed once and localCheckpoint'ed
    * (three consumers: the touched-bucket collect, the index probe join,
    * the delta-internal self-join); the index contributes ONLY its
    * touched directories; verification is restricted to candidate docs.
    * Banding layout comes from the index sidecar, never a parameter.
    */
  def minhashPairsFromIndex(path: String, corpusSh: DataFrame,
                            deltaSh: DataFrame, threshold: Double): DataFrame = {
    val spark = deltaSh.sparkSession
    val l = layout(spark, path)
    val bd = Dedup.bandKeys(
        Dedup.signaturesFromExploded(deltaSh, l.numHashes),
        l.bands, l.rowsPerBand, l.numHashes)
      .localCheckpoint()
    // Control-plane: which index directories can hold a colliding band?
    val touched = bd
      .select(bucketOf(col("band"), col("bkey"), l.buckets).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    val bc = readTouched(spark, path, touched)
    val crossCand = bd.as("x").join(bc.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a_id"),
              greatest(col("x.doc_id"), col("y.doc_id")).as("b_id"))
    val deltaCand = bd.as("x").join(bd.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    Dedup.verifyPairs(crossCand.union(deltaCand).distinct(),
      corpusSh.union(deltaSh), threshold)
  }
}
