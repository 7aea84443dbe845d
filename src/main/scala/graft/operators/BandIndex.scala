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
  *
  * PUBLISH IS ATOMIC — nightly rebuilds and daily probes may run in
  * different JVMs concurrently: each build writes a fresh `v-NNNNN/`
  * version directory and commits it by RENAMING the layout sidecar into
  * place as the last step (same-directory rename — atomic on POSIX and
  * HDFS). Probes resolve "current" = the highest version whose sidecar
  * exists, and pin that one version for the whole probe, so a probe
  * never sees a half-written index, a missing sidecar, or a layout from
  * a different build than the rows it bands against. A build retains
  * the previous committed version (for probes in flight across one
  * rebuild) and prunes anything older.
  *
  * DAILY DELTAS LAYER instead of rewriting: [[append]] publishes a
  * delta's band rows as a new version whose sidecar points at its
  * parent, probes read the pinned version's whole CHAIN (each layer
  * partition-pruned), and the next full [[write]] compacts the chain —
  * LSM-style: O(delta) per day, O(corpus) only at compaction.
  */
object BandIndex {
  val BucketCol = "band_bucket"
  private val MetaFile = "_graft_band_index"
  private val VersionPrefix = "v-"

  /** Uniform, deterministic, stable across ticks: a (band, bkey) always
    * lands in the same directory, so probe pruning is sound. */
  def bucketOf(band: Column, bkey: Column, n: Int): Column = {
    require(n > 0, s"bucket count ($n) must be positive") // pmod(x,0)=null
    pmod(xxhash64(band, bkey), lit(n.toLong))
  }

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

  /** Commit the version: write the sidecar under a temp name, then rename
    * it into place — a same-directory rename of a small file, atomic on
    * POSIX and HDFS, so a concurrent probe either sees the complete
    * sidecar (version committed) or none (version invisible). A LAYER
    * (delta append) records its parent version as a fourth field; a base
    * build records none. */
  private def commitMeta(spark: SparkSession, vdir: Path, l: Layout,
                         parent: Option[Int] = None): Unit = {
    val f = fs(spark, vdir.toString)
    val tmp = new Path(vdir, MetaFile + ".tmp")
    val out = f.create(tmp, true)
    try out.write((s"${l.buckets} ${l.numHashes} ${l.bands}"
        + parent.map(p => s" $p").getOrElse(""))
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    require(f.rename(tmp, new Path(vdir, MetaFile)),
      s"band index commit rename failed under $vdir")
  }

  private def versionOf(name: String): Option[Int] =
    if (name.startsWith(VersionPrefix))
      name.stripPrefix(VersionPrefix).toIntOption
    else None

  /** All version numbers present under `path` (committed or not). */
  private def versions(spark: SparkSession, path: String): Seq[Int] = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(_.isDirectory).flatMap(st => versionOf(st.getPath.getName))
  }

  /** The directory of the newest COMMITTED version (sidecar present).
    * Loud failure when none exists — an unbuilt or mid-first-build index
    * must never silently probe as empty. Exposed for specs/tools that
    * need to read the current index rows directly. */
  def currentPath(spark: SparkSession, path: String): String = {
    val f = fs(spark, path)
    val committed = versions(spark, path).sorted(Ordering[Int].reverse)
      .find(v => f.exists(new Path(vdir(path, v), MetaFile)))
    require(committed.nonEmpty,
      s"no committed band index version under $path — build one with BandIndex.write")
    vdir(path, committed.get).toString
  }

  private def vdir(path: String, v: Int): Path =
    new Path(path, f"$VersionPrefix$v%05d")

  /** Newest COMMITTED version strictly below `below` (None when the
    * index has no committed version there yet). */
  private def committedHead(spark: SparkSession, path: String,
                            below: Int): Option[Int] = {
    val f = fs(spark, path)
    versions(spark, path).filter(_ < below).sorted(Ordering[Int].reverse)
      .find(v => f.exists(new Path(vdir(path, v), MetaFile)))
  }

  private def metaAt(spark: SparkSession,
                     versionDir: String): (Layout, Option[Int]) = {
    val in = fs(spark, versionDir).open(new Path(versionDir, MetaFile))
    val parts =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        .split("\\s+").map(_.toInt)
      finally in.close()
    (Layout(parts(0), parts(1), parts(2)), parts.lift(3))
  }

  private def layoutAt(spark: SparkSession, versionDir: String): Layout =
    metaAt(spark, versionDir)._1

  /** The version chain of `v`: itself, then parents down to the base.
    * Parents are always claimed before their children, so the walk must
    * strictly descend — a sidecar violating that is corrupt and fails
    * loudly rather than looping. */
  private def chainOf(spark: SparkSession, path: String, v: Int): Seq[Int] = {
    val chain = Seq.newBuilder[Int]
    var cur = Option(v)
    while (cur.nonEmpty) {
      val c = cur.get
      chain += c
      cur = metaAt(spark, vdir(path, c).toString)._2
      require(cur.forall(_ < c),
        s"band index chain corrupt under $path: $c points at ${cur.get}")
    }
    chain.result()
  }

  def layout(spark: SparkSession, path: String): Layout =
    layoutAt(spark, currentPath(spark, path))

  /** Whether any committed version exists — the day-zero bootstrap
    * probe (an unbuilt index must be built, not probed). */
  def isBuilt(spark: SparkSession, path: String): Boolean =
    committedHead(spark, path, below = Int.MaxValue).nonEmpty

  /** Number of versions in the CURRENT committed chain (base + layers)
    * — what a probe walks, and the compaction-cadence input: probe cost
    * grows with this count, not with corpus size. */
  def chainLength(spark: SparkSession, path: String): Int =
    committedHead(spark, path, below = Int.MaxValue)
      .map(v => chainOf(spark, path, v).length)
      .getOrElse(0)

  /** Claim a version number exclusively: `create(..., overwrite=false)`
    * of a sibling claim file is atomic on POSIX and HDFS, so two
    * concurrent builds can never write into the same v-NNNNN directory —
    * the loser observes the claim and takes the next number. */
  private def claimVersion(spark: SparkSession, path: String): Int = {
    val f = fs(spark, path)
    f.mkdirs(new Path(path))
    var v = (versions(spark, path) :+ 0).max + 1
    while (true) {
      try {
        f.create(claimFile(path, v), false).close()
        return v
      } catch {
        // ONLY the already-exists outcome means "claimed by a racer; bump".
        // A generic IOException (permissions, full disk, FS down) used to
        // take this branch too and loop forever consuming version numbers
        // — rethrow it instead.
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => v += 1
        case _: java.nio.file.FileAlreadyExistsException        => v += 1
      }
    }
    v // unreachable
  }

  private def claimFile(path: String, v: Int): Path =
    new Path(path, f".claim-$VersionPrefix$v%05d")

  /** Band the corpus shingle relation and publish a NEW index version.
    * One corpus pass (signatures → band keys), one shuffle into the
    * bucket layout. Re-running a build converges: each run claims the
    * next version atomically (safe under concurrent builders) and prunes
    * everything below except the newest COMMITTED predecessor — which is
    * kept for probes in flight across one rebuild. Pruning by
    * committedness (not version arithmetic) means a crashed build's
    * abandoned uncommitted directory is swept while the version a probe
    * could actually have pinned survives. */
  def write(corpusSh: DataFrame, path: String, numHashes: Int = 64,
            bands: Int = 16, buckets: Int = 64): Unit = {
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    // buckets <= 0 would make bucketOf = pmod(x, 0) = null: every row in
    // __HIVE_DEFAULT_PARTITION__ and every probe silently empty
    require(buckets > 0, s"buckets ($buckets) must be positive")
    val spark = corpusSh.sparkSession
    val next = claimVersion(spark, path)
    val target = vdir(path, next)
    bandRows(corpusSh, Layout(buckets, numHashes, bands))
      .withColumn(BucketCol, bucketOf(col("band"), col("bkey"), buckets))
      // cluster each bucket into one task before the partitioned write:
      // without this every shuffle partition writes a sliver into every
      // bucket directory (buckets × partitions tiny files — 2k at sf0.1,
      // and the same small-files explosion on a cluster); with it the
      // file count is O(buckets) and the probe opens one file per
      // touched directory
      .repartition(buckets, col(BucketCol))
      .write.partitionBy(BucketCol).mode("overwrite").parquet(target.toString)
    requireClaimLive(spark, path, next)
    commitMeta(spark, target, Layout(buckets, numHashes, bands))
    prune(spark, path, next)
  }

  /** Guard between the data write and the sidecar commit: if a CONCURRENT
    * builder's [[prune]] swept this version's claim file (it cannot tell a
    * slow in-flight build from a crashed one), committing would publish a
    * directory whose data files may already be half-deleted. Fail loudly
    * and abandon the version instead — the caller re-runs and claims a
    * fresh number. */
  private def requireClaimLive(spark: SparkSession, path: String, v: Int): Unit =
    require(fs(spark, path).exists(claimFile(path, v)),
      s"band index version $v under $path lost its claim file mid-build " +
        "(a concurrent writer pruned it) — abandoning this version; re-run")

  /** Band a shingle relation under a layout — the ONE banding used by
    * build, append and probe, so a relation is never banded twice with
    * accidentally different families. */
  private def bandRows(sh: DataFrame, l: Layout): DataFrame =
    Dedup.bandKeys(Dedup.signaturesFromExploded(sh, l.numHashes),
      l.bands, l.rowsPerBand, l.numHashes)

  /** Append a DELTA's band rows as a new LAYER on the current committed
    * version instead of rewriting the corpus index — the daily path: the
    * nightly [[write]] is O(corpus), the daily append is O(delta). The
    * layer inherits the banding layout FROM the index (an append can
    * never change the hash family) and its sidecar records the parent
    * version; probes read the whole chain, partition-pruned per layer,
    * so probe cost grows with layer COUNT, not corpus size — compaction
    * is simply the next full [[write]], which collapses the chain.
    * Re-appending a doc already in the chain is harmless: candidate
    * pairs are distinct()ed and verification is per doc.
    *
    * Concurrency: safe against concurrent probes and full rebuilds (the
    * same versioned-commit argument as [[write]]). Two SIMULTANEOUS
    * appends both pin the same parent and the later commit wins the
    * chain — the earlier layer is silently shadowed — so appends must be
    * serialized by the caller (they are the once-per-tick step of the
    * daily loop; ticks are inherently sequential). */
  def append(deltaSh: DataFrame, path: String): Unit =
    new DeltaTick(path, deltaSh).append()

  /** One probe-then-append tick of the daily loop, pinned to ONE
    * committed version: the delta is banded ONCE under the pinned
    * layout and the SAME band rows serve both [[pairs]] (the chain
    * probe) and [[append]] (the new layer) — banding is the tick's
    * expensive stage (64 mins per doc behind a shuffle), so the
    * streaming loop (q118) must not pay it twice. Pinning at
    * construction also closes the layout race: a rebuild committing
    * mid-tick can't band the delta with one family and append it under
    * another. */
  final class DeltaTick(path: String, deltaSh: DataFrame) {
    private val spark = deltaSh.sparkSession
    private val pinnedDir = currentPath(spark, path)
    private val l = layoutAt(spark, pinnedDir)
    private val parent = versionOf(new Path(pinnedDir).getName).get
    /** Delta band rows under the pinned layout; localCheckpoint'ed — the
      * touched-bucket collect, the chain probe join, the delta-internal
      * self-join and the layer write all consume it. */
    lazy val bands: DataFrame = bandRows(deltaSh, l).localCheckpoint()

    /** Candidate pairs of the delta against the pinned chain + itself:
      * distinct (a_id, b_id), a_id < b_id. Exposed separately from
      * [[pairs]] so a caller that OWNS the verification relation (the
      * streaming shingle store) can collect the candidate docs' store
      * buckets and file-prune its read BEFORE verification.
      * localCheckpoint'ed — consumed by the verify join and by the
      * caller's touched-bucket collect. */
    lazy val candidates: DataFrame = {
      val touched = bands
        .select(bucketOf(col("band"), col("bkey"), l.buckets).as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq.sorted
      val bc = readChain(spark, path, pinnedDir, touched)
      val crossCand = bands.as("x").join(bc.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") =!= col("y.doc_id"))
        .select(least(col("x.doc_id"), col("y.doc_id")).as("a_id"),
                greatest(col("x.doc_id"), col("y.doc_id")).as("b_id"))
      val deltaCand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      crossCand.union(deltaCand).distinct().localCheckpoint()
    }

    /** Near-dup pairs of the delta against the pinned chain + itself
      * (see [[minhashPairsFromIndex]]). */
    def pairs(corpusSh: DataFrame, threshold: Double): DataFrame =
      Dedup.verifyPairs(candidates, corpusSh.union(deltaSh), threshold)

    /** Publish the banded delta as the next layer (parent = the pinned
      * version).
      *
      * Appends must be serialized by the caller (they are the once-per-
      * tick step of the daily loop). The shadow guard below is
      * BEST-EFFORT, not a serialization primitive: a SIBLING append that
      * slipped in anyway — same pinned parent — is caught (a) before
      * commit if it already committed (check-then-act), and (b) after
      * commit by re-verifying the head and UN-committing this layer on
      * mismatch, which closes the commit-between-check-and-commit
      * window for every interleaving except both siblings passing their
      * post-commit re-check inside the same instant. Under genuinely
      * concurrent unserialized appends exactly-one-survivor is therefore
      * overwhelmingly likely but not guaranteed — the caller contract
      * stands; the guard exists to turn a near-certain silent shadow
      * into a loud abort. */
    def append(): Unit = {
      val next = claimVersion(spark, path)
      val target = vdir(path, next)
      bands
        .withColumn(BucketCol, bucketOf(col("band"), col("bkey"), l.buckets))
        .repartition(l.buckets, col(BucketCol))
        .write.partitionBy(BucketCol).mode("overwrite").parquet(target.toString)
      def requireHeadIs(when: String): Unit = {
        val head = committedHead(spark, path, below = next)
        if (!head.contains(parent)) {
          val f = fs(spark, path)
          // un-commit: meta first (flips this version back to
          // uncommitted for any concurrent reader), then the data. The
          // claim file STAYS — the version number is burned, so a retry
          // claims a fresh one and never revives this layer's ghost.
          f.delete(new Path(target, MetaFile), false)
          f.delete(target, true)
          throw new IllegalStateException(
            s"band index append under $path: committed head moved " +
              s"$parent → ${head.getOrElse("none")} $when (concurrent " +
              s"append or rebuild) — committing would shadow it; " +
              s"abandoned version $next, re-probe and retry")
        }
      }
      requireHeadIs("while this layer was building")
      requireClaimLive(spark, path, next)
      commitMeta(spark, target, l, Some(parent))
      requireHeadIs("during this layer's commit")
      prune(spark, path, next)
    }
  }

  /** Sweep everything below `next` except the LIVE chains: `next`'s own
    * ancestors (those layers ARE the index) and the newest committed
    * predecessor's chain (the version an in-flight probe could have
    * pinned, with its layers). Crashed builds' uncommitted directories
    * and stale claim files go too. */
  private def prune(spark: SparkSession, path: String, next: Int): Unit = {
    val f = fs(spark, path)
    val prevPinned = versions(spark, path).filter(_ < next)
      .sorted(Ordering[Int].reverse)
      .find(v => f.exists(new Path(vdir(path, v), MetaFile)))
    val keep = (chainOf(spark, path, next) ++
      prevPinned.toSeq.flatMap(v => chainOf(spark, path, v))).toSet
    val claimed = f.listStatus(new Path(path)).toSeq.filter(_.isFile)
      .flatMap(st => versionOf(st.getPath.getName.stripPrefix(".claim-")))
    (versions(spark, path) ++ claimed).distinct
      .filter(v => v < next && !keep.contains(v))
      .foreach { v =>
        f.delete(vdir(path, v), true)
        f.delete(claimFile(path, v), false)
      }
  }

  /** The band-key schema the probe expects back from the index. */
  private val probeSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("band",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("bkey",
      org.apache.spark.sql.types.LongType)))

  /** The partition-pruned probe read against the CURRENT committed
    * version AND its layer chain: per layer, only directories holding a
    * touched bucket are scanned (exposed for the spec's plan assertion).
    * An index built from an EMPTY corpus (day zero: sidecar + _SUCCESS,
    * no bucket directories) reads as zero corpus rows — the probe then
    * yields delta-internal pairs only, instead of crashing schema
    * inference. */
  def readTouched(spark: SparkSession, path: String,
                  touched: Seq[Long]): DataFrame =
    readChain(spark, path, currentPath(spark, path), touched)

  private def readChain(spark: SparkSession, path: String, pinnedDir: String,
                        touched: Seq[Long]): DataFrame = {
    val v = versionOf(new Path(pinnedDir).getName).get
    chainOf(spark, path, v)
      .map(c => readTouchedAt(spark, vdir(path, c).toString, touched))
      .reduce(_ union _)
  }

  private def readTouchedAt(spark: SparkSession, versionDir: String,
                            touched: Seq[Long]): DataFrame = {
    val p = new Path(versionDir)
    val hasBuckets = fs(spark, versionDir).listStatus(p).exists { st =>
      val n = st.getPath.getName
      st.isDirectory && !n.startsWith("_") && !n.startsWith(".")
    }
    if (!hasBuckets)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], probeSchema)
    else
      spark.read.parquet(versionDir)
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
    * Banding layout comes from the index sidecar, never a parameter —
    * and the probe PINS one committed version up front, so a rebuild
    * committing mid-probe can't mix layouts between the sidecar read and
    * the directory scan.
    */
  def minhashPairsFromIndex(path: String, corpusSh: DataFrame,
                            deltaSh: DataFrame, threshold: Double): DataFrame =
    new DeltaTick(path, deltaSh).pairs(corpusSh, threshold)
}
