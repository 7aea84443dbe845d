package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned on-disk ANN build artifacts — PQ codebooks + the encoded
  * corpus, and IVF (Lloyd-refined) centroids — published with the
  * BandIndex pattern: data lands under a claimed `v-NNNNN` directory,
  * the sidecar commits LAST via an atomic same-directory rename, and
  * readers pin the newest COMMITTED version. A crashed build leaves an
  * uncommitted directory that is invisible to readers and swept by the
  * next successful publish.
  *
  * Why this exists: at 100 TB a quantizer is a BUILD artifact refreshed
  * on the corpus-publish cadence (nightly, with the band index), not
  * per-query work. q61/q86 retrain codebooks/centroids inside each query
  * because their job is to oracle-gate the CONSTRUCTION end-to-end; the
  * production probe path (q120/q121) reads these tables and does zero
  * training — the ANN analog of q106's disk band index vs q32's
  * in-memory banding. Training is deterministic (Similarity.pqTrain /
  * kmeansRefineExact) and doubles round-trip parquet exactly, so a probe
  * of the persisted artifacts is bit-identical to the in-session build —
  * which is exactly what lets the persisted entries share their twins'
  * oracles.
  *
  * Single nightly writer by contract (the DailyLoop cadence); version
  * claims are atomic-create, so a misconfigured second builder burns a
  * version number instead of corrupting a published one.
  */
object AnnIndex {
  private val MetaFile = "_graft_ann"
  private val VersionPrefix = "v-"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def vdir(path: String, v: Int): Path =
    new Path(path, f"$VersionPrefix$v%05d")

  private def versionOf(name: String): Option[Int] =
    if (name.startsWith(VersionPrefix))
      name.stripPrefix(VersionPrefix).toIntOption
    else None

  private def versions(spark: SparkSession, path: String): Seq[Int] = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.flatMap(st => versionOf(
      st.getPath.getName.stripPrefix(".claim-")))
  }

  private def claimVersion(spark: SparkSession, path: String): Int = {
    val f = fs(spark, path)
    f.mkdirs(new Path(path))
    var v = (versions(spark, path) :+ 0).max + 1
    while (true) {
      try {
        f.create(new Path(path, f".claim-$VersionPrefix$v%05d"), false).close()
        return v
      } catch { // only already-exists means "claimed by a racer; bump"
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => v += 1
        case _: java.nio.file.FileAlreadyExistsException        => v += 1
      }
    }
    v // unreachable
  }

  /** Atomic same-dir rename commit, BandIndex.commitMeta's shape. */
  private def commitMeta(spark: SparkSession, vd: Path, meta: String): Unit = {
    val f = fs(spark, vd.toString)
    val tmp = new Path(vd, MetaFile + ".tmp")
    val out = f.create(tmp, true)
    try out.write(meta.getBytes(StandardCharsets.UTF_8)) finally out.close()
    require(f.rename(tmp, new Path(vd, MetaFile)),
      s"ann artifact commit rename failed under $vd")
  }

  /** Newest committed version's directory; loud when none exists — an
    * unbuilt artifact store must never silently probe as empty. */
  private def currentDir(spark: SparkSession, path: String): Path = {
    val f = fs(spark, path)
    val committed = versions(spark, path).distinct
      .sorted(Ordering[Int].reverse)
      .find(v => f.exists(new Path(vdir(path, v), MetaFile)))
    require(committed.nonEmpty,
      s"no committed ANN artifact version under $path — publish one with " +
        "AnnIndex.buildPq/buildIvf")
    vdir(path, committed.get)
  }

  /** Sweep every version below the newly committed one except the newest
    * committed predecessor (kept for probes in flight across a rebuild),
    * including crashed builds' uncommitted junk. */
  private def prune(spark: SparkSession, path: String, next: Int): Unit = {
    val f = fs(spark, path)
    val committedPrev = versions(spark, path).distinct.filter(_ < next)
      .sorted(Ordering[Int].reverse)
      .find(v => f.exists(new Path(vdir(path, v), MetaFile)))
    versions(spark, path).distinct
      .filter(v => v < next && !committedPrev.contains(v))
      .foreach { v =>
        f.delete(vdir(path, v), true)
        f.delete(new Path(path, f".claim-$VersionPrefix$v%05d"), false)
      }
  }

  /** The published PQ hyper-parameters; probes must use the SAME (m,
    * subLen) the codebooks were trained with, so they travel with the
    * artifact, never as caller-remembered constants. */
  final case class PqParams(m: Int, subLen: Int, numCodes: Int)

  /** Train + encode + publish a PQ index version: codebooks (sub, code,
    * code_vec) and the encoded corpus (id, sub, code) — at scale the
    * m-small-ints-per-vector table that replaces the raw floats at query
    * time. Returns the committed version. */
  def buildPq(corpus: DataFrame, path: String, m: Int = 4, subLen: Int = 16,
              numCodes: Int = 16, trainIters: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): Int = {
    val spark = corpus.sparkSession
    // units feed train AND encode; books feed encode AND their own write
    // (no-subplan-CSE: pin both)
    val units = Similarity
      .unitVectors(corpus, Seq(idCol -> "id"), vecCol, "unit")
      .localCheckpoint()
    val books = Similarity.pqTrain(units, m, subLen, numCodes, trainIters)
      .localCheckpoint()
    val next = claimVersion(spark, path)
    val vd = vdir(path, next)
    books.write.mode("overwrite").parquet(new Path(vd, "books").toString)
    Similarity.pqEncode(units, books, m, subLen)
      .write.mode("overwrite").parquet(new Path(vd, "codes").toString)
    commitMeta(spark, vd, s"pq $m $subLen $numCodes")
    prune(spark, path, next)
    next
  }

  /** Train + publish an IVF centroid table (cell, centroid) from the
    * label-seeded exact Lloyd refinement (the q87 construction). */
  def buildIvf(corpus: DataFrame, path: String, refineIters: Int = 1,
               idCol: String = "vec_id", vecCol: String = "embedding",
               cellCol: String = "label"): Int = {
    val spark = corpus.sparkSession
    val units = Similarity.unitVectors(
      corpus, Seq(idCol -> "id", cellCol -> "cell"), vecCol)
    val cents = Similarity.kmeansRefineExact(
      units, Similarity.exactCentroids(units), refineIters)
    val next = claimVersion(spark, path)
    val vd = vdir(path, next)
    cents.write.mode("overwrite").parquet(new Path(vd, "centroids").toString)
    commitMeta(spark, vd, s"ivf $refineIters")
    prune(spark, path, next)
    next
  }

  def pqParams(spark: SparkSession, path: String): PqParams = {
    val f = fs(spark, path)
    val in = f.open(new Path(currentDir(spark, path), MetaFile))
    val parts =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.split(" ")
      finally in.close()
    require(parts.length == 4 && parts(0) == "pq",
      s"artifact under $path is '${parts(0)}', not a PQ index")
    PqParams(parts(1).toInt, parts(2).toInt, parts(3).toInt)
  }

  def pqBooks(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(new Path(currentDir(spark, path), "books").toString)

  def pqCodes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(new Path(currentDir(spark, path), "codes").toString)

  def ivfCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(new Path(currentDir(spark, path), "centroids").toString)

  /** PQ-ADC top-k against the persisted index — zero training; the (m,
    * subLen) the LUT needs come from the artifact's own sidecar. */
  def pqTopK(spark: SparkSession, path: String, queries: DataFrame, k: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = pqParams(spark, path)
    Similarity.pqTopKFrom(pqBooks(spark, path), pqCodes(spark, path),
      queries, k, p.m, p.subLen, idCol, vecCol)
  }

  /** IVF assignment of a relation against the persisted centroids (the
    * probe side of the q87 construction). */
  def ivfAssign(spark: SparkSession, path: String, corpus: DataFrame,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.assignCells(
      Similarity.unitVectors(corpus, Seq(idCol -> "id"), vecCol),
      ivfCentroids(spark, path))
}
