package graft

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.BandIndex
import graft.streaming.DocsStream

/** The reference's full operational loop (main.py:123-147) wired
  * end-to-end against the PERSISTED dedup index: every daily tick lands
  * the CVE deltas through the K1 merge, runs the document delta through
  * the probe→verify→upsert→append dedup tick (the q118 machinery), and
  * compacts the index chain when it exceeds the cadence threshold — then
  * commits the tick atomically.
  *
  * Crash model — ONE commit point per tick. A tick touches six stores
  * (CVE snapshot, watermark table, pair snapshot, shingle store, band
  * index, PQ ann index); giving each its own "done" flag would create
  * crash windows
  * where half a tick is visible and the other half re-runs under a new
  * batch id (doubling shingle rows — exactly the corruption class the
  * round-8 verdict flagged in the old store). Instead a tick COMMITS by
  * atomically creating one marker file (`tick-<seq>-<millis>`, the
  * BandIndex claim-file pattern); every step before that is idempotent
  * under a full re-run with the SAME batch id (= committed seq + 1):
  * the K1 merge is a keyed upsert, the pair snapshot a keyed upsert,
  * the shingle store a wholesale overwrite of the tick's own
  * `batch=<id>` partition (partials from a crashed attempt are swept at
  * tick start — any partition above the committed seq is by definition
  * uncommitted), and a double layer append only duplicates postings,
  * which probes distinct() away and the next compaction collapses.
  * So: crash anywhere before the marker → the whole tick re-runs and
  * converges to the state a crash-free run would have produced
  * (DailyLoopSpec injects a crash after every step and asserts exactly
  * that); crash after the marker → the tick is complete.
  *
  * 100 TB shape: per tick the corpus-sized relations are touched only
  * through the partition-pruned index probe and the bucket-pruned store
  * read (see [[DocsStream.indexedDedupTick]]); the compaction rebuild
  * (index AND pair-snapshot retention, [[DocsStream.rebuildPairs]]) is
  * the only O(corpus) stage and runs once per `maxChain` ticks — the
  * knob that trades nightly rebuild cost against probe chain length.
  */
object DailyLoop {

  /** Fail-point injection for the crash spec: throw AFTER the named
    * step, before the tick commits. */
  sealed trait FailPoint
  case object AfterMerge extends FailPoint
  case object AfterDedup extends FailPoint
  case object AfterAnn extends FailPoint
  case object AfterCompact extends FailPoint
  final class InjectedCrash(at: FailPoint)
    extends RuntimeException(s"injected crash $at")

  /** Everything a tick persists, rooted under one directory. */
  final case class Paths(root: String) {
    val snapshot = s"$root/snapshot"   // CVE K1 merge target
    val status   = s"$root/status"     // per-source watermark table
    val index    = s"$root/idx"        // layered band index
    val store    = s"$root/shingles"   // bucketed shingle store
    val pairs    = s"$root/pairs"      // verified near-dup pairs
    val ann      = s"$root/ann"        // versioned PQ index (AnnIndex)
    val annPost  = s"$root/annpost"    // IVF posting store (AnnIndex)
    val ticks    = s"$root/ticks"      // tick marker files (commit points)
  }

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val Marker = """tick-(\d+)-(\d+)""".r

  /** Committed tick count and the last committed tick's stamp — read
    * from the marker files, the loop's ONLY source of tick-completion
    * truth (the watermark table is freshness metadata for P11 consumers,
    * not a commit flag). */
  def committedTick(spark: SparkSession, p: Paths): (Long, Option[Timestamp]) = {
    val f = fs(spark, p.ticks)
    val dir = new Path(p.ticks)
    if (!f.exists(dir)) (0L, None)
    else {
      val ms = f.listStatus(dir).toSeq.map(_.getPath.getName).collect {
        case Marker(n, t) => (n.toLong, t.toLong)
      }
      if (ms.isEmpty) (0L, None)
      else {
        val (n, t) = ms.maxBy(_._1)
        (n, Some(new Timestamp(t)))
      }
    }
  }

  /** T3 catch-up semantics on the marker clock: due when no tick has
    * ever committed or elapsed ≥ interval. FLOAT hours (the reference's
    * `float(...)` scheduler semantics, main.py:210) — sub-hour intervals
    * are representable; millis conversion happens once, here. */
  def isTickDue(spark: SparkSession, p: Paths, now: Timestamp,
                intervalHours: Double = 24): Boolean =
    committedTick(spark, p)._2 match {
      case None => true
      case Some(last) =>
        now.getTime - last.getTime >= (intervalHours * 3600 * 1000).toLong
    }

  /** Sweep shingle-store partitions above the committed seq: they can
    * only be a crashed attempt's partial append (a committed tick's
    * partition is by construction ≤ its marker's seq). */
  private def sweepPartials(spark: SparkSession, p: Paths, committed: Long): Unit = {
    val f = fs(spark, p.store)
    val dir = new Path(p.store)
    if (f.exists(dir)) f.listStatus(dir).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .filter { d =>
        d.getName.split("=", 2) match {
          case Array("batch", v) => scala.util.Try(v.toLong).toOption.exists(_ > committed)
          case _ => false
        }
      }
      .foreach(f.delete(_, true))
  }

  /** One daily tick. Steps, in order: (1) K1 merge of the landed CVE
    * sources into the snapshot + prioritize (CveJob.runTick without its
    * watermark stamp — the COMBINED tick owns commit), (2) the indexed
    * dedup tick over the landed document delta, (2b) the ANN ingest of
    * the landed embedding delta (batch-stamped build/append +
    * answer-invariant compaction, see below), (3) compaction when the
    * layer chain exceeds `maxChain` (full rebuild from the store under
    * the index's OWN layout — a compaction must never change the hash
    * family), (4) freshness stamp, (5) the marker commit. */
  def runTick(spark: SparkSession, landing: CvePipeline.Landing,
              docsDelta: DataFrame, p: Paths, now: Timestamp,
              threshold: Double = 0.8, maxChain: Int = Int.MaxValue,
              failAt: Option[FailPoint] = None,
              keepMarkers: Int = KeepMarkers,
              embDelta: Option[DataFrame] = None,
              annMaxChain: Int = Int.MaxValue): Unit = {
    val (committed, _) = committedTick(spark, p)
    val batchId = committed + 1
    // day-zero store dir: the verify read's fixed schema needs a path to
    // exist even before the first partition lands
    fs(spark, p.store).mkdirs(new Path(p.store))
    sweepPartials(spark, p, committed)
    // heal a pair snapshot a crashed compaction rebuild left mid-swap —
    // BEFORE any layout probe (a missing dir would read as day zero)
    SnapshotIO.recover(spark.sparkContext.hadoopConfiguration, p.pairs)

    // (1) the CVE enrichment merge — CveJob.mergeLanded, the BOUNDED
    // K1 path: only the id-hash buckets the tick's delta touches are
    // rewritten (PartitionedSnapshot.mergeDelta), never the whole
    // snapshot. Idempotent under the one-marker re-run: the keyed upsert
    // absorbs a re-landed delta, per-bucket swaps heal on read. A tick
    // with NO landed sources (doc-only deployments, or a day every
    // upstream was fresh per P11) skips it.
    if (!landing.isEmpty)
      CveJob.mergeLanded(spark, landing, p.snapshot, now)
    if (failAt.contains(AfterMerge)) throw new InjectedCrash(AfterMerge)

    // (2) probe → verify → pair upsert → layer + store append.
    // Day zero: commit an EMPTY base version so the first delta probes
    // legally and yields its delta-internal pairs (guarded — a crash
    // re-run must not stack a second base).
    if (!BandIndex.isBuilt(spark, p.index))
      BandIndex.write(operators.Dedup.explodedShingles(
        operators.Dedup.shingleSets(docsDelta.limit(0))), p.index)
    DocsStream.indexedDedupTick(docsDelta, batchId, p.index, p.store,
      p.pairs, threshold)
    if (failAt.contains(AfterDedup)) throw new InjectedCrash(AfterDedup)

    // (2b) the ANN ingest, when an embedding delta landed: day zero
    // TRAINS and publishes the base (the tick's delta is the training
    // set — the pinned codebook every later append encodes against);
    // after that each tick is an O(delta) pinned-codebook append, and
    // the chain compacts on its own cadence WITHOUT retraining
    // (AnnIndex.compactPq — answer-invariant, so compaction timing
    // never changes probe results; a retraining refresh is a
    // deliberate quality event outside the loop). Idempotence under
    // the one-marker crash model comes from the batch stamp: a re-run
    // whose batch already sits at the committed head skips the step —
    // duplicate PQ codes would DOUBLE ADC sums, so this skip is load-
    // bearing, not an optimization. checkDisjoint stays off: the loop's
    // delta contract (new vec_ids only) is the stream's own invariant,
    // and the O(corpus) id scan would break the tick's O(delta) claim.
    // A zero-row delta skips the whole step (one limit-1 probe): a
    // day-zero build on it would train an EMPTY codebook and poison
    // every later append; an append of it would only grow the chain.
    embDelta.filter(!_.limit(1).isEmpty).foreach { emb =>
      if (!operators.AnnIndex.isBuilt(spark, p.ann))
        operators.AnnIndex.buildPq(emb, p.ann, batchId = Some(batchId))
      else if (!operators.AnnIndex.headBatch(spark, p.ann).contains(batchId))
        operators.AnnIndex.appendPq(emb, p.ann, checkDisjoint = false,
          batchId = Some(batchId))
      if (operators.AnnIndex.pqChain(spark, p.ann).length > annMaxChain)
        operators.AnnIndex.compactPq(spark, p.ann)

      // (2c) the IVF posting store, same lifecycle. Only the day-zero
      // TRAIN needs a seed-cell column — a label-free pipeline keeps
      // the PQ index alone until a labeled delta seeds the store; once
      // LIVE, every delta appends (assignment needs only the pinned
      // centroids), so the store can never silently fall behind the PQ
      // index over a label-less day. Batch-stamp idempotence and
      // answer-invariant compaction are identical to 2b (duplicate
      // postings would double candidates, the same corruption class as
      // duplicate codes).
      if (operators.AnnIndex.isBuilt(spark, p.annPost)) {
        if (!operators.AnnIndex.headBatch(spark, p.annPost).contains(batchId))
          operators.AnnIndex.appendIvfPostings(emb, p.annPost,
            batchId = Some(batchId), checkDisjoint = false)
        if (operators.AnnIndex.ivfpChain(spark, p.annPost).length > annMaxChain)
          operators.AnnIndex.compactIvfPostings(spark, p.annPost)
      } else if (emb.columns.contains("label"))
        operators.AnnIndex.buildIvfPostings(emb, p.annPost,
          batchId = Some(batchId))
    }
    if (failAt.contains(AfterAnn)) throw new InjectedCrash(AfterAnn)

    // (3) compaction cadence: collapse the chain once probes would walk
    // more than maxChain layers — the store holds the full committed
    // corpus (this tick's partition included), so the rebuild needs no
    // other input. The PAIR snapshot is rebuilt on the same cadence
    // (retention: drifted-apart pairs expire, DocsStream.rebuildPairs)
    // and FIRST — the chain stays > maxChain until the index rebuild
    // commits, so a crash anywhere inside this step re-runs the whole
    // compaction instead of leaving the pair rebuild silently skipped.
    if (BandIndex.chainLength(spark, p.index) > maxChain) {
      val l = BandIndex.layout(spark, p.index)
      val corpusSh = DocsStream.storeShingles(spark, p.store, batchId)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        DocsStream.rebuildPairs(corpusSh, p.pairs, threshold,
          l.numHashes, l.bands, lit(now.toString).cast("timestamp"))
        BandIndex.write(corpusSh, p.index, l.numHashes, l.bands, l.buckets)
      } finally { corpusSh.unpersist(); () }
    }
    if (failAt.contains(AfterCompact)) throw new InjectedCrash(AfterCompact)

    // (4) freshness metadata for P11 consumers (idempotent re-stamp)
    operators.Watermarks.upsert(spark, p.status, CveJob.JobSource, now)

    // (5) THE commit: one atomic marker create — then sweep markers
    // older than the newest KeepMarkers so the tick-listing control
    // plane stays O(KeepMarkers) over years of daily ticks (the max
    // marker is what defines the committed seq, so pruning history
    // never moves it)
    val f = fs(spark, p.ticks)
    f.mkdirs(new Path(p.ticks))
    f.create(new Path(p.ticks, s"tick-$batchId-${now.getTime}"), false).close()
    f.listStatus(new Path(p.ticks)).toSeq.map(_.getPath).collect {
      case pt if Marker.findFirstMatchIn(pt.getName)
                   .exists(_.group(1).toLong <= batchId - keepMarkers) => pt
    }.foreach(f.delete(_, false))
  }

  /** Tick markers retained after each commit (enough history to debug a
    * stretch of ticks; the committed seq is always the max marker). */
  val KeepMarkers = 32

  /** The scheduler loop (T1/T6 shape, marker clock): tick when due,
    * sleep otherwise, stop cooperatively. Returns ticks run. BOTH
    * inputs are per-tick functions of the tick seq — a long-running
    * deployment lands a fresh set of source files each day, so a fixed
    * Landing would re-merge day one's files forever (idempotent but
    * wasted work and stale data). */
  def loop(spark: SparkSession, landing: Long => CvePipeline.Landing,
           docsDelta: Long => DataFrame, p: Paths,
           intervalHours: Double, shouldStop: () => Boolean,
           clock: () => Timestamp,
           threshold: Double = 0.8, maxChain: Int = Int.MaxValue,
           sleepMs: Long = 1000L,
           embDelta: Long => Option[DataFrame] = _ => None,
           annMaxChain: Int = Int.MaxValue): Int = {
    var ticks = 0
    while (!shouldStop()) {
      val now = clock()
      if (isTickDue(spark, p, now, intervalHours)) {
        val seq = committedTick(spark, p)._1 + 1
        runTick(spark, landing(seq), docsDelta(seq), p, now, threshold,
          maxChain, embDelta = embDelta(seq), annMaxChain = annMaxChain)
        ticks += 1
      } else Thread.sleep(sleepMs)
    }
    ticks
  }
}
