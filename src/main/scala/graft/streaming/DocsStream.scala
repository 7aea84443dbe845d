package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis => TA}

/** Streaming curation: the q54–q67 batch curation stages re-expressed as a
  * continuously-running ingest pipeline. Every transform here is a narrow
  * map or a watermark-bounded stateful op, so the same code runs in batch
  * (backfills, tests) and as a readStream → writeStream job — the
  * unified-API property the batch catalog relies on.
  *
  * Shape at 100 TB/day: curation is map-only (scales with input
  * partitions, no shuffle); the only state is the within-horizon dedup,
  * bounded by the watermark (one digest per distinct doc inside the
  * horizon — see [[EventsStream.dedupWithinHorizon]]).
  */
object DocsStream {

  /** Curation gates (tuned for the synthetic corpus; at scale these come
    * from config). */
  val MinTokens = 5L
  val MaxTokens = 100000L
  val MaxRepRatio = 0.95
  val KeepLangs = Seq("en", "es", "de", "fr")

  /** Quality + policy curation over documents-shaped rows (doc_id, text,
    * lang, source[, ts]): content digest, token accounting, 3-gram
    * repetition ratio, language/length/repetition gates, PII scrub.
    * Stateless and narrow — usable under any output mode. */
  def curate(docs: DataFrame): DataFrame = {
    val toked = docs
      // digest BEFORE scrubbing: identity is the raw content; reuse an
      // existing digest column (pipeline() already computed it for the
      // dedup) rather than hashing every surviving row a second time
      .withColumn("digest",
        if (docs.columns.contains("digest")) col("digest")
        else md5(col("text")))
      // tokens materialize once in their own projection (HOF re-eval
      // pitfall: lambda consumers re-evaluate inline array exprs)
      .withColumn("toks", TA.wsTokens(lower(col("text"))))
      .withColumn("n_toks", size(col("toks")).cast("long"))
    val grams = toked.withColumn("grams",
      when(size(col("toks")) >= 3,
        transform(sequence(lit(1), size(col("toks")) - 2),
          i => concat_ws(" ", slice(col("toks"), i, lit(3)))))
        .otherwise(array().cast("array<string>")))
    grams
      .withColumn("rep_ratio",
        when(size(col("grams")) > 0,
          lit(1.0) - size(array_distinct(col("grams"))).cast("double") /
            size(col("grams")).cast("double"))
          .otherwise(lit(0.0)))
      .filter(col("n_toks").between(MinTokens, MaxTokens))
      .filter(col("lang").isin(KeepLangs: _*))
      .filter(col("rep_ratio") <= MaxRepRatio)
      .withColumn("text", TA.scrubPii(col("text")))
      .drop("toks", "grams")
  }

  /** Full streaming pipeline: within-horizon exact dedup on the content
    * digest, then the curation gates. `docs` must carry an event-time
    * `ts` column. Dedup runs FIRST so duplicate payloads don't pay the
    * curation cost. */
  def pipeline(docs: DataFrame, horizon: String = "2 hours"): DataFrame =
    // digest is kept through the dedup so curate() reuses it instead of
    // re-hashing every surviving row
    curate(
      EventsStream.dedupWithinHorizon(
        docs.withColumn("digest", md5(col("text"))), Seq("digest"),
        tsCol = "ts", horizon = horizon))

  /** Sink side of the streaming pipeline: upsert each curated micro-batch
    * into a parquet snapshot keyed on the content digest. The watermark
    * dedup bounds state WITHIN the horizon; the keyed sink makes
    * re-observations BEYOND it (and re-delivered batches after a crash)
    * idempotent — together: exactly-once curated output from at-least-
    * once input. Same crash-safe swap as the CVE merge sink. */
  def curatedSink(curated: org.apache.spark.sql.DataFrame, snapshotPath: String,
                  checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    EventsStream.mergeSink(curated, snapshotPath, "digest", checkpoint)

  /** Batch-replay harness: drive the FULL streaming path (file source →
    * watermark dedup → curation → keyed snapshot sink) over a bounded
    * documents table with an AvailableNow trigger, then return the
    * resulting snapshot as a batch DataFrame. Event time is synthesized
    * deterministically from doc_id (1 s apart). This is what turns the
    * streaming pipeline into an oracle-checkable catalog entry (q85):
    * the snapshot's deterministic columns must equal the batch curation
    * of the same input. Work dirs live under a fresh temp directory,
    * removed on JVM exit. */
  def replayDocuments(spark: org.apache.spark.sql.SparkSession,
                      dir: String, horizon: String = "2 hours"): DataFrame = {
    val path = s"$dir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val work = java.nio.file.Files.createTempDirectory("graft_docs_replay_")
    // symlink-safe: the input dir holds links into the source table
    scala.sys.addShutdownHook(graft.sources.Landing.deleteNoFollow(work.toFile))
    val snap = s"$work/snapshot"
    val ckpt = s"$work/ckpt"
    // the file stream source requires a DIRECTORY; link (or copy) the
    // table — single file or part-file directory — into a fresh input
    // dir instead of mutating the fixture
    val in = java.nio.file.Files.createDirectory(work.resolve("in"))
    EventsStream.linkTable(in, path)
    val stream = spark.readStream.schema(schema).parquet(in.toString)
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val q = EventsStream.runAvailableNow(
      curatedSink(pipeline(stream, horizon), snap, ckpt))
    q.awaitTermination()
    spark.read.parquet(snap)
  }

  /** doc_id hash buckets in the persisted shingle store: each batch's
    * shingles are directory-partitioned on a stable bucket of doc_id
    * (the PartitionedSnapshot layout move) so the verify read prunes
    * FILES down to candidate docs' buckets, not just rows. */
  val StoreBuckets = 32

  /** Hash buckets of the verified-pair snapshot (the K1 bounded-MERGE
    * sink): sized so a tick's pair keys touch few directories while each
    * stays rewrite-cheap. */
  val PairBuckets = 32

  /** Read the verified-pair snapshot (heals a whole-dir swap a crashed
    * compaction rebuild left behind, then any bucket a crashed merge
    * left mid-swap, then drops the layout/bookkeeping columns). */
  def readPairs(spark: org.apache.spark.sql.SparkSession, snap: String): DataFrame = {
    graft.SnapshotIO.recover(spark.sparkContext.hadoopConfiguration, snap)
    graft.operators.PartitionedSnapshot.read(spark, snap)
      .select("a_id", "b_id", "jaccard")
  }

  /** Compaction-time pair RETENTION: recompute the verified-pair set
    * from the compacted corpus (latest version of every doc) and
    * atomically replace the pair snapshot — this is where pairs whose
    * docs drifted apart on update EXPIRE, closing the per-tick sink's
    * documented monotonicity (see [[indexedDedupTick]]). O(corpus) by
    * design, riding the same cadence (and the same persisted
    * corpus-shingle frame) as the index rebuild it accompanies.
    * Crash-safe: the replacement layout (sentinel, buckets, sidecar) is
    * staged COMPLETELY beside the live snapshot, then moved in with the
    * whole-dir backup-then-rename swap; [[readPairs]] and the daily tick
    * heal a mid-swap crash, and a re-run recomputes from the unchanged
    * store. */
  def rebuildPairs(corpusSh: DataFrame, snap: String, threshold: Double,
                   numHashes: Int, bands: Int,
                   now: org.apache.spark.sql.Column): Unit = {
    import graft.operators.{Dedup, Merge, PartitionedSnapshot}
    val spark = corpusSh.sparkSession
    val pairs = Dedup.minhashPairsFrom(corpusSh, threshold, numHashes, bands)
      .withColumn("pk", concat_ws(":", col("a_id"), col("b_id")))
    val tmp = snap + "_rebuild_tmp" // staging must start clean
    new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(tmp), true)
    // sentinel-first staging: a zero-pair corpus still publishes a
    // readable (schema-carrying) snapshot
    PartitionedSnapshot.initEmpty(Merge.init(pairs.limit(0)), tmp,
      "pk", PairBuckets)
    PartitionedSnapshot.mergeDelta(spark, tmp, pairs, "pk", now)
    graft.SnapshotIO.swap(spark.sparkContext.hadoopConfiguration, tmp, snap)
  }

  /** On-disk schema of the shingle store: the exploded (doc_id, shingle)
    * rows plus the two directory-partition columns — `batch` (which
    * micro-batch landed the row; the idempotence key) and `doc_bucket`
    * (the pruning key). Fixed here, never inferred: a day-zero store has
    * no files to infer from. */
  val StoreSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("shingle",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("batch",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("doc_bucket",
        org.apache.spark.sql.types.LongType)))

  /** The verify-side read of the shingle store: STRICTLY-EARLIER batches
    * (partition filter on `batch` — the in-flight batch is excluded
    * structurally, so a crash-replayed batch that already appended its
    * shingles cannot double its own rows in verification) restricted to
    * the given doc buckets (partition filter on `doc_bucket` — only
    * files holding candidate docs are opened). Both predicates prune at
    * the FILE level; StreamingSpec asserts the scan metrics.
    *
    * A doc RE-ARRIVING in a later batch (an update, or a daily loop
    * re-landing an overlapping delta) legitimately exists in several
    * `batch=` partitions; verification counts raw rows per doc, so the
    * read keeps each doc's LATEST stored batch only (supersede, the LWW
    * rule) — the window runs over the already-pruned subset, so its
    * shuffle is bounded by the candidate docs' buckets, not the store. */
  def earlierShingles(spark: org.apache.spark.sql.SparkSession, store: String,
                      batchId: Long, buckets: Seq[Long]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    spark.read.schema(StoreSchema).parquet(store)
      .filter(col("batch") < lit(batchId) &&
              col("doc_bucket").isin(buckets: _*))
      .withColumn("latest", max("batch").over(w))
      .filter(col("batch") === col("latest"))
      // a doc whose latest row is the NULL-shingle tombstone is deleted:
      // it contributes no shingles, so verification can never emit a
      // pair for it (the LWW rule doubling as the delete rule)
      .filter(col("shingle").isNotNull)
      .select("doc_id", "shingle")
  }

  /** Full-corpus read of the shingle store (compaction input): all
    * committed batches up to and including `upToBatch`, latest stored
    * batch per doc (same supersede rule as [[earlierShingles]] — a
    * re-arrived doc's OLD shingles must not union with its new ones). */
  def storeShingles(spark: org.apache.spark.sql.SparkSession, store: String,
                    upToBatch: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    spark.read.schema(StoreSchema).parquet(store)
      .filter(col("batch") <= lit(upToBatch))
      .withColumn("latest", max("batch").over(w))
      .filter(col("batch") === col("latest"))
      // tombstoned docs (latest row = null shingle) are not part of the
      // corpus: compaction rebuilds from this read, so the index, the
      // pair snapshot and the consolidated store all physically drop
      // them on the compaction cadence
      .filter(col("shingle").isNotNull)
      .select("doc_id", "shingle")
  }

  /** Doc ids whose LATEST stored batch is a removal tombstone — the
    * delete set live consumers anti-join between compactions. A
    * tombstone batch writes exactly ONE null-shingle row per removed
    * doc (and a removed doc's re-arrival supersedes its tombstone), so
    * "latest batch is null" is exact. Cost is O(tombstoned buckets),
    * not O(store): the tombstone rows alone are found by a columnar
    * null scan (parquet null-count stats skip clean pages), their
    * doc_buckets collected (control-plane, ≤ StoreBuckets values), and
    * only those buckets' files are read for the latest-batch decision.
    * After a store consolidation there are no COMMITTED tombstone rows
    * left — those deletions became physical and the null scan skips
    * clean pages from metadata.
    *
    * CONTRACT on the consolidation cadence: the null scan lists and
    * footer-probes every `batch=` partition, so its control-plane cost
    * is O(ticks since the last consolidation). [[consolidateStore]]
    * (riding the compaction / retention cadence in DailyLoop) is what
    * bounds that count; a deployment that disables consolidation
    * entirely (maxChain = ∞ AND pairRebuildEvery = 0) keeps exact
    * answers but pays a listing that grows one partition per tick —
    * run a consolidation cadence in any long-lived deployment. */
  def deletedDocs(spark: org.apache.spark.sql.SparkSession, store: String,
                  upToBatch: Long): DataFrame =
    deletedDocsOpt(spark, store, upToBatch)
      .getOrElse(spark.range(0).select(col("id").as("doc_id")))

  /** [[deletedDocs]] with the no-tombstones case surfaced to the DRIVER
    * (r22): the null-scan probe already tells it exactly — a None lets
    * callers skip building (and pinning) anti-join plans that the
    * optimizer would only collapse after paying their planning cost. */
  def deletedDocsOpt(spark: org.apache.spark.sql.SparkSession, store: String,
                     upToBatch: Long): Option[DataFrame] = {
    val raw = spark.read.schema(StoreSchema).parquet(store)
      .filter(col("batch") <= lit(upToBatch))
    val buckets = raw.filter(col("shingle").isNull)
      .select("doc_bucket").distinct().collect().map(_.getLong(0)).toSeq
    if (buckets.isEmpty) None
    else Some(raw.filter(col("doc_bucket").isin(buckets: _*))
      .groupBy("doc_id")
      .agg(max("batch").as("latest"),
           max(when(col("shingle").isNull, col("batch"))).as("tomb"))
      .filter(col("tomb").isNotNull && col("tomb") === col("latest"))
      .select("doc_id"))
  }

  /** The LIVE pair view: verified pairs both of whose endpoints are
    * live (un-tombstoned) docs. This is what makes a delete VISIBLE the
    * tick it lands — the snapshot's own upsert sink has no delete path
    * by design (K1 semantics); the anti-join hides dead pairs until the
    * compaction rebuild drops them physically. */
  def livePairs(spark: org.apache.spark.sql.SparkSession, snap: String,
                store: String, upToBatch: Long): DataFrame = {
    val dels = deletedDocs(spark, store, upToBatch)
    readPairs(spark, snap)
      .join(dels.select(col("doc_id").as("a_id")), Seq("a_id"), "left_anti")
      .join(dels.select(col("doc_id").as("b_id")), Seq("b_id"), "left_anti")
      .select("a_id", "b_id", "jaccard") // joins moved their keys first
  }

  /** Shingle-store CONSOLIDATION (the physical doc delete, and the
    * partition-count bound): the COMMITTED live corpus — latest
    * committed version of every doc, docs whose committed tombstone is
    * newest GONE — republished as ONE batch partition stamped with the
    * committed batch id, while the IN-FLIGHT tick's own `batch=`
    * partition is carried over UNCHANGED (raw rows, tombstones
    * included). The split is what keeps the partial-sweep invariant
    * honest: everything above the committed seq stays in a sweepable
    * partition. A re-run that VIOLATES the delta-as-function-of-seq
    * contract (DailyLoop's crash model; `--fetch` enforces it with the
    * landing marker) therefore cannot leave ghost rows — or ghost
    * deletes — baked into committed-looking STORE data; derived
    * artifacts rebuilt from the store (pair snapshot, band index, ANN
    * chains) converge at their next rebuild cadence, which is the
    * bounded blast radius of a contract violation, not a supported
    * flow. A crash re-run simply re-lands
    * its own partition on top and the LWW read dedups; the whole-dir
    * swap is the [[rebuildPairs]] crash-safe pattern (healed by
    * `SnapshotIO.recover` at tick start). Rides the index-compaction /
    * retention cadence; after it, committed tombstones are physical
    * and years of daily partitions collapse to two directories. */
  def consolidateStore(spark: org.apache.spark.sql.SparkSession, store: String,
                       committedBatch: Long, inflightBatch: Long): Unit = {
    import graft.operators.PartitionedSnapshot
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = store + "_rebuild_tmp"
    val f = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
    f.delete(new org.apache.hadoop.fs.Path(tmp), true)
    f.mkdirs(new org.apache.hadoop.fs.Path(tmp))
    // written UNCONDITIONALLY: an emptiness pre-probe would evaluate
    // the O(corpus) LWW window twice (limit(1) cannot push below the
    // window), and an empty partition dir is harmless — every store
    // read uses the fixed StoreSchema, never inference
    storeShingles(spark, store, committedBatch)
      .withColumn("doc_bucket",
        PartitionedSnapshot.bucketOf(col("doc_id"), StoreBuckets))
      .repartition(StoreBuckets, col("doc_bucket"))
      .write.partitionBy("doc_bucket").mode("overwrite")
      .parquet(s"$tmp/batch=$committedBatch")
    // O(delta): the in-flight partition rides across the swap verbatim
    spark.read.schema(StoreSchema).parquet(store)
      .filter(col("batch") === lit(inflightBatch))
      .select("doc_id", "shingle", "doc_bucket")
      .repartition(StoreBuckets, col("doc_bucket"))
      .write.partitionBy("doc_bucket").mode("overwrite")
      .parquet(s"$tmp/batch=$inflightBatch")
    graft.SnapshotIO.swap(conf, tmp, store)
  }

  /** ONE probe→verify→upsert→append tick of the indexed streaming dedup
    * — the foreachBatch body of [[replayIndexedDedup]], factored out so
    * the idempotence spec can re-deliver a committed batch directly.
    *
    * Exactly-once under re-delivery, with NO crash point that corrupts
    * state: the pair snapshot is a keyed upsert (absorbs re-probed
    * pairs); the index layer append only duplicates postings (the
    * candidate distinct() ignores them); and the shingle store append is
    * IDEMPOTENT — the batch's rows land in its own `batch=<id>`
    * partition directory via a wholesale overwrite, so a re-delivered
    * batch replaces its earlier (possibly partial) append instead of
    * doubling it, and the verify read excludes the in-flight partition
    * by filter rather than by anti-join. Verify counts raw rows per doc,
    * so doubled store rows would corrupt jaccard — the old append+
    * anti-join layout left exactly that window between the store append
    * and the checkpoint commit.
    *
    * Re-ARRIVING docs (updates) follow the LWW supersede rule on both
    * store reads (see [[earlierShingles]]/[[storeShingles]]). The pair
    * snapshot itself is MONOTONE between compactions: a pair whose docs
    * drift apart on update keeps its last-verified row (re-verified
    * candidates are upserted with fresh values; pairs that fall below
    * threshold are simply not re-emitted). Stale pairs EXPIRE at the
    * compaction cadence — [[rebuildPairs]], wired into
    * DailyLoop.runTick's compaction step, replaces the snapshot from
    * the compacted corpus. */
  def indexedDedupTick(batch: DataFrame, batchId: Long, idx: String,
                       store: String, snap: String,
                       threshold: Double,
                       removals: Option[DataFrame] = None): Unit = {
    import graft.operators.{BandIndex, Dedup, Merge, PartitionedSnapshot}
    val s = batch.sparkSession
    // the tick's removal set (doc ids to delete): within the tick a
    // removal WINS over a same-id delta row; deletion materializes as a
    // single NULL-shingle tombstone row in the tick's own batch
    // partition — the LWW supersede rule then hides every earlier
    // shingle of the doc, and a later re-arrival supersedes the
    // tombstone (deletes are reversible by re-landing the doc).
    // Multi-consumer and control-plane-small — pinned for the tick.
    val rem = removals.map(_.select("doc_id").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val live = rem.map(r => batch.join(r, Seq("doc_id"), "left_anti"))
      .getOrElse(batch)
    // multi-consumer (probe join, self-join, touched collect, two
    // appends) — persisted for the tick, released before the next
    val bsh = Dedup.explodedShingles(Dedup.shingleSets(live))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one pinned tick: the batch is banded ONCE, serving both
      // the chain probe and the layer append below
      val tick = graft.JobLabel(s, "band delta") { new BandIndex.DeltaTick(idx, bsh) }
      // candidates referencing docs deleted in EARLIER ticks are dead
      // on arrival — their shingles are tombstoned, so verify would
      // drop them anyway — but left in they inflate the touched-bucket
      // collect and the pruned store read below. deletedDocs is
      // O(tombstoned buckets) between compactions and empty-from-
      // metadata after one, so this pre-prune is near-free. (The
      // CURRENT tick's removals are handled by the `rem` anti-joins —
      // their tombstones are not stored yet at probe time.)
      // A doc deleted earlier that RE-LANDS in this very batch is NOT
      // dead: its re-landing row supersedes the tombstone this tick, so
      // its candidate pairs must survive the prune — dropping them here
      // would leave the doc live in the store with its pairs silently
      // missing until the next full pair rebuild (which may never run).
      // Only docs deleted earlier AND absent from this batch are pruned.
      val delsOpt = deletedDocsOpt(s, store, batchId)
        .map(_.join(bsh.select("doc_id").distinct(), Seq("doc_id"), "left_anti"))
      val cand0 = graft.JobLabel(s, "probe candidates") { tick.candidates }
      // When earlier tombstones EXIST, the pruned candidate set is
      // checkpointed here (r21): it feeds the touched-bucket collect
      // below AND the verify join — without the pin the dels anti-join
      // subtree (including deletedDocs' store aggregate) executed once
      // per consumer (no subplan CSE). With NO tombstones (the common
      // clean-stream tick) the anti-joins are the identity, so cand0 —
      // already checkpointed by DeltaTick — serves directly (r22: the
      // unconditional re-checkpoint was a pure block-copy job per tick,
      // one of the q119-pin suspects).
      val cand = delsOpt match {
        case None => cand0
        case Some(dels) => graft.JobLabel(s, "probe candidates") {
          cand0
            .join(dels.select(col("doc_id").as("a_id")), Seq("a_id"), "left_anti")
            .join(dels.select(col("doc_id").as("b_id")), Seq("b_id"), "left_anti")
            .select(cand0.columns.map(col).toSeq: _*)
            .localCheckpoint()
        }
      }
      // control-plane: which store buckets hold candidate docs
      // (≤ StoreBuckets values)
      val touched = graft.JobLabel(s, "touched buckets") {
        cand.select(col("a_id").as("doc_id"))
          .union(cand.select(col("b_id").as("doc_id")))
          .select(PartitionedSnapshot.bucketOf(col("doc_id"), StoreBuckets).as("b"))
          .distinct().collect().map(_.getLong(0)).toSeq.sorted
      }
      // a doc in the CURRENT batch supersedes any stored copy of itself
      // (earlierShingles already keeps only the latest STORED batch per
      // doc; this anti-join applies the same LWW rule to the in-flight
      // version) — without it a re-arriving doc counts double in verify.
      // Docs REMOVED this tick are excluded the same way: their
      // tombstone is not stored yet at verify time, and a dead doc must
      // not seed new pairs in the very tick that deletes it.
      val earlier0 = earlierShingles(s, store, batchId, touched)
        .join(bsh.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      val earlier = rem.map(r => earlier0.join(r, Seq("doc_id"), "left_anti"))
        .getOrElse(earlier0)
      // the verify plan is the tick's expensive stage and the bounded
      // merge consumes it twice (touched-bucket collect + merge write) —
      // persist for the sink's lifetime (the no-subplan-CSE pitfall)
      val pairs = Dedup.verifyPairs(cand, earlier.union(bsh), threshold)
        .withColumn("pk", concat_ws(":", col("a_id"), col("b_id")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // materialize pairs into the keyed snapshot BEFORE the two
        // appends so a re-delivered batch recomputes from the same
        // pre-append state it first saw. The sink is the K1 bounded
        // MERGE (PartitionedSnapshot): only the buckets holding this
        // tick's pair keys are rewritten — O(|new pairs| + touched
        // buckets) per tick, not O(|all pairs ever|); per-bucket
        // crash-safe swaps + the idempotent keyed upsert make a
        // re-delivered batch converge on any mid-merge crash state.
        graft.JobLabel(s, "pair merge") {
          if (!PartitionedSnapshot.isInitialized(s, snap))
            PartitionedSnapshot.initEmpty(Merge.init(pairs.limit(0)), snap,
              "pk", PairBuckets)
          PartitionedSnapshot.mergeDelta(s, snap, pairs, "pk")
        }
      } finally pairs.unpersist()
      // The two O(batch) appends touch DISJOINT stores (the band index's
      // fresh v-dir vs the shingle store's own batch partition) and both
      // consume the already-pinned band/shingle frames, so they run
      // CONCURRENTLY (guide §2.6): each is idempotent under the tick's
      // crash model on its own (a doubled layer is distinct()ed away, a
      // re-run store append overwrites its own partition), so overlap
      // changes wall-clock only, never an answer or convergence.
      val tombRows = rem.map(_.select(col("doc_id"),
          lit(null).cast("long").as("shingle")))
      graft.Par(
        // the O(batch) daily layer, same band rows
        () => graft.JobLabel(s, "layer append") { tick.append() },
        // idempotent O(batch) store append: the live shingles PLUS one
        // null-shingle tombstone row per removed doc, clustered per
        // bucket into one task (same small-files reasoning as
        // BandIndex.write)
        () => graft.JobLabel(s, "store append") {
          tombRows.map(bsh.unionByName(_)).getOrElse(bsh)
            .withColumn("doc_bucket",
              PartitionedSnapshot.bucketOf(col("doc_id"), StoreBuckets))
            .repartition(StoreBuckets, col("doc_bucket"))
            .write.partitionBy("doc_bucket").mode("overwrite")
            .parquet(s"$store/batch=$batchId")
        })
    } finally { bsh.unpersist(); rem.foreach(_.unpersist()); () }
    ()
  }

  /** Streaming incremental near-dup detection against the PERSISTED
    * layered band index — the q106/q117 daily loop run as a continuous
    * pipeline. Every micro-batch: (1) shingles its docs, (2) probes the
    * index CHAIN for candidates against all earlier docs plus itself and
    * exact-verifies them, (3) upserts the verified pairs into a keyed
    * snapshot, (4) appends its own band rows as an O(batch) index layer
    * and its shingles to the bucketed verification store. A pair is
    * discovered exactly when its LATER member arrives, so the final
    * snapshot equals the FULL-CORPUS pair set no matter how the engine
    * batches the input — the batching-invariance that makes a streaming
    * pipeline oracle-checkable (q118 gates it against the same DuckDB
    * truth as batch q32; StreamingSpec pins 1-batch == N-batch).
    * Per-tick semantics and the exactly-once argument live on
    * [[indexedDedupTick]].
    *
    * 100 TB/day shape: per tick the corpus-sized relations are touched
    * only via the partition-pruned chain probe and the store read pruned
    * to earlier batches × candidate-doc buckets (file-level, then the
    * verify semi-join row-level); signatures/banding/append are
    * O(batch). The pair snapshot IS the K1 bucketed partition-overwrite
    * merge (PartitionedSnapshot): per tick only the pk-buckets holding
    * new pairs are rewritten — O(new pairs + touched buckets), never
    * O(all pairs ever). */
  def replayIndexedDedup(spark: org.apache.spark.sql.SparkSession,
                         dir: String, threshold: Double,
                         inputSplits: Int = 4): DataFrame = {
    import graft.operators.{BandIndex, Dedup}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("graft_docs_incdedup_")
    scala.sys.addShutdownHook(graft.sources.Landing.deleteNoFollow(work.toFile))
    // deterministic multi-file input so AvailableNow + maxFilesPerTrigger
    // genuinely exercises the incremental path (a single-file table would
    // collapse into one all-delta batch)
    val in = work.resolve("in").toString
    docs.repartitionByRange(inputSplits, col("doc_id")).write.parquet(in)
    val idx = "file:" + work.resolve("idx")
    val store = java.nio.file.Files.createDirectory(work.resolve("shingles"))
      .toString // empty dir: day-zero store (schema is fixed, not inferred)
    val snap = work.resolve("pairs").toString
    // day zero: an EMPTY committed base version, so the first batch
    // probes legally and yields its delta-internal pairs
    BandIndex.write(Dedup.explodedShingles(Dedup.shingleSets(docs.limit(0))), idx)
    val q = EventsStream.runAvailableNow(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .writeStream
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .outputMode("update")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          indexedDedupTick(batch, batchId, idx, store, snap, threshold)
        })
    q.awaitTermination()
    readPairs(spark, snap)
  }
}
