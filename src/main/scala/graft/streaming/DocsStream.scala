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
}
