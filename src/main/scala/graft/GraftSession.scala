package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory — one place for the engine's session-level
  * tuning so Verify, Bench, Profile and tests run identical configs.
  *
  * Notable choices (all public Spark conf):
  *  - shuffle.partitions = cores (local[32] harness; on a real cluster
  *    AQE coalesces from a larger initial number);
  *  - AQE on: runtime join-strategy switch + skew-join splitting — the
  *    100 TB safety net;
  *  - InferFiltersFromGenerate excluded: it infers `size(arr)>0` below
  *    explode(), and predicate pushdown then re-inlines the generator's
  *    full defining expression into a per-row Filter — for expensive
  *    array builders (regexp tokenize + shingle HOFs) that recomputed the
  *    tokenizer ~6× per row and made shingle dedup 5× slower. The filter
  *    is redundant (explode already drops empty arrays).
  *  - parquet nanos-as-long: Spark 4 rejects TIMESTAMP(NANOS) parquet
  *    (events.ts) otherwise; Tables.load rebuilds a micros timestamp.
  */
object GraftSession {
  def build(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    // Experiment hook: SPARK_GRAFT_EXTRA_CONFS="k1=v1,k2=v2" overlays
    // arbitrary confs (profiling A/B runs) without code changes.
    val extra = sys.env.get("SPARK_GRAFT_EXTRA_CONFS").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val b = SparkSession.builder()
      .withExtensions(new GraftExtensions()(_))
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Driver testdata writes events.ts as non-UTC-adjusted micros; with
      // NTZ inference on, that surfaces as TIMESTAMP_NTZ, which watermarks
      // reject and bigint casts refuse. Read it as session-TZ TIMESTAMP
      // (session is pinned UTC above, so instants are unchanged).
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
              "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // r21: partitioned stores here are bucket-directory layouts (band
      // index, shingle/pair/posting snapshots) whose listings are a few
      // dozen to a few hundred directories; the default threshold (32)
      // turns nearly every probe's listing into a Spark JOB — measured
      // dozens of 0.1–0.2 s listing jobs per lifecycle query. Below 256
      // paths the driver's parallel lister is strictly cheaper; genuinely
      // large partitioned tables (> 256 dirs) still use the distributed
      // listing job, so this stays scale-safe rather than local-tuned.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "256")
      .config("spark.sql.warehouse.dir",
              s"/tmp/graft-warehouse-${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false")
    extra.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }.getOrCreate()
  }
}
