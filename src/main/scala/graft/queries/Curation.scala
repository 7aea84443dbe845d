package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Sketches, TextAnalysis => TA, TrainingExport}

/** Training-data curation beyond dedup: the operations a 100 TB pretraining
  * pipeline runs between "raw crawl" and "tokenizer input", each with a
  * DuckDB oracle.
  *
  *  - q54 decontamination: drop corpus docs that share n-gram shingles with
  *    a held-out benchmark set (the standard test-set-overlap guard);
  *  - q55 stratified sampling / domain mixing: deterministic per-stratum
  *    keep-rates (hash-mod, not rand() — reproducible across reruns);
  *  - q56 quality-percentile curation: keep the top deciles per source;
  *  - q57 deterministic shuffle + sequence packing: multiplicative-hash
  *    order, sharded greedy packing into fixed token budgets.
  */
object Curation {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  /** Corpus docs sharing ≥ this many shingles with the benchmark are
    * flagged contaminated. */
  val ContaminationHits = 3L
  /** Token budget per packed training sequence (q57). */
  val PackBudget = 2048L
  /** Packing shards — at scale this is the parallelism unit: packing is a
    * per-shard running sum, embarrassingly parallel across shards. */
  val PackShards = 8L
  /** Chunking window / overlap in tokens (q65). */
  val ChunkTokens = 64L
  val ChunkOverlap = 16L
  val ChunkStride: Long = ChunkTokens - ChunkOverlap
  /** Tokens with corpus frequency ≤ this count as "rare" (q66). */
  val RareMax = 2L
  /** Total sampled-doc budget for temperature-weighted mixing (q69). */
  val MixBudget = 300L
  /** Fixed-point scale for bigram probability ratios (q72). */
  val BigramScale = 1000000000L
  /** Shard count for the export-manifest twin (q93). */
  val ExportShards = 8
  /** Misra–Gries counter budget (q94): guarantees every key above a
    * 1/1024 frequency share survives candidate generation. */
  val HeavyK = 1024
  /** Robust-outlier threshold (q105): flag |x − median| > MadK · MAD. */
  val MadK = 2L

  /** Portable polynomial char fold (codegen'd PolyHash) — the
    * SQL-expressible stand-in for xxhash64 in oracle-parity twins
    * (q74 precedent). */
  private def polyFold(c: org.apache.spark.sql.Column, b: Long, p: Long) =
    call_function("graft_polyhash", c, lit(b), lit(p))

  val queries: Map[String, Q] = Map(
    // Decontamination. Benchmark = every 20th doc (stands in for an eval
    // set). Scale shape: the benchmark's distinct shingles are tiny vs the
    // corpus and broadcast — the 100 TB corpus side NEVER shuffles for the
    // probe; only the per-doc hit count shuffles on doc_id. Shingles ride
    // as xxhash64 (8-byte join keys; q31/q32 precedent: hashed-shingle
    // counts hash-match the string-shingle oracle).
    "q54_decontaminate" -> ((s, dir) => {
      // withPersisted: both join sides scan the exploded shingles, so
      // cache them for the (eagerly materialized) computation instead of
      // tokenizing + hashing the corpus twice.
      Dedup.withPersisted(
        Dedup.explodedShingles(Dedup.shingleSets(t(s, dir, "documents")))) { sh =>
        val bench = sh.filter(col("doc_id") % 20 === 0)
          .select("shingle").distinct()
        sh.filter(col("doc_id") % 20 =!= 0)
          .join(broadcast(bench), "shingle")
          // shingles are distinct per doc, so count(1) = distinct shared
          .groupBy("doc_id").agg(count(lit(1)).as("bench_hits"))
          .filter(col("bench_hits") >= ContaminationHits)
      }.orderBy("doc_id") // sort outside the checkpointed frame
    }),

    // Stratified sampling to target domain mix: keep 50% of en, 25% of
    // es, 10% of everything else — decided by doc_id mod, so the sample
    // is deterministic, resumable, and identical on every executor.
    // Narrow until the final small agg; no shuffle of the kept rows.
    "q55_stratified_sample" -> ((s, dir) => {
      val rate = when(col("lang") === "en", 50L)
        .when(col("lang") === "es", 25L).otherwise(10L)
      t(s, dir, "documents")
        .withColumn("rate", rate)
        .filter(pmod(col("doc_id"), lit(100L)) < col("rate"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept"),
             sum(col("n_chars")).as("kept_chars"))
        .orderBy("lang")
    }),

    // Quality-percentile curation: decile docs per source by length (the
    // stand-in quality score), keep the top 3 deciles. One shuffle on
    // source for the window; ties broken by doc_id for a total order.
    "q56_quality_percentile" -> ((s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      t(s, dir, "documents")
        .withColumn("decile", ntile(10).over(w))
        .filter(col("decile") <= 3)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("kept"),
             min(col("n_chars")).as("cutoff_chars"))
        .orderBy("source")
    }),

    // Repetition detection — the standard "degenerate text" quality
    // filter: fraction of duplicated 3-grams per doc. Narrow per-row
    // transform (tokens materialized once; HOF sub-expressions re-evaluate
    // per element otherwise), no shuffle until the final tiny sort.
    "q62_repetition" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), TA.wsTokens(lower(col("text"))).as("toks"))
      val grams = d.select(col("doc_id"),
        when(size(col("toks")) >= 3,
          transform(sequence(lit(1), size(col("toks")) - 2),
            i => concat_ws(" ", slice(col("toks"), i, lit(3)))))
          .otherwise(array().cast("array<string>")).as("grams"))
      grams.select(col("doc_id"),
          size(col("grams")).cast("long").as("total_grams"),
          size(array_distinct(col("grams"))).cast("long").as("distinct_grams"))
        .withColumn("rep_ratio",
          when(col("total_grams") > 0,
            round(lit(1.0) - col("distinct_grams").cast("double") /
              col("total_grams").cast("double"), 6)))
        .orderBy("doc_id")
    }),

    // Exact distributed order statistics: p50/p90/p99 of doc length per
    // source, computed from rank positions (nearest-rank definition, so
    // both engines share the EXACT definition — approx sketches like
    // percentile_approx are engine-specific). One shuffle on source for
    // the window; the rank filter keeps only ≤3 rows per group.
    // At 100 TB: same shape — rank positions come from a per-group sort,
    // never a global one, and groups are independent.
    "q59_exact_quantiles" -> ((s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").asc, col("doc_id").asc)
      val ranked = t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      // nearest-rank: smallest rn with rn >= ceil(p * n)
      def pick(p: Double, as: String) =
        max(when(col("rn") === least(greatest(ceil(lit(p) * col("n")), lit(1L)), col("n")),
                 col("n_chars"))).as(as)
      ranked.groupBy(col("source"))
        .agg(pick(0.5, "p50"), pick(0.9, "p90"), pick(0.99, "p99"),
             max(col("n")).as("n_docs"))
        .orderBy("source")
    }),

    // Temperature-weighted domain mixing — the pretraining source-mix
    // rebalance (upsample small domains, downsample big ones): per-source
    // quotas ∝ count^(1/2), then the first quota-many docs per source in
    // deterministic hash order. Everything stays in integer space so both
    // engines agree exactly: weight = floor(sqrt(count)) (IEEE sqrt is
    // correctly rounded and perfect squares are exact, so floor is
    // stable), quota = budget * weight // Σweights. Two tiny aggs + one
    // per-source window; the corpus never shuffles more than once.
    "q69_domain_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // weights is one row per source but feeds two consumers (the
      // totalW scalar and the quota join) — localCheckpoint computes the
      // corpus agg once instead of re-scanning per consumer.
      val weights = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("w", floor(sqrt(col("cnt"))).cast("long"))
        .localCheckpoint()
      // control-plane scalar; integer div — a double quotient's floor
      // can flip at an ulp boundary, `div` cannot
      val totalW = weights.agg(sum(col("w"))).head.getLong(0)
      val quotas = weights
        .withColumn("quota", expr(s"(w * $MixBudget) div $totalW"))
        .select("source", "cnt", "quota")
      val w = Window.partitionBy(col("source"))
        .orderBy(xxhash64(col("doc_id")).asc, col("doc_id").asc)
      val sampled = docs.withColumn("rn", row_number().over(w))
        .join(broadcast(quotas.select("source", "quota")), "source")
        .filter(col("rn") <= col("quota"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("sampled"))
      // Build the report FROM quotas so a zero-quota source still
      // appears with sampled=0 (the oracle emits every source; deriving
      // the output from the filtered rows would silently drop it).
      quotas.join(sampled, Seq("source"), "left")
        .select(col("source"),
                coalesce(col("sampled"), lit(0L)).as("sampled"),
                col("cnt").as("pool"), col("quota"))
        .orderBy("source")
    }),

    // Bloom-filter decontamination — q54's semantics with the 100 TB
    // probe shape: the benchmark shingles are folded into a 16 KiB Bloom
    // bitset (mergeable aggregate, bitwise-OR shuffle of fixed-size
    // buffers), the corpus shingle stream is pruned map-side by the
    // bit-test probe BEFORE anything shuffles, and only the surviving
    // candidates hit the exact verify join — so false positives are
    // removed and the result is exactly q54's (same oracle). At 100 TB
    // the broadcast exact-shingle set of q54 stops fitting; the bloom
    // prefilter + candidate-only verify is what replaces it.
    "q67_bloom_decontaminate" -> ((s, dir) => {
      import graft.operators.Bloom
      Dedup.withPersisted(
        Dedup.explodedShingles(Dedup.shingleSets(t(s, dir, "documents")))) { sh =>
        val bench = sh.filter(col("doc_id") % 20 === 0)
          .select("shingle").distinct()
        val bits = Bloom.build(bench, "shingle")
        sh.filter(col("doc_id") % 20 =!= 0)
          .filter(Bloom.mightContain(bits, col("shingle")))
          .join(broadcast(bench), "shingle")
          .groupBy("doc_id").agg(count(lit(1)).as("bench_hits"))
          .filter(col("bench_hits") >= ContaminationHits)
      }.orderBy("doc_id")
    }),

    // Sliding-window document chunking — the context-window prep step:
    // split each doc into ChunkTokens-token windows advancing by
    // ChunkStride (so consecutive chunks share ChunkOverlap tokens); the
    // last chunk is short. Tokens materialize once per doc in their own
    // projection BEFORE the generate consumes them (HOF re-eval pitfall);
    // the explode multiplies rows ~n/stride with no shuffle — a map-side
    // stage at 100 TB. md5 of each chunk proves content equality.
    "q65_chunk_docs" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), TA.wsTokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
      d.select(col("doc_id"), col("toks"), col("n"),
          explode(sequence(lit(0L),
            when(col("n") <= ChunkTokens, 0L)
              .otherwise((col("n") - ChunkTokens + ChunkStride - 1L) / lit(ChunkStride))
              .cast("long"))).as("chunk_id"))
        .withColumn("start", col("chunk_id") * ChunkStride)
        .withColumn("chunk_toks", least(lit(ChunkTokens), col("n") - col("start")))
        .select(col("doc_id"), col("chunk_id"), col("chunk_toks"),
          md5(concat_ws(" ",
            slice(col("toks"), (col("start") + 1L).cast("int"),
                  col("chunk_toks").cast("int")))).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    }),

    // Unigram corpus-frequency quality scoring — the exact-arithmetic
    // stand-in for unigram-LM log-prob (ln() is not cross-engine
    // bit-stable; integer counts and one correctly-rounded IEEE division
    // are). Shape at 100 TB: vocab is corpus-derived but vocab-sized
    // (≪ corpus); it broadcasts to score the exploded token stream, the
    // only shuffles are the two hash aggs (vocab build + per-doc fold).
    "q66_unigram_quality" -> ((s, dir) => {
      // The exploded token stream feeds BOTH the vocab build and the
      // scoring join — persist it (reuse pitfall: a frame referenced
      // twice re-executes its upstream; Dedup.withPersisted releases the
      // cache after eager materialization).
      Dedup.withPersisted(
        t(s, dir, "documents")
          .select(col("doc_id"), explode(TA.wordTokens(col("text"))).as("tok"))) { tk =>
        val vocab = tk.groupBy("tok").agg(count(lit(1)).as("cnt"))
        // No broadcast hint: a corpus-derived vocab is small here (AQE
        // sees the runtime size and broadcasts) but at 100 TB it can be
        // 100M+ tokens — forcing broadcast would be wrong; letting AQE
        // decide degrades gracefully to a shuffle join on tok.
        tk.join(vocab, "tok")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_toks"),
               sum(col("cnt")).as("cnt_sum"),
               sum(when(col("cnt") <= RareMax, 1L).otherwise(0L)).as("rare_hits"))
          .withColumn("mean_cnt",
            col("cnt_sum").cast("double") / col("n_toks").cast("double"))
          .withColumn("rare_ratio",
            col("rare_hits").cast("double") / col("n_toks").cast("double"))
      }.orderBy("doc_id")
    }),

    // Bigram conditional-probability LM scoring — one step up from q66's
    // unigram frequencies: score = mean over a doc's bigrams of
    // P(w2|w1) = corpus_count(w1 w2) / corpus_count(w1 as bigram head).
    // The ratios stay in INTEGER space (scaled floor division by 1e9) —
    // double→decimal casts are NOT cross-engine stable (Spark rounds the
    // shortest string repr, DuckDB the binary expansion; they disagree at
    // the 17th digit), but integer div is. One exact-int IEEE division at
    // the end is correctly rounded and deterministic. Shape: bigram
    // counts shuffle on (w1,w2); head counts are vocab-sized and
    // AQE-broadcast; the per-doc fold is one hash agg.
    "q72_bigram_quality" -> ((s, dir) => {
      val toked = t(s, dir, "documents")
        .select(col("doc_id"), TA.wordTokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks")))
      val bg = toked
        .select(col("doc_id"),
          explode(when(col("n") >= 2,
            transform(sequence(lit(1), col("n") - 1), i =>
              struct(element_at(col("toks"), i).as("w1"),
                     element_at(col("toks"), i + 1).as("w2"))))
            .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      Dedup.withPersisted(bg) { bgp =>
        val cBg = bgp.groupBy("w1", "w2").agg(count(lit(1)).as("c_bg"))
        val cHead = bgp.groupBy("w1").agg(count(lit(1)).as("c_head"))
        // join the (small) aggregates first so the scaled ratio computes
        // once per DISTINCT bigram; the occurrence relation then takes
        // one join instead of two
        val probs = cBg.join(cHead, Seq("w1"))
          // scaled integer ratio; sums stay < 2^53 up to ~9M bigrams —
          // beyond that, sum in DECIMAL(38,0) instead
          .withColumn("p9", expr(s"(c_bg * $BigramScale) div c_head"))
          .select("w1", "w2", "p9")
        bgp.join(probs, Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
               sum(col("p9")).as("p9_sum"))
          .withColumn("mean_p",
            col("p9_sum").cast("double") /
              (col("n_bigrams") * BigramScale).cast("double"))
          .drop("p9_sum")
      }.orderBy("doc_id")
    }),

    // Dataset-versioning CDC: keyed digest diff of two corpus snapshots
    // (simulated deterministically from the documents table: % 11 / % 13
    // membership windows plus a text edit on % 17) → added / removed /
    // changed report, unchanged rows filtered before materializing. The
    // digest is an explicit canonical encoding, never engine-native
    // struct rendering.
    "q115_snapshot_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val prev = docs.filter(col("doc_id") % 11 =!= 0)
      val cur = docs.filter(col("doc_id") % 13 =!= 0)
        .withColumn("text", when(col("doc_id") % 17 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      graft.operators.Merge.snapshotDiff(prev, cur, "doc_id",
          Seq("text", "lang", "source", "n_chars"))
        .orderBy("doc_id")
    }),

    // Curriculum ordering: EXACT global rank of every doc by length
    // (quality stand-in) with NO single-task sort — range exchange on
    // the ordering key, parallel within-partition ranks, control-plane
    // offsets (the two-level shape q110 uses for prefix sums, applied
    // to ordering). The oracle runs the naive global window; equality
    // proves the distributed rank for any boundary placement.
    "q112_curriculum_rank" -> ((s, dir) =>
      graft.operators.Sampling.globalRankByWeight(
          t(s, dir, "documents"), "doc_id", "n_chars", partitions = 16)
        .withColumnRenamed("id", "doc_id")
        .orderBy("rank")),

    // Weighted subsample: systematic PPS, 40 picks per source, weight =
    // n_chars — integer-exact selection (no RNG, no libm keys). The
    // Spark side computes the cumulative weight as the SCALABLE
    // two-level prefix sum (parallel per-bucket windows + a tiny bucket
    // carry; bucketSize forced small here so the decomposition is
    // really exercised) while the oracle runs the plain single-window
    // form — hash equality proves the decomposition correct.
    "q110_weighted_sample" -> ((s, dir) =>
      graft.operators.Sampling.systematicPps(
          t(s, dir, "documents"), "source", "doc_id", "n_chars", k = 40,
          bucketSize = 1024L)
        .withColumnRenamed("stratum", "source")
        .withColumnRenamed("id", "doc_id")
        .orderBy("source", "doc_id")),

    // Corpus-level boilerplate spans (the C4/RefinedWeb repeated-span
    // rule): 3-grams occurring in >= 4 distinct docs are boilerplate —
    // templated headers, navboxes — and each doc reports how many of its
    // gram OCCURRENCES are boilerplate (coverage, not distinct types).
    // Plan: the per-gram df aggregation and the occurrence join-back
    // share the gram shuffle key; one doc_id rollup; the gram relation
    // is persisted across its two consumers.
    "q108_boilerplate" -> ((s, dir) =>
      TA.boilerplateStats(t(s, dir, "documents"), n = 3, minDf = 4)
        .orderBy("doc_id")),

    // PII scrub / redaction: count and mask emails, URLs and phone
    // numbers. The synthetic corpus has no PII, so the query first
    // appends a deterministic contact line derived from doc_id (same
    // expression on the oracle side) — the scrub then has real matches
    // to find. Counts + md5 of the masked text prove the masking is
    // byte-identical across engines. Narrow map-only stage at 100 TB.
    "q64_pii_scrub" -> ((s, dir) => {
      val contact = concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or https://ex.org/p/"), col("doc_id").cast("string"),
        when(pmod(col("doc_id"), lit(3L)) === 0L,
          concat(lit(" call +1 555-"),
                 lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
          .otherwise(lit("")))
      t(s, dir, "documents")
        .select(col("doc_id"), contact.as("pii_text"))
        .select(col("doc_id"),
          TA.matchCount(col("pii_text"), TA.emailRe).as("n_emails"),
          TA.matchCount(col("pii_text"), TA.urlRe).as("n_urls"),
          TA.matchCount(col("pii_text"), TA.phoneRe).as("n_phones"),
          md5(TA.scrubPii(col("pii_text"))).as("masked_md5"),
          length(TA.scrubPii(col("pii_text"))).cast("long").as("masked_len"))
        .orderBy("doc_id")
    }),

    // Deterministic pre-training shuffle + sequence packing: order by a
    // multiplicative hash (Knuth constant; at 100 TB use xxhash64 — kept
    // SQL-expressible here so the oracle can mirror it), shard by the
    // hash, then greedily pack docs into PackBudget-token sequences via a
    // per-shard running token sum. Per-shard windows are the scale story:
    // packing parallelizes over shards, no global ordering bottleneck.
    "q57_sequence_pack" -> ((s, dir) => {
      val h = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
      val d = t(s, dir, "documents")
        .select(col("doc_id"), size(TA.wsTokens(col("text"))).cast("long").as("n_toks"))
        .withColumn("h", h)
        .withColumn("shard", pmod(col("h"), lit(PackShards)))
      val w = Window.partitionBy(col("shard")).orderBy(col("h").asc, col("doc_id").asc)
      d.withColumn("cum", sum(col("n_toks")).over(w))
        // bin by the sequence's starting token offset → greedy packing
        .withColumn("seq_id", expr(s"(cum - n_toks) div $PackBudget"))
        .groupBy(col("shard"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("toks"))
        .orderBy("shard", "seq_id")
    }),

    // Streaming curation, batch-replay oracle: run the REAL streaming
    // path (file source → watermark dedup → curation gates → keyed
    // idempotent snapshot sink, AvailableNow trigger) and compare its
    // snapshot against the batch curation SQL of the same input — the
    // unified-API claim, hash-gated instead of spec-only. Output keyed
    // on the content digest (the snapshot's key; deterministic columns
    // only — bookkeeping timestamps dropped).
    //
    // The comparison is restricted to digests whose duplicate group is
    // GATE-UNIFORM (every copy's lang passes, or none does): the stream
    // dedups BEFORE the lang gate — deliberately, so duplicates never
    // pay curation — which makes the decision for a lang-heterogeneous
    // duplicate group depend on which copy arrived first. That is real,
    // documented pipeline behavior, not an oracle target (at sf0.1 two
    // duplicate groups mix a kept and a gated lang). Text-derived gates
    // (length, repetition) are digest-uniform by construction.
    "q85_stream_curate" -> ((s, dir) => {
      import graft.streaming.DocsStream
      val uniform = t(s, dir, "documents")
        .groupBy(md5(col("text")).as("digest"))
        .agg(min(when(col("lang").isin(DocsStream.KeepLangs: _*), 1)
          .otherwise(0)).as("all_keep"))
        .filter(col("all_keep") === 1)
        .select("digest")
      DocsStream.replayDocuments(s, dir)
        .join(uniform, Seq("digest"), "left_semi")
        .select(col("digest"), col("n_toks"), col("rep_ratio"), col("text"))
        .orderBy("digest")
    }),

    // Training-export manifest, PORTABLE-hash twin (q74 pattern): the
    // same shard-assign + per-shard (count, order-insensitive digest)
    // aggregation that TrainingExport.exportJsonl collects as its
    // control-plane manifest, left distributed and oracle-mirrored via
    // the polynomial char fold (production shards/digests stay on
    // xxhash64 — TrainingExportSpec pins the two paths to one code
    // path). ONE exchange on shard; digests sum in decimal so any
    // partial-aggregation tree agrees.
    "q93_export_manifest" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val assigned = TrainingExport.assignShardsBy(
        docs, ExportShards, polyFold(col("text"), 131L, 1000000007L))
      TrainingExport.manifestOf(assigned, polyFold(col("text"), 137L, 998244353L))
    }),

    // EXACT heavy hitters over the event stream via Misra–Gries
    // candidates + exact verify: the sketch's one-sided guarantee
    // (no false negatives above n/k) makes the ≤ k−1 candidate re-count
    // provably equal to the exact groupBy-everything answer, while the
    // only full-width pass keeps k-bounded state per partition. At
    // sf0.1 the 1500 distinct users exceed the 1024 counters, so the
    // decrement path genuinely runs (the near-uniform fixture leaves
    // many users just over the n/k line — CORRECTNESS_r05 recorded 150
    // over-threshold rows; SketchesSpec covers the skewed regime).
    "q94_heavy_hitters" -> ((s, dir) => {
      val keys = t(s, dir, "events").select(col("user_id").cast("string").as("k"))
      Dedup.withPersisted(keys) { ks =>
        Sketches.heavyHitters(ks, "k", HeavyK)
          .select(col("k").cast("long").as("user_id"), col("cnt"))
          .orderBy(col("cnt").desc, col("user_id"))
      }
    }),

    // Two-sample Kolmogorov–Smirnov drift check between the even/odd
    // doc_id halves of the corpus on the n_chars metric — the
    // distribution-shift monitor a pipeline runs between snapshots.
    // All integer arithmetic: the KS statistic is reported as the
    // numerator max|cumA·nB − cumB·nA| over the common denominator
    // nA·nB (no float ECDF division to drift by ulps). Scale shape:
    // one groupBy on the metric VALUE (bounded cardinality — bin wide
    // metrics first), so the single-partition prefix-sum window runs
    // over #distinct-values rows, not corpus rows.
    "q96_ks_drift" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Analytics.ksDrift(
        t(s, dir, "documents").select($"doc_id", $"n_chars"),
        "n_chars", $"doc_id" % 2 === 0)
    }),

    // Robust outlier detection: |x − median| > 2·MAD, with median and
    // MAD both NEAREST-RANK order statistics (smallest value whose
    // cumulative count reaches (n+1) div 2) — integer end-to-end, no
    // engine-specific interpolation. Same bounded-window shape as q96:
    // both rank scans (Analytics.rankMinValue) group by the metric
    // VALUE first, so the ordered prefix sums run over metric
    // cardinality — and fail loudly past the maxDistinct guard instead
    // of single-reducer-scanning an unbinned domain; n / median / MAD
    // each ride as 1-row broadcasts; the 2-col base relation is
    // persisted across its four consumers.
    "q105_robust_outliers" -> ((s, dir) => {
      import s.implicits._
      Dedup.withPersisted(
        t(s, dir, "documents").select($"doc_id", $"n_chars")) { d =>
        def rankMin(rows: org.apache.spark.sql.DataFrame, c: String,
                    nRow: org.apache.spark.sql.DataFrame, out: String) =
          graft.operators.Analytics.rankMinValue(rows, c, nRow, out)
        val nRow = d.agg(count(lit(1)).as("n"))
        val medRow = rankMin(d, "n_chars", nRow, "med")
        val dev = d.crossJoin(broadcast(medRow))
          .withColumn("dev", abs($"n_chars" - $"med"))
        val madRow = rankMin(dev, "dev", nRow, "mad")
        dev.crossJoin(broadcast(madRow))
          .filter($"dev" > $"mad" * MadK)
          .select($"doc_id", $"n_chars", $"dev", $"med", $"mad")
          .orderBy("doc_id")
      }
    })
  )

  val oracle: Map[String, String] = Map(
    "q54_decontaminate" ->
      s"""WITH ${Ext.shingleCte},
          bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0)
          SELECT sh.doc_id AS doc_id, COUNT(*) AS bench_hits
          FROM sh JOIN bench ON sh.shingle = bench.shingle
          WHERE sh.doc_id % 20 <> 0
          GROUP BY sh.doc_id HAVING COUNT(*) >= $ContaminationHits
          ORDER BY doc_id""",

    "q55_stratified_sample" ->
      // CAST the integer SUM: DuckDB promotes SUM(BIGINT) to HUGEINT, and
      // the driver-side pandas fetch renders HUGEINT as float (5000000.0),
      // which hash-mismatches Spark's long even though values are equal.
      """SELECT lang, COUNT(*) AS kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
         FROM (SELECT *, CASE WHEN lang = 'en' THEN 50
                              WHEN lang = 'es' THEN 25 ELSE 10 END AS rate
               FROM documents)
         WHERE doc_id % 100 < rate
         GROUP BY lang ORDER BY lang""",

    "q56_quality_percentile" ->
      """SELECT source, COUNT(*) AS kept, MIN(n_chars) AS cutoff_chars
         FROM (SELECT *, NTILE(10) OVER (PARTITION BY source
                                         ORDER BY n_chars DESC, doc_id ASC) AS decile
               FROM documents)
         WHERE decile <= 3
         GROUP BY source ORDER BY source""",

    "q62_repetition" ->
      """WITH toks AS (
           SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tokens
           FROM documents),
         g AS (
           SELECT doc_id,
                  CASE WHEN len(tokens) >= 3
                       THEN list_transform(range(1, len(tokens)-1),
                              i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
                       ELSE CAST([] AS VARCHAR[]) END AS grams
           FROM toks)
         SELECT doc_id,
                CAST(len(grams) AS BIGINT) AS total_grams,
                CAST(len(list_distinct(grams)) AS BIGINT) AS distinct_grams,
                CASE WHEN len(grams) > 0
                     THEN ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                                  / len(grams), 6) END AS rep_ratio
         FROM g ORDER BY doc_id""",

    "q59_exact_quantiles" ->
      """WITH ranked AS (
           SELECT source, n_chars,
                  ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n_chars ASC, doc_id ASC) AS rn,
                  COUNT(*) OVER (PARTITION BY source) AS n
           FROM documents)
         SELECT source,
                MAX(CASE WHEN rn = LEAST(GREATEST(CAST(CEIL(0.5 * n) AS BIGINT), 1), n)
                         THEN n_chars END) AS p50,
                MAX(CASE WHEN rn = LEAST(GREATEST(CAST(CEIL(0.9 * n) AS BIGINT), 1), n)
                         THEN n_chars END) AS p90,
                MAX(CASE WHEN rn = LEAST(GREATEST(CAST(CEIL(0.99 * n) AS BIGINT), 1), n)
                         THEN n_chars END) AS p99,
                MAX(n) AS n_docs
         FROM ranked GROUP BY source ORDER BY source""",

    // The output is order-insensitive (per-source counts), so the oracle
    // verifies the quota arithmetic and that the window sampling yields
    // exactly min(quota, pool) rows — without needing xxhash64 row order.
    "q69_domain_mix" ->
      s"""WITH wts AS (
            SELECT source, COUNT(*) AS cnt,
                   CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS w
            FROM documents GROUP BY source),
          tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM wts)
          SELECT source,
                 LEAST((w * $MixBudget) // tw, cnt) AS sampled,
                 cnt AS pool,
                 (w * $MixBudget) // tw AS quota
          FROM wts, tot ORDER BY source""",

    // Same result set as q54 — the bloom prefilter must be invisible in
    // the output (false positives verified away, no false negatives).
    "q67_bloom_decontaminate" ->
      s"""WITH ${Ext.shingleCte},
          bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0)
          SELECT sh.doc_id AS doc_id, COUNT(*) AS bench_hits
          FROM sh JOIN bench ON sh.shingle = bench.shingle
          WHERE sh.doc_id % 20 <> 0
          GROUP BY sh.doc_id HAVING COUNT(*) >= $ContaminationHits
          ORDER BY doc_id""",

    "q65_chunk_docs" ->
      s"""WITH toks AS (
            SELECT doc_id, regexp_extract_all(text, '\\S+') AS tokens,
                   CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n
            FROM documents),
          c AS (
            SELECT doc_id, tokens, n,
                   UNNEST(range(0, CASE WHEN n <= $ChunkTokens THEN 1
                                        ELSE (n - $ChunkTokens + ${ChunkStride - 1}) // $ChunkStride + 1
                                   END)) AS chunk_id
            FROM toks)
          SELECT doc_id, chunk_id,
                 LEAST($ChunkTokens, n - chunk_id * $ChunkStride) AS chunk_toks,
                 md5(array_to_string(list_slice(tokens,
                       chunk_id * $ChunkStride + 1,
                       chunk_id * $ChunkStride + LEAST($ChunkTokens, n - chunk_id * $ChunkStride)),
                     ' ')) AS chunk_md5
          FROM c ORDER BY doc_id, chunk_id""",

    "q66_unigram_quality" ->
      s"""WITH tk AS (
            SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
            FROM documents),
          vocab AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok)
          SELECT doc_id, COUNT(*) AS n_toks,
                 CAST(SUM(cnt) AS BIGINT) AS cnt_sum,
                 CAST(SUM(CASE WHEN cnt <= $RareMax THEN 1 ELSE 0 END) AS BIGINT) AS rare_hits,
                 CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_cnt,
                 CAST(CAST(SUM(CASE WHEN cnt <= $RareMax THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS rare_ratio
          FROM tk JOIN vocab USING (tok)
          GROUP BY doc_id ORDER BY doc_id""",

    "q72_bigram_quality" ->
      s"""WITH toked AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
                  len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n
           FROM documents),
         bg AS (
           SELECT doc_id, UNNEST(CASE WHEN n >= 2
                    THEN list_transform(range(1, n), i ->
                           {'w1': toks[i], 'w2': toks[i+1]})
                    ELSE [] END, recursive := true)
           FROM toked),
         c_bg AS (SELECT w1, w2, COUNT(*) AS c_bg FROM bg GROUP BY 1, 2),
         c_head AS (SELECT w1, COUNT(*) AS c_head FROM bg GROUP BY 1)
         SELECT doc_id, COUNT(*) AS n_bigrams,
                CAST(CAST(SUM((c_bg * $BigramScale) // c_head) AS BIGINT) AS DOUBLE)
                  / CAST(COUNT(*) * $BigramScale AS DOUBLE) AS mean_p
         FROM bg JOIN c_bg USING (w1, w2) JOIN c_head USING (w1)
         GROUP BY doc_id ORDER BY doc_id""",

    "q115_snapshot_diff" -> {
      // mirror of Merge.snapshotDiff's injective length-prefix encoding
      def e(x: String) =
        s"CASE WHEN $x IS NULL THEN 'n' ELSE 'v' || CAST(length($x) AS VARCHAR) || ':' || $x END"
      val enc = s"md5(${e("text")} || ${e("lang")} || ${e("source")} || " +
        s"${e("CAST(n_chars AS VARCHAR)")})"
      s"""WITH prev AS (
            SELECT doc_id, $enc AS digest FROM documents WHERE doc_id % 11 <> 0),
          cur0 AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 17 = 0 THEN text || ' v2' ELSE text END AS text,
                   lang, source, n_chars
            FROM documents WHERE doc_id % 13 <> 0),
          cur AS (SELECT doc_id, $enc AS digest FROM cur0)
          SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
                 CASE WHEN p.digest IS NULL THEN 'added'
                      WHEN c.digest IS NULL THEN 'removed'
                      WHEN p.digest <> c.digest THEN 'changed' END AS change
          FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id
          WHERE p.digest IS NULL OR c.digest IS NULL OR p.digest <> c.digest
          ORDER BY doc_id"""
    },

    "q112_curriculum_rank" ->
      """SELECT doc_id, n_chars AS w,
                ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rank
         FROM documents ORDER BY rank""",

    "q110_weighted_sample" ->
      """WITH c AS (SELECT source, doc_id, n_chars AS w,
                           SUM(n_chars) OVER (PARTITION BY source
                                              ORDER BY doc_id) AS cum,
                           SUM(n_chars) OVER (PARTITION BY source) AS tot
                    FROM documents)
         SELECT source, doc_id, CAST(w AS BIGINT) AS w,
                CAST((cum * 40) // tot AS BIGINT) AS pick
         FROM c
         WHERE (cum * 40) // tot > ((cum - w) * 40) // tot
         ORDER BY source, doc_id""",

    "q108_boilerplate" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tokens
                       FROM documents),
         g AS (SELECT doc_id, UNNEST(CASE WHEN len(tokens) >= 3
                  THEN list_transform(range(1, len(tokens)-1), i ->
                         concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
                  ELSE CAST([] AS VARCHAR[]) END) AS gram FROM toks),
         d AS (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY 1)
         SELECT doc_id, COUNT(*) AS n_grams,
                COUNT(*) FILTER (WHERE df >= 4) AS boiler_grams
         FROM g JOIN d USING (gram)
         GROUP BY doc_id ORDER BY doc_id""",

    "q64_pii_scrub" -> {
      val masked = s"regexp_replace(regexp_replace(regexp_replace(pii_text, " +
        s"'${TA.emailRe}', '<EMAIL>', 'g'), '${TA.urlRe}', '<URL>', 'g'), " +
        s"'${TA.phoneRe}', '<PHONE>', 'g')"
      s"""WITH pii AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR) ||
                   '@example.com or https://ex.org/p/' || CAST(doc_id AS VARCHAR) ||
                   CASE WHEN doc_id % 3 = 0
                        THEN ' call +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        ELSE '' END AS pii_text
            FROM documents)
          SELECT doc_id,
                 CAST(len(regexp_extract_all(pii_text, '${TA.emailRe}')) AS BIGINT) AS n_emails,
                 CAST(len(regexp_extract_all(pii_text, '${TA.urlRe}')) AS BIGINT) AS n_urls,
                 CAST(len(regexp_extract_all(pii_text, '${TA.phoneRe}')) AS BIGINT) AS n_phones,
                 md5($masked) AS masked_md5,
                 CAST(length($masked) AS BIGINT) AS masked_len
          FROM pii ORDER BY doc_id"""
    },

    "q57_sequence_pack" ->
      s"""WITH d AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_toks,
                   (doc_id * 2654435761) % 4294967296 AS h
            FROM documents),
          sharded AS (SELECT *, h % $PackShards AS shard FROM d),
          packed AS (
            SELECT shard,
                   CAST(SUM(n_toks) OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum,
                   n_toks
            FROM sharded)
          SELECT shard, (cum - n_toks) // $PackBudget AS seq_id,
                 COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS toks
          FROM packed GROUP BY 1, 2 ORDER BY shard, seq_id""",

    // Batch mirror of the streaming curation pipeline (q85): same digest,
    // token accounting, 3-gram repetition ratio, gates and PII scrub as
    // DocsStream.curate — constants referenced from DocsStream so engine
    // and oracle cannot drift. DISTINCT plays the role of the stream's
    // digest-keyed dedup+upsert (exact dups collapse to one row).
    "q85_stream_curate" -> {
      import graft.streaming.DocsStream.{KeepLangs, MaxRepRatio, MaxTokens, MinTokens}
      val langs = KeepLangs.map(l => s"'$l'").mkString(", ")
      val scrub = s"regexp_replace(regexp_replace(regexp_replace(text, " +
        s"'${TA.emailRe}', '<EMAIL>', 'g'), '${TA.urlRe}', '<URL>', 'g'), " +
        s"'${TA.phoneRe}', '<PHONE>', 'g')"
      s"""WITH toks AS (
            SELECT md5(text) AS digest, lang, text,
                   regexp_extract_all(lower(text), '\\S+') AS tk
            FROM documents),
          grams AS (
            SELECT *, CASE WHEN len(tk) >= 3
                           THEN list_transform(range(1, len(tk)-1),
                                  i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
                           ELSE CAST([] AS VARCHAR[]) END AS g
            FROM toks),
          scored AS (
            SELECT digest, lang,
                   CAST(len(tk) AS BIGINT) AS n_toks,
                   CASE WHEN len(g) > 0
                        THEN CAST(1.0 AS DOUBLE)
                             - CAST(len(list_distinct(g)) AS DOUBLE)
                               / CAST(len(g) AS DOUBLE)
                        ELSE CAST(0.0 AS DOUBLE) END AS rep_ratio,
                   $scrub AS text
            FROM grams)
          SELECT DISTINCT digest, n_toks, rep_ratio, text
          FROM scored
          WHERE n_toks BETWEEN $MinTokens AND $MaxTokens
            AND lang IN ($langs)
            AND rep_ratio <= $MaxRepRatio
            AND digest IN (SELECT digest FROM toks GROUP BY digest
                           HAVING COUNT(*) = COUNT(CASE WHEN lang IN ($langs)
                                                        THEN 1 END))
          ORDER BY digest"""
    },

    "q93_export_manifest" -> {
      def fold(b: Long, p: Long) =
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
            (a, c) -> (a * $b + c) % $p)"""
      s"""WITH h AS (SELECT ${fold(131L, 1000000007L)} AS h1,
                            ${fold(137L, 998244353L)} AS h2
                     FROM documents)
          SELECT h1 % $ExportShards AS shard, COUNT(*) AS n_rows,
                 CAST(SUM(h2 % ${TrainingExport.HashP}) % ${TrainingExport.HashP}
                      AS BIGINT) AS content_hash
          FROM h GROUP BY 1 ORDER BY shard"""
    },

    "q94_heavy_hitters" ->
      s"""WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
          t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c)
          SELECT user_id, cnt FROM c, t
          WHERE cnt * $HeavyK > n
          ORDER BY cnt DESC, user_id""",

    "q96_ks_drift" ->
      """WITH g AS (SELECT n_chars, COUNT(*) AS cnt,
                           SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS ca
                    FROM documents GROUP BY n_chars),
          c AS (SELECT SUM(ca) OVER (ORDER BY n_chars) AS cuma,
                       SUM(cnt - ca) OVER (ORDER BY n_chars) AS cumb
                FROM g),
          t AS (SELECT SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
                       SUM(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS n_b
                FROM documents)
          SELECT CAST(MAX(ABS(cuma * n_b - cumb * n_a)) AS BIGINT) AS ks_num,
                 CAST(MAX(n_a) AS BIGINT) AS n_a,
                 CAST(MAX(n_b) AS BIGINT) AS n_b
          FROM c, t""",

    "q105_robust_outliers" ->
      s"""WITH n AS (SELECT COUNT(*) AS n FROM documents),
          gv AS (SELECT n_chars AS v, COUNT(*) AS gc FROM documents GROUP BY 1),
          cv AS (SELECT v, SUM(gc) OVER (ORDER BY v) AS cum FROM gv),
          med AS (SELECT MIN(v) AS med FROM cv, n WHERE cum >= (n + 1) // 2),
          dev AS (SELECT doc_id, n_chars, ABS(n_chars - med) AS dev, med
                  FROM documents, med),
          gd AS (SELECT dev AS v, COUNT(*) AS gc FROM dev GROUP BY 1),
          cd AS (SELECT v, SUM(gc) OVER (ORDER BY v) AS cum FROM gd),
          mad AS (SELECT MIN(v) AS mad FROM cd, n WHERE cum >= (n + 1) // 2)
          SELECT doc_id, n_chars, CAST(dev AS BIGINT) AS dev,
                 CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad
          FROM dev, mad
          WHERE dev > mad * $MadK
          ORDER BY doc_id"""
  )
}
