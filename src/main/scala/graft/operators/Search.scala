package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text search primitives over the documents table: inverted-index
  * build and BM25 ranking. These are the index-construction and
  * relevance-scoring stages a corpus pipeline runs before serving search
  * (and that data-curation uses for query-based decontamination audits).
  *
  * Scale shape: everything is one `groupBy(term)` / `groupBy(doc)`
  * shuffle over the tokenized corpus with map-side partial aggregation;
  * per-term document frequencies are tiny (vocabulary-sized) and
  * broadcast back. Nothing materializes an all-docs × all-terms matrix.
  */
object Search {

  /** Per-(doc, term) term frequency. Tokenization matches
    * [[TextAnalysis.wordTokens]] so index and scorers agree with the
    * text-quality operators on what a "term" is. */
  def termFreqs(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
                explode(TextAnalysis.wordTokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Max postings materialized in one index row. Bounds the size of every
    * collect_list aggregation buffer and every output cell: without it, a
    * stop term's single row would concatenate the doc-id list of the
    * whole corpus — a multi-GB cell built in one aggregation buffer at
    * 100 TB. */
  val DefaultMaxPostingsPerShard = 128L

  /** Inverted index, SHARDED: one row per (term, shard) with the term's
    * total document frequency, the shard's population, and a canonical
    * posting string `"doc:tf doc:tf ..."` ordered by doc id. Shards are
    * deterministic and contiguous in doc-id order — shard s holds ranks
    * [s·maxPerShard, (s+1)·maxPerShard) of the term's postings — so a
    * reader streams a term's full list by scanning its shards in order,
    * and EVERY row holds ≤ `maxPerShard` postings (exact bound, not
    * probabilistic).
    *
    * Postings are emitted as a canonical STRING rather than an
    * array<struct> so the row stays a scalar for any downstream engine
    * (and the oracle compare).
    *
    * Scale shape: one term-keyed window pass assigns ranks (sort-based
    * and spill-safe — a stop term costs one partition's external sort,
    * never an unbounded in-memory buffer), then the (term, shard) groupBy
    * builds bounded posting rows; a stop term's list construction spreads
    * over df/maxPerShard reducers instead of one. */
  def invertedIndex(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    maxPerShard: Long = DefaultMaxPostingsPerShard): DataFrame = {
    require(maxPerShard > 0, "invertedIndex: maxPerShard must be positive")
    val byTerm = Window.partitionBy(col("term"))
    val ranked = termFreqs(docs, idCol, textCol)
      .withColumn("doc_freq", count(lit(1)).over(byTerm))
      .withColumn("rn", row_number().over(byTerm.orderBy(col("doc_id"))))
      // exact double division then truncate: rn ≤ df < 2^52 so the
      // quotient is exact; floor keeps it an integer division mirror
      .withColumn("shard", floor((col("rn") - 1) / lit(maxPerShard)).cast("long"))
    ranked
      .groupBy(col("term"), col("shard"), col("doc_freq"))
      .agg(count(lit(1)).as("shard_size"),
           array_join(
             transform(
               sort_array(collect_list(struct(col("doc_id"), col("tf")))),
               e => concat(e("doc_id").cast("string"), lit(":"),
                           e("tf").cast("string"))),
             " ").as("postings"))
      .select(col("term"), col("shard"), col("doc_freq"),
              col("shard_size"), col("postings"))
  }

  /** Okapi BM25 scores for a fixed bag of query `terms`, top-`k` docs.
    *
    * Determinism contract (oracle hash-compare): the per-term partial
    * scores are pivoted into fixed columns and added in query-term order
    * — never `SUM`ed over a term group, whose addition order differs
    * between engines. Every arithmetic step (one division for dl/avgdl,
    * one for the saturation quotient, one `ln`) appears in the same order
    * in the SQL mirror; the final score is rounded to 6 decimals like
    * q50's tf-idf. Ranking ties break on doc_id.
    *
    * Scale shape: the corpus-wide stats are two scalar aggregates
    * (broadcast), the term filter prunes the tokenized relation BEFORE
    * its groupBy, and the pivot means the shuffle carries ≤ |terms|
    * values per doc. */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int = 20,
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "bm25 of zero query terms")
    val toks0 = docs.select(col(idCol).as("doc_id"),
                            TextAnalysis.wordTokens(col(textCol)).as("toks"))
    // The tokenized relation feeds three consumers (lengths/stats, term
    // freqs, and lens again on the scored join) — persist it for the
    // duration so the corpus-wide regexp tokenization runs ONCE, not per
    // consumer (the multi-consumer re-execution pitfall).
    Dedup.withPersisted(toks0) { toks =>
    val lens = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    // corpus stats: exact integer sums, one double division at the end
    val stats = broadcast(
      lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("dl_sum")))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*)) // prune before the shuffle
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = broadcast(tf.groupBy("term").agg(count(lit(1)).as("df")))
    val scored = tf.join(dfreq, "term")
      .join(lens, "doc_id").crossJoin(stats)
      .withColumn("avgdl", col("dl_sum").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
                       (col("df").cast("double") + lit(0.5))))
      .withColumn("part_score",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
           lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl")))))
    // Pivot to fixed columns, add in term order: deterministic fold.
    val partCols = terms.zipWithIndex.map { case (t, i) =>
      coalesce(max(when(col("term") === t, col("part_score"))), lit(0.0)).as(s"_s$i")
    }
    val pivoted = scored.groupBy("doc_id").agg(partCols.head, partCols.tail: _*)
    val total = terms.indices.map(i => col(s"_s$i")).reduceLeft(_ + _)
    // Top-k via orderBy+limit (TakeOrderedAndProject — distributed, no
    // single-partition global window); rank assignment then windows over
    // only the k survivors.
    val top = pivoted.withColumn("score", round(total, 6))
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
    // CAUTION: unpartitioned Window = one partition — safe ONLY because
    // it runs over the ≤ k rows that survived the limit above. Never
    // lift this rank assignment above the limit.
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("score"))
    }
  }
}
