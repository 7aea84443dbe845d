package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Search

/** Search surface: inverted-index build + BM25 relevance ranking over
  * the documents corpus. Oracle SQL is generated from the same constants
  * as the Spark side (query terms, k1, b) so scorer parameters cannot
  * drift between engine and oracle.
  */
object SearchQ {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  private val QueryTerms = Seq("spark", "hash", "join")
  private val K1 = 1.2
  private val B = 0.75
  private val TopK = 20

  val queries: Map[String, Q] = Map(
    // Sharded inverted index: (term, shard) → doc_freq, shard_size +
    // canonical "doc:tf" posting string, ≤ maxPerShard postings per row
    // (exact bound — no stop-term row ever concatenates the corpus).
    // collect_list order is canonicalized by sort_array before any
    // output depends on it.
    "q76_inverted_index" -> ((s, dir) => {
      Search.invertedIndex(t(s, dir, "documents")).orderBy("term", "shard")
    }),

    // Okapi BM25 top-20 for a fixed query-term bag. Per-term partials
    // pivot into fixed columns summed in term order (never a float SUM
    // across a group); one ln per (doc, term); top-k via
    // TakeOrderedAndProject, not a global window.
    "q77_bm25" -> ((s, dir) => {
      Search.bm25(t(s, dir, "documents"), QueryTerms, k = TopK, k1 = K1, b = B)
        .orderBy("rank")
    })
  )

  private val tokCte =
    """tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents)"""

  val oracle: Map[String, String] = Map(
    // Mirrors Search.invertedIndex's rank-contiguous sharding: same
    // window rank, same integer division by the same (referenced)
    // constant — shard boundaries cannot drift between engines.
    "q76_inverted_index" ->
      s"""WITH $tokCte,
          tf AS (SELECT doc_id, term, COUNT(*) AS tf
                 FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
                 GROUP BY 1, 2),
          ranked AS (SELECT doc_id, term, tf,
                            CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT)
                              AS doc_freq,
                            ROW_NUMBER() OVER (PARTITION BY term
                                               ORDER BY doc_id) AS rn
                     FROM tf)
          SELECT term, CAST((rn - 1) // ${Search.DefaultMaxPostingsPerShard}
                            AS BIGINT) AS shard,
                 doc_freq, CAST(COUNT(*) AS BIGINT) AS shard_size,
                 string_agg(doc_id || ':' || tf, ' ' ORDER BY doc_id) AS postings
          FROM ranked
          GROUP BY term, shard, doc_freq
          ORDER BY term, shard""",

    // Expression-tree mirror of Search.bm25: identical operand order for
    // every +, /, * and the single ln — IEEE ops on identical inputs are
    // bit-identical, so even the unrounded partials agree; rounding to 6
    // then matches exactly.
    "q77_bm25" -> {
      val inList = QueryTerms.map(q => s"'$q'").mkString(", ")
      val pivots = QueryTerms.zipWithIndex.map { case (q, i) =>
        s"COALESCE(MAX(CASE WHEN term = '$q' THEN part_score END), 0.0) AS s$i"
      }.mkString(",\n                 ")
      val total = QueryTerms.indices.map(i => s"s$i").mkString(" + ")
      s"""WITH $tokCte,
          lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok),
          stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS dl_sum
                    FROM lens),
          tf AS (SELECT doc_id, term, COUNT(*) AS tf
                 FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
                 WHERE term IN ($inList) GROUP BY 1, 2),
          dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
          scored AS (
            SELECT t.doc_id, t.term,
                   ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
                            (CAST(df AS DOUBLE) + 0.5))
                   * (CAST(t.tf AS DOUBLE) * ${K1 + 1.0})
                   / (CAST(t.tf AS DOUBLE) +
                      $K1 * (${1.0 - B} + $B * (CAST(dl AS DOUBLE) /
                             (CAST(dl_sum AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
                     AS part_score
            FROM tf t JOIN dfreq USING (term) JOIN lens USING (doc_id)
            CROSS JOIN stats),
          piv AS (SELECT doc_id,
                 $pivots
                 FROM scored GROUP BY doc_id),
          ranked AS (SELECT doc_id, ROUND($total, 6) AS score FROM piv)
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT)
                   AS rank, doc_id, score
          FROM ranked ORDER BY score DESC, doc_id ASC LIMIT $TopK"""
    }
  )
}
