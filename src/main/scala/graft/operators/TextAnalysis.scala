package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, built entirely
  * from codegen'd `org.apache.spark.sql.functions` (no UDFs): tokenizers,
  * quality signals, a stopword-profile language guesser and a rolling-hash
  * fingerprint. All are per-row narrow transforms — they scale linearly
  * and never shuffle on their own — except [[boilerplateStats]], the one
  * corpus-level pass (its shuffles are documented on the method).
  */
object TextAnalysis {

  /** Whitespace tokens (raw). */
  def wsTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  /** Lowercased word tokens for dedup/language work. */
  def wordTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** BPE-ish pre-tokenizer: letter runs, single digits, single symbols. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))

  /** Count of tokens present in `words` (small in-filter, codegen'd). */
  def hitCount(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words: _*))).cast("long")

  /** Number of punctuation characters. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", "")).cast("long")

  /** Sum of token lengths (exact integer arithmetic). */
  def tokenLenSum(tokens: Column): Column =
    aggregate(transform(tokens, t => length(t).cast("long")), lit(0L), (a, v) => a + v)

  // Tiny per-language stopword profiles. Shared with the DuckDB oracle SQL
  // (graft.queries.Ext builds the SQL from these same lists).
  val stopEn = Seq("the", "and", "of", "to", "in", "is", "it", "that", "a")
  val stopEs = Seq("el", "la", "de", "que", "y", "en", "los", "del", "una")
  val stopDe = Seq("der", "die", "und", "das", "von", "mit", "ist", "nicht")
  val stopFr = Seq("le", "les", "des", "et", "un", "une", "dans", "est")

  /** Language guess = argmax of stopword hits (ties resolve en>es>de>fr,
    * all-zero → "unknown"). Pure case-ladder, mirrored in oracle SQL. */
  def langGuess(en: Column, es: Column, de: Column, fr: Column): Column =
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("unknown")

  /** Single-character array of `text` — feed to [[charTrigrams]].
    * The slice bounds the split output to exactly length(text) elements
    * (regex-split trailing-empty behavior varies). */
  def charArray(text: Column): Column =
    slice(split(text, ""), lit(1), length(text))

  /** All character trigrams over a MATERIALIZED char-array column
    * ([[charArray]] in its own projection first — see [[Dedup.shingles]]
    * for the HOF re-eval pitfall). Windows come from array slices, not
    * `substr`: substring-at-position on a UTF8 string is O(position)
    * (codepoint scan from the start), which makes windowed substr
    * quadratic per row — measured 5× slower on 300-char docs. Guarded:
    * Spark's sequence(start, stop) DESCENDS when stop < start, so short
    * texts must short-circuit to an empty array. */
  def charTrigrams(chars: Column): Column =
    when(size(chars) >= 3,
      transform(sequence(lit(1), size(chars) - 2),
        i => concat_ws("", slice(chars, i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  // Tiny per-language character-trigram profiles (with spaces — the
  // strongest character-level language signal). Shared with the oracle.
  val triEn = Seq("the", "he ", " th", "ing", "and", " an", "ion", " of")
  val triEs = Seq(" de", "de ", " la", "la ", "os ", "ent", " el", "ue ")
  val triDe = Seq("der", "ie ", " di", "ein", "ich", "sch", "und", " un")
  val triFr = Seq(" le", "les", "ent", " et", "que", " qu", "ais", "eur")

  /** Trigram-profile hits computed as substring-occurrence counts:
    * Σ_w (length(t) - length(replace(t, w))) / 3 — pure string ops, no
    * per-position array/string materialization, so it runs ~8× faster
    * than [[charTrigrams]]+[[hitCount]] (measured at sf0.1).
    *
    * Equal to the positional-trigram count iff no pattern can match at
    * overlapping positions, i.e. no pattern has period 1 or 2 ("aaa",
    * "aba"): `replace` consumes non-overlapping matches left-to-right,
    * and for non-self-overlapping patterns every positional match is a
    * non-overlapping one. Enforced here so a future profile edit can't
    * silently break the equivalence (TrigramHitsSpec proves equality
    * against [[charTrigrams]] on the fixture corpus + random strings). */
  def trigramHits(text: Column, trigrams: Seq[String]): Column = {
    require(trigrams.forall(w => w.length == 3 &&
      w(0) != w(2)), // period 2 (incl. period 1) ⇔ w[0]==w[2] for length 3
      s"self-overlapping trigram in profile: ${trigrams.mkString(",")}")
    (trigrams.map { w =>
      length(text) - length(replace(text, lit(w), lit("")))
    }.reduce(_ + _) / lit(3)).cast("long")
  }

  // PII scrubbing — the pre-training redaction pass. Patterns are kept in
  // the portable regex subset (no backrefs, no lookaround) so the Java
  // regex engine (Spark) and RE2 (DuckDB oracle) match identically.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[A-Za-z0-9./_%-]+"
  val phoneRe = "\\+?[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{4}"

  /** Count of matches of `re` in `text`. */
  def matchCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Redact emails, then URLs, then phones (order matters only in that a
    * placeholder must not re-match a later pattern — these don't).
    * Per-row narrow transform: at 100 TB this is a map-only stage. */
  def scrubPii(text: Column): Column = {
    val e = regexp_replace(text, emailRe, "<EMAIL>")
    val u = regexp_replace(e, urlRe, "<URL>")
    regexp_replace(u, phoneRe, "<PHONE>")
  }

  /** Corpus-level boilerplate detection (the C4/RefinedWeb repeated-span
    * rule): an n-gram OCCURRING in ≥ minDf distinct docs is boilerplate —
    * navboxes, license headers, templated spans — and each doc is scored
    * by how much of it is made of such spans. Output: (doc_id, n_grams,
    * boiler_grams) — occurrence counts, NOT distinct grams, because the
    * scrub decision weighs repeated spans by how much of the doc they
    * cover; docs shorter than n tokens have no grams and drop out (both
    * engines alike).
    *
    * Plan at 100 TB: grams explode map-side; the per-gram df aggregation
    * and the join back to occurrences share the gram shuffle key (one
    * exchange feeds both — AQE reuses it), then one doc_id shuffle for
    * the final rollup. The gram relation is persisted across its two
    * consumers ([[Dedup.withPersisted]] lifecycle) so the tokenize +
    * explode runs once. No driver-side state at any size. */
  def boilerplateStats(docs: DataFrame, n: Int = 3, minDf: Long = 4,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = wsTokens(lower(col(textCol)))
    val grams = docs.select(col(idCol).as("doc_id"), toks.as("tokens"))
      .select(col("doc_id"), explode(
        when(size(col("tokens")) >= n,
          transform(sequence(lit(1), size(col("tokens")) - (n - 1)),
            i => concat_ws(" ", slice(col("tokens"), i, lit(n)))))
          .otherwise(array().cast("array<string>"))).as("gram"))
    Dedup.withPersisted(grams) { g =>
      val df = g.groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("df"))
      g.join(df, "gram")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
             count(when(col("df") >= minDf, 1)).as("boiler_grams"))
    }
  }

  /** Polynomial rolling-hash fingerprint over token first-bytes:
    * fold(0; h = (h*131 + ascii(tok)) mod 1e9+7). Deterministic and
    * order-sensitive (a permutation-resistant content id would use
    * xxhash64 of the full text; this mirrors classic winnowing-style
    * fingerprints while staying oracle-reproducible). */
  def rollingFingerprint(tokens: Column): Column =
    aggregate(
      transform(tokens, t => ascii(t).cast("long")),
      lit(0L),
      (acc, c) => (acc * 131L + c) % 1000000007L)
}
