package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-items (heavy-hitter) sketching as a mergeable typed
  * `Aggregator` — the bounded-memory candidate-generation shape for
  * "which keys exceed an x% frequency share" over a stream too large to
  * count exactly up front.
  *
  * Algorithm: Misra–Gries with k counters. Per partition the buffer
  * holds at most k−1 (key, count) entries; buffers merge by pointwise
  * sum followed by subtracting the k-th largest counter (Agarwal et al.,
  * "Mergeable Summaries", PODS '12), so the partial-aggregation tree
  * Catalyst picks cannot break the guarantee: every key with true
  * frequency > n/k SURVIVES in the final summary (counts may be
  * underestimates, presence may have false positives, never false
  * negatives for over-threshold keys).
  *
  * That one-sided guarantee is what makes the sketch composable with an
  * exact verify — [[heavyHitters]] re-counts ONLY the ≤ k−1 candidates
  * (broadcast semi-restriction, one tiny shuffle) and filters on the
  * exact counts, so the final answer equals the exact groupBy-all-keys
  * answer while never materializing per-key state for more than k keys
  * at a time. At 100 TB the exact plan's shuffle carries every distinct
  * key; this plan's shuffle carries k-capped buffers plus the candidate
  * re-count.
  *
  * Buffer counts are persistent-Map updates (effectively O(1) per row;
  * the decrement-all step is amortized O(1) — each decrement is paid for
  * by k prior increments). The further optimization path would be a
  * TypedImperativeAggregate over an open-addressing table, but the
  * aggregator is not the bottleneck at the default k.
  */
object Sketches {

  /** Default counter budget: guarantees recall of keys above ~0.1%. */
  val DefaultK = 1024

  /** Catalyst map buffers reject null keys (NULL_MAP_KEY), so the MG
    * buffer carries PREFIX-ENCODED keys — null → NUL, k →
    * SOH+k (collision-free) — and [[misraGries]] decodes at its
    * single driver-side collection point. This is what lets a NULL key
    * count like any other group, matching the exact groupBy answer. */
  private[operators] def encKey(key: String): String =
    if (key == null) "\u0000" else "\u0001" + key
  private[operators] def decKey(key: String): String =
    if (key == "\u0000") null else key.substring(1)

  /** Misra–Gries buffer: total rows seen + the capped counter map
    * (keys prefix-encoded — see [[encKey]]). */
  final class MisraGriesAgg(k: Int)
      extends Aggregator[String, (Long, Map[String, Long]), (Long, Map[String, Long])] {
    require(k > 1, s"k must be > 1: $k")

    override def zero: (Long, Map[String, Long]) = (0L, Map.empty)

    override def reduce(b: (Long, Map[String, Long]), key0: String): (Long, Map[String, Long]) = {
      val key = encKey(key0)
      val (n, m) = b
      m.get(key) match {
        case Some(c) => (n + 1, m.updated(key, c + 1))
        case None if m.size < k - 1 => (n + 1, m.updated(key, 1L))
        case None =>
          // Decrement-all: drop zeros, the arriving key is absorbed.
          (n + 1, m.collect { case (ky, c) if c > 1 => ky -> (c - 1) })
      }
    }

    /** Pointwise sum, then subtract the k-th largest count from every
      * counter (no-op when ≤ k−1 counters remain) — the mergeable-summaries
      * step that keeps total error ≤ n/k under ANY merge tree. */
    override def merge(a: (Long, Map[String, Long]), b: (Long, Map[String, Long])): (Long, Map[String, Long]) = {
      val summed = b._2.foldLeft(a._2) { case (m, (ky, c)) =>
        m.updated(ky, m.getOrElse(ky, 0L) + c)
      }
      val trimmed =
        if (summed.size <= k - 1) summed
        else {
          val kth = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k - 1)
          summed.collect { case (ky, c) if c > kth => ky -> (c - kth) }
        }
      (a._1 + b._1, trimmed)
    }

    override def finish(r: (Long, Map[String, Long])): (Long, Map[String, Long]) = r
    override def bufferEncoder: Encoder[(Long, Map[String, Long])] =
      ExpressionEncoder[(Long, Map[String, Long])]()
    override def outputEncoder: Encoder[(Long, Map[String, Long])] =
      ExpressionEncoder[(Long, Map[String, Long])]()
  }

  /** One-pass sketch of the string `key` column: (total rows, candidate
    * counts). The single summary row collected to the driver is
    * control-plane — ≤ k−1 entries by construction (Bloom-bitset
    * precedent). */
  def misraGries(keys: DataFrame, key: String, k: Int = DefaultK): (Long, Map[String, Long]) = {
    val agg = udaf(new MisraGriesAgg(k))
    val row = keys.agg(agg(col(key)).as("mg")).head().getStruct(0)
    (row.getLong(0),
     row.getMap[String, Long](1).toMap.map { case (ky, c) => decKey(ky) -> c })
  }

  /** EXACT heavy hitters {key : count(key) > n/k} via sketch-candidates +
    * exact verify: the MG guarantee makes the candidate set a superset of
    * the answer, so re-counting candidates only (broadcast join — ≤ k−1
    * keys) and filtering `cnt · k > n` in exact integer arithmetic yields
    * precisely the exact-plan answer. `keys` is scanned twice (sketch +
    * verify) — persist it at the call site.
    *
    * NULL keys are a group, matching the exact `groupBy` answer: the MG
    * map carries null like any key, and the verify join is NULL-SAFE
    * (`<=>`) — a plain equi-join would silently drop a genuinely
    * over-threshold null key that survived as a candidate. */
  def heavyHitters(keys: DataFrame, key: String, k: Int = DefaultK): DataFrame = {
    val (n, cand) = misraGries(keys, key, k)
    val spark = keys.sparkSession
    import spark.implicits._
    val candDf = spark.createDataset(cand.keys.toSeq).toDF("__cand")
    keys.join(broadcast(candDf), col(key) <=> col("__cand"))
      .drop("__cand")
      .groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k.toLong) > lit(n))
  }
}
