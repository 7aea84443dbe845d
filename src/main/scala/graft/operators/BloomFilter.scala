package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom filter as a mergeable typed `Aggregator` plus a
  * codegen'd probe — the sketch shape for 100 TB membership pre-filters:
  * the build shuffles only fixed-size bitsets (bitwise-OR merge, the same
  * two-phase partial-aggregation Catalyst gives built-ins), the resulting
  * bits travel to probes as ONE small literal (a 2^20-bit filter is
  * 16 KiB), and the probe is a per-row AND of k bit tests — map-only, no
  * shuffle, whole-stage-codegen friendly.
  *
  * Design note: the k bit positions are computed COLUMN-side
  * (`pmod(xxhash64(key, j), m)`) in both build and probe, so the
  * aggregator itself only ever sets literal bit positions — there is no
  * JVM reimplementation of the hash to drift out of sync with the
  * Catalyst one.
  *
  * A Bloom filter admits false positives, never false negatives — callers
  * that need exact results (q67) re-verify candidates with an exact join,
  * using the filter purely to prune the probe stream before the shuffle.
  */
object Bloom {

  /** Default filter geometry: 2^20 bits / 5 hashes ≈ 1% false positives
    * at ~100k distinct keys. */
  val DefaultBits = 1 << 20
  val DefaultHashes = 5

  /** Bitset union aggregator: input = bit position, buffer = word array. */
  final class BitsetAgg(numBits: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits > 0 && numBits % 64 == 0, s"numBits must be a multiple of 64: $numBits")
    override def zero: Array[Long] = new Array[Long](numBits / 64)
    override def reduce(b: Array[Long], pos: Long): Array[Long] = {
      b((pos >>> 6).toInt) |= (1L << (pos & 63L)); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** The j-th bit position of `key` (Kirsch–Mitzenmacher via seeded
    * xxhash64 — same expression on build and probe). */
  private def bitPos(key: Column, j: Int, numBits: Int): Column =
    pmod(xxhash64(key, lit(j)), lit(numBits.toLong))

  /** Build the filter over the (64-bit) `key` column: explode each key
    * into its k bit positions, union them into one bitset. The single-row
    * result is collected to the driver — control-plane, 16 KiB at the
    * default geometry (the same move `DataFrameStatFunctions.bloomFilter`
    * makes). */
  def build(keys: DataFrame, key: String,
            numBits: Int = DefaultBits, k: Int = DefaultHashes): Array[Long] = {
    val positions = keys.select(explode(array(
      (0 until k).map(j => bitPos(col(key), j, numBits)): _*)).as("pos"))
    val agg = udaf(new BitsetAgg(numBits))
    positions.agg(agg(col("pos")).as("bits")).head.getSeq[Long](0).toArray
  }

  /** Membership probe: AND of the k bit tests against the literal bitset.
    * False positives possible, false negatives not. */
  def mightContain(bits: Array[Long], key: Column,
                   numBits: Int = DefaultBits, k: Int = DefaultHashes): Column = {
    require(bits.length.toLong * 64 == numBits, s"bits length ${bits.length} != $numBits/64")
    val words = typedlit(bits.toSeq)
    (0 until k).map { j =>
      val pos = bitPos(key, j, numBits)
      val word = element_at(words, shiftright(pos, 6).cast("int") + lit(1))
      call_function("shiftright", word, pmod(pos, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** [[mightContain]] with the BITSET OUT OF THE PLAN (r22): the literal
    * form embeds numBits/64 longs in the expression tree — 16 K longs at
    * the 2^20 floor, up to 4 M at the 2^28 cap — and a probe ORing one
    * filter per chain layer made Catalyst analysis/optimization the
    * dominant cost of the whole lifecycle query (driver sampling: ~85 %
    * of q137's steady-state wall was planning). Here the k bit POSITIONS
    * are still computed by the exact same Catalyst expressions as the
    * build (zero hash-drift risk — the no-false-negatives contract rides
    * on position equality), and only the constant-time word lookup moves
    * into a closure capturing the words array, which ships with the task
    * binary instead of the plan. Same truth table as [[mightContain]]
    * (spec-pinned); trades whole-stage codegen of the k tests for a plan
    * that analyzes in microseconds — the right trade anywhere the probe
    * side is delta-sized and the filter is chain-deep. */
  def mightContainOffPlan(bits: Array[Long], key: Column,
                          numBits: Int = DefaultBits,
                          k: Int = DefaultHashes): Column = {
    require(bits.length.toLong * 64 == numBits, s"bits length ${bits.length} != $numBits/64")
    val test = udf((pos: Long) =>
      ((bits((pos >>> 6).toInt) >>> (pos & 63L).toInt) & 1L) == 1L)
    (0 until k).map(j => test(bitPos(key, j, numBits))).reduce(_ && _)
  }
}
