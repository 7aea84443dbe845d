package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Misra–Gries frequent-items sketch: the one-sided guarantee (no false
  * negatives above n/k) and the exactness of sketch-candidates +
  * exact-verify, exercised in the regime the catalog fixture can't reach
  * — a skewed stream whose distinct-key count far exceeds the counter
  * budget, under different physical partitionings (the merge tree is
  * what the mergeable-summaries step must survive). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish skewed stream: key i appears ceil(C/i) times — few heavy
    * keys over a long uniform-ish tail. ~400 distinct keys. */
  private def skewed(c: Int) =
    (1 to 400).flatMap(i => Seq.fill(math.max(c / i, 1))(s"key$i"))

  private def exactHeavy(keys: Seq[String], k: Int): Map[String, Long] = {
    val n = keys.size.toLong
    keys.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
  }

  test("MG candidates are a superset of true heavy hitters under any partitioning") {
    val keys = skewed(2000)
    val truth = exactHeavy(keys, 32)
    assert(truth.nonEmpty, "fixture must have over-threshold keys")
    for (parts <- Seq(1, 3, 32)) {
      val df = keys.toDF("k").repartition(parts)
      val (n, cand) = Sketches.misraGries(df, "k", 32)
      assert(n == keys.size.toLong)
      assert(cand.size <= 31)
      val missing = truth.keySet -- cand.keySet
      assert(missing.isEmpty, s"parts=$parts lost heavy hitters: $missing")
    }
  }

  test("heavyHitters == exact answer in the decrementing regime") {
    // 400 distinct >> k=32 counters: the decrement-all and merge-trim
    // paths both run.
    val keys = skewed(2000)
    val truth = exactHeavy(keys, 32)
    val got = Sketches.heavyHitters(keys.toDF("k").repartition(8), "k", 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == truth)
  }

  test("uniform stream yields no heavy hitters, empty but well-formed") {
    val keys = (1 to 300).flatMap(i => Seq.fill(3)(s"u$i"))
    val df = keys.toDF("k").repartition(5)
    val got = Sketches.heavyHitters(df, "k", 64)
    assert(got.columns.toSeq == Seq("k", "cnt"))
    assert(got.count() == 0L)
  }

  test("an over-threshold NULL key survives the sketch AND the null-safe verify") {
    // 40 nulls over n=100 at k=5 (threshold cnt·5 > 100): the null key is
    // the ONLY heavy hitter. A plain equi-join verify would never match
    // the null candidate and silently drop it — the exact groupBy answer
    // keeps a NULL group, so heavyHitters must too.
    val keys = Seq.fill(40)(null: String) ++ (1 to 60).map(i => s"k${i % 20}")
    val got = Sketches.heavyHitters(keys.toDF("k").repartition(4), "k", 5)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toSeq
    assert(got == Seq(None -> 40L))
  }

  test("sketch counts are never overestimates and total n is exact") {
    val keys = skewed(500)
    val (n, cand) = Sketches.misraGries(keys.toDF("k").repartition(4), "k", 16)
    assert(n == keys.size.toLong)
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((ky, c) <- cand) assert(c <= exact(ky), s"$ky sketch $c > exact ${exact(ky)}")
  }
}
