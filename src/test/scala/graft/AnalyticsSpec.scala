package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Property coverage for the analytics operators beyond the fixture
  * oracle: KS edge cases and the Apriori prune's result-neutrality on
  * data where the prune actually drops items. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("KS of identically-distributed halves is 0; of disjoint halves is n_a*n_b") {
    // Identical: same multiset of values on both sides.
    val same = (1 to 200).flatMap(i => Seq((i.toLong, i % 10), (i.toLong + 1000, i % 10)))
      .toDF("id", "v")
    val r1 = Analytics.ksDrift(same, "v", $"id" <= 200).head()
    assert(r1.getLong(0) == 0L && r1.getLong(1) == 200L && r1.getLong(2) == 200L)

    // Disjoint supports: A strictly below B → max gap = full mass.
    val disjoint = ((1 to 150).map(i => (i.toLong, i % 5)) ++
      (1 to 100).map(i => (i.toLong + 1000, 100 + i % 7))).toDF("id", "v")
    val r2 = Analytics.ksDrift(disjoint, "v", $"id" <= 150).head()
    assert(r2.getLong(1) == 150L && r2.getLong(2) == 100L)
    assert(r2.getLong(0) == 150L * 100L)
  }

  test("KS matches a driver-side ECDF computation on an arbitrary mix") {
    val rows = (1 to 300).map(i => (i.toLong, (i * 7919) % 23)) ++
      (1 to 200).map(i => (i.toLong + 5000, (i * 104729) % 31))
    val df = rows.toDF("id", "v")
    val got = Analytics.ksDrift(df, "v", $"id" <= 300).head()
    val a = rows.filter(_._1 <= 300).map(_._2)
    val b = rows.filter(_._1 > 300).map(_._2)
    val ks = (a ++ b).distinct.map { t =>
      math.abs(a.count(_ <= t).toLong * b.size - b.count(_ <= t).toLong * a.size)
    }.max
    assert(got.getLong(0) == ks && got.getLong(1) == a.size && got.getLong(2) == b.size)
  }

  test("Apriori prune is result-neutral even when it drops items") {
    // Baskets with many support-1 items (i*1000+b is unique per basket)
    // alongside recurring items — the prune genuinely removes rows here.
    val rows = (1 to 50).flatMap { b =>
      Seq((b.toLong, "x"), (b.toLong, if (b % 2 == 0) "y" else "z"),
          (b.toLong, s"rare${b}"))
    }.toDF("basket", "item")
    val pruned = Analytics.coOccurrence(rows, "basket", "item", 2L, aprioriPrune = true)
      .orderBy("part_a", "part_b").collect().toSeq
    val unpruned = Analytics.coOccurrence(rows, "basket", "item", 2L, aprioriPrune = false)
      .orderBy("part_a", "part_b").collect().toSeq
    assert(pruned == unpruned)
    // Sanity vs hand computation: x co-occurs with y in 25 baskets, with
    // z in 25; rare* items never reach support 2.
    val asMap = pruned.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(asMap == Map(
      ("x", "y") -> ((25L, 50L, 25L, 50L)),
      ("x", "z") -> ((25L, 50L, 25L, 50L))))
  }

  test("pageRank: uniform on a ring, center-heavy on a star, mass bounded") {
    val scale = 1000000000000L
    // Directed ring 0→1→…→9→0: perfect symmetry ⇒ identical ranks.
    val ring = (0L until 10L).map(i => (i, (i + 1) % 10)).toDF("src", "dst")
    val ringRanks = Analytics.pageRank(ring, 3, scale).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ringRanks.values.toSet.size == 1)

    // Star (symmetrized): hub collects mass from every leaf.
    val star = (1L to 8L).flatMap(i => Seq((0L, i), (i, 0L))).toDF("src", "dst")
    val starRanks = Analytics.pageRank(star, 3, scale).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starRanks(0L) > starRanks(1L))
    assert((1L to 8L).map(starRanks).toSet.size == 1) // leaves identical
    // floor truncation only ever LOSES mass, never creates it
    assert(starRanks.values.sum <= scale)
  }

  test("pageRank matches a driver-side integer reference under any partitioning") {
    val scale = 1000000000000L
    val edges = (for (i <- 0L until 30L; j <- Seq((i * 7 + 3) % 30, (i * 11 + 5) % 30)
                      if i != j) yield (i, j)).distinct
    def reference(iters: Int): Map[Long, Long] = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n = nodes.size.toLong
      val tele = (15L * scale / 100L) / n
      var r = nodes.map(_ -> scale / n).toMap
      for (_ <- 1 to iters) {
        val in = edges.groupBy(_._2).view.mapValues(
          _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
        r = nodes.map(v => v -> (tele + 85L * in.getOrElse(v, 0L) / 100L)).toMap
      }
      r
    }
    val expect = reference(3)
    for (parts <- Seq(1, 4, 32)) {
      val got = Analytics.pageRank(edges.toDF("src", "dst").repartition(parts), 3, scale)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"parts=$parts")
    }
  }

  test("pageRank fails loudly on an empty edge list") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Analytics.pageRank(empty, 3)
    }
    assert(e.getMessage.contains("empty edge list"))
  }

  private def messagesOf(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("ordered-prefix windows fail loudly past the maxDistinct cardinality guard") {
    // 50 distinct metric values against a guard of 10: the raw-double-
    // metric mistake must throw, not single-reducer-scan the domain.
    val wide = (1 to 50).map(i => (i.toLong, i)).toDF("id", "v")
    val e1 = intercept[Exception] {
      Analytics.ksDrift(wide, "v", $"id" % 2 === 0, maxDistinct = 10).collect()
    }
    assert(messagesOf(e1).contains("maxDistinct"), messagesOf(e1))
    val nRow = wide.agg(count(lit(1)).as("n"))
    val e2 = intercept[Exception] {
      Analytics.rankMinValue(wide, "v", nRow, "med", maxDistinct = 10).collect()
    }
    assert(messagesOf(e2).contains("maxDistinct"), messagesOf(e2))
    // ...and is result-neutral when the domain fits under the guard.
    val med = Analytics.rankMinValue(wide, "v", nRow, "med", maxDistinct = 100)
      .head().getInt(0)
    assert(med == 25)
  }

  test("duplicate (basket, item) rows count once") {
    val rows = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
      .toDF("basket", "item")
    val got = Analytics.coOccurrence(rows, "basket", "item", 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 2L)))
  }

  test("maxBasketItems drops a giant basket of popular items that Apriori can't prune") {
    // 20 normal 2-item baskets of globally-heavy items + one 100-item
    // basket made ENTIRELY of those same heavy items: every item clears
    // minSupport, so the Apriori prune keeps the whole giant basket and
    // its C(100,2) = 4950-pair fanout lands on ONE basket key. The cap
    // is the only guard that fires.
    val heavy = (0 until 100).map(i => f"h$i%03d")
    val normal = (1 to 20).flatMap(b =>
      Seq((b.toLong, heavy(2 * (b % 10))), (b.toLong, heavy(2 * (b % 10) + 1))))
    val giant = heavy.map(i => (999L, i))
    val rows = (normal ++ giant).toDF("basket", "item")

    val capped = Analytics.coOccurrence(rows, "basket", "item", 2L,
        maxBasketItems = 50L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // Dropped basket vanishes from EVERYTHING: pairs, supports, n_baskets.
    val expect = (0 until 10).map { p =>
      (heavy(2 * p), heavy(2 * p + 1)) -> ((2L, 2L, 2L, 20L))
    }.toMap
    assert(capped == expect)

    // Cap off: the giant basket floods in — 4950 distinct pairs, each
    // pair of heavy items co-occurring at least once.
    val uncapped = Analytics.coOccurrence(rows, "basket", "item", 1L,
        maxBasketItems = 0L).count()
    assert(uncapped == 4950L)
  }
}
