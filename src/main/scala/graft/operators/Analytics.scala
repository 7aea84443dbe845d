package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-level analytics operators shared by the catalog queries and
  * the property specs: distribution-drift testing and market-basket
  * co-occurrence. Both are written integer-exact (cross-engine hashable)
  * and in the shapes that survive 100 TB — see the q96/q98 plan audits
  * in PLANS.md.
  */
object Analytics {

  /** Ceiling on the distinct-value cardinality the ordered prefix-sum
    * windows in [[ksDrift]] / [[rankMinValue]] will accept: those windows
    * are single-partition BY DESIGN (they run over the grouped VALUE
    * domain, not the corpus), so an unbinned raw-double metric would
    * silently become a whole-domain single-reducer scan. 4M grouped rows
    * (~100 MB) is far inside one executor's comfort zone and far above
    * any sanely binned metric. */
  val DefaultMaxDistinct = 4L * 1024 * 1024

  /** Fail-loudly cardinality guard (the srpDupPairs dim-check pattern,
    * Similarity.scala:396): plan-embedded — an unpartitioned count window
    * over the ALREADY-GROUPED relation (which the caller's next window
    * single-partitions anyway, so the check adds no new exchange shape
    * and no extra driver action), then a per-row raise_error if the
    * domain is wider than `maxDistinct`. */
  private def guardCardinality(g: DataFrame, c: String, maxDistinct: Long,
                               op: String): DataFrame =
    if (maxDistinct <= 0) g
    else g.withColumn("_nv", count(lit(1)).over(Window.partitionBy()))
      .withColumn(c,
        when(col("_nv") <= maxDistinct, col(c))
          .otherwise(raise_error(concat(
            lit(s"$op: metric cardinality "), col("_nv").cast("string"),
            lit(s" exceeds maxDistinct=$maxDistinct — bin the metric " +
                "(width_bucket) before calling, or raise the guard " +
                "explicitly")))))
      .drop("_nv")

  /** Two-sample Kolmogorov–Smirnov statistic between the `isA` and ¬`isA`
    * halves of `rows` on integer metric `value`, in PURE INTEGER space:
    * one row (ks_num, n_a, n_b) where KS = ks_num / (n_a·n_b).
    *
    * Scale shape: counts aggregate per metric VALUE first (the ONLY
    * corpus-width pass — totals derive from the same grouped relation,
    * persisted across its two consumers), so the unavoidable ordered
    * prefix-sum window runs over the metric's cardinality, not the
    * corpus. That cardinality is guarded: wider than `maxDistinct`
    * fails loudly instead of single-reducer-scanning the domain. The
    * cross products are computed in DecimalType(38,0) — cuma·n_b
    * reaches n_a·n_b, which overflows LongType once each half holds
    * ~3e9+ rows (ANSI throw / silent wrap); the final cast back to
    * long keeps the output schema and still fails loudly under ANSI in
    * the (astronomically separated) case the numerator itself exceeds
    * 2^63.
    */
  def ksDrift(rows: DataFrame, value: String, isA: Column,
              maxDistinct: Long = DefaultMaxDistinct): DataFrame = {
    val g0 = rows.groupBy(col(value)).agg(
      count(lit(1)).as("cnt"),
      sum(when(isA, 1L).otherwise(0L)).as("ca"))
    Dedup.withPersisted(g0) { g =>
      val w = Window.orderBy(col(value))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = g.agg(sum(col("ca")).as("n_a"),
                      sum(col("cnt") - col("ca")).as("n_b"))
      val dec = "decimal(38,0)"
      guardCardinality(g, value, maxDistinct, "ksDrift")
        .withColumn("cuma", sum(col("ca")).over(w))
        .withColumn("cumb", sum(col("cnt") - col("ca")).over(w))
        .crossJoin(broadcast(tot)) // 1-row stats side
        .agg(max(abs(col("cuma").cast(dec) * col("n_b").cast(dec)
                     - col("cumb").cast(dec) * col("n_a").cast(dec)))
               .cast("long").as("ks_num"),
             max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
    }
  }

  /** Nearest-rank order statistic: the smallest `c` whose cumulative
    * count reaches (n+1) div 2 — the integer-exact median/MAD primitive
    * (q105). Same bounded-window shape as [[ksDrift]]: group by the
    * metric VALUE first, prefix-sum over the value domain only, `nRow`
    * (a 1-row count) rides in on a broadcast. The domain cardinality is
    * guarded by `maxDistinct` exactly as in ksDrift. */
  def rankMinValue(rows: DataFrame, c: String, nRow: DataFrame, out: String,
                   maxDistinct: Long = DefaultMaxDistinct): DataFrame = {
    val w = Window.orderBy(col(c))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    guardCardinality(
        rows.groupBy(col(c)).agg(count(lit(1)).as("gc")), c, maxDistinct,
        "rankMinValue")
      .withColumn("cum", sum(col("gc")).over(w))
      .crossJoin(broadcast(nRow)) // 1-row count side
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .agg(min(col(c)).as(out))
  }

  /** Damped PageRank over a DIRECTED edge list (`src`, `dst`) in pure
    * integer arithmetic: ranks are fixed-point at `scale` (initial rank
    * = scale/n; update r'(v) = (15·scale/100)/n + (85·Σ r(u) div
    * deg(u)) div 100, every division an integer floor) so results are
    * bit-identical across engines and partitionings — no float mass to
    * drift by ulps. Symmetrize the edge list first for an undirected
    * graph.
    *
    * Scale shape (the k-means-refine pattern): edges + out-degrees are
    * computed once inside a persisted scope; each iteration is one
    * shuffle on src (contrib join) and one on dst (the sum), and the
    * rank frame is localCheckpoint'ed per round so the plan does not
    * grow with the iteration count. Only the node COUNT ever reaches
    * the driver. Truncation loses ≤ 1 unit per division — at the
    * default scale that is relative error ~1e-10 per round, and
    * determinism is what the oracle gate needs.
    */
  def pageRank(edges0: DataFrame, iters: Int,
               scale: Long = 1000000000000L): DataFrame = {
    val edges = edges0.select(col("src"), col("dst"))
    Dedup.withPersisted(edges) { e =>
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
        .localCheckpoint() // reused every round + the final left join
      val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      val n = nodes.count() // control-plane scalar
      require(n > 0, "pageRank: empty edge list — no nodes to rank")
      val tele = (15L * scale / 100L) / n
      var ranks = nodes.select(col("id"), lit(scale / n).as("rank"))
      for (_ <- 1 to iters) {
        val contribs = e
          .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
          .join(deg.withColumnRenamed("id", "src"), Seq("src"))
          .select(col("dst").as("id"), expr("rank div deg").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("sc"))
        ranks = nodes.join(contribs, Seq("id"), "left")
          .select(col("id"),
            (lit(tele) + expr("(85 * coalesce(sc, CAST(0 AS BIGINT))) div 100"))
              .as("rank"))
          .localCheckpoint()
      }
      ranks
    }
  }

  /** Giant-basket population cap: a single basket fans out C(size, 2)
    * pair rows ON ONE BASKET KEY — Apriori pruning cannot help when the
    * oversized basket is made of globally-popular items (a crawler
    * session, a reseller cart). 1000 items bounds any one basket's
    * fanout at ~500k rows; every TPC-H order holds ≤ 7. */
  val DefaultMaxBasketItems = 1000L

  /** Market-basket pair co-occurrence: (part_a < part_b) item pairs
    * sharing a basket at least `minSupport` times, with item supports
    * and the basket count riding along as exact integers (confidence /
    * lift are one division away).
    *
    * `aprioriPrune` drops items whose own support is below `minSupport`
    * BEFORE the per-basket quadratic expansion. By the Apriori property
    * this is result-neutral (any item of a qualifying pair has support
    * ≥ the pair's support — AnalyticsSpec asserts equality), which is
    * why q98's unpruned DuckDB oracle still hash-matches; on skewed
    * real data it is the df-cap analog that keeps the expansion small.
    *
    * `maxBasketItems` is the SKEW kill the prune can't provide: baskets
    * with more distinct items are dropped entirely, up front — they
    * vanish from supports, the basket count and pairs alike, the same
    * population-filter semantics as q68's shingle df cap and
    * srpDupPairs' bucket guard, and the same one-sided mirror (a
    * QUALIFY COUNT(*) OVER basket in the oracle). The cap window
    * partitions on the basket key the self-join shuffles on anyway.
    * Input baskets are deduplicated here; the (basket, item) relation
    * is persisted across its consumers.
    */
  def coOccurrence(rows: DataFrame, basket: String, item: String,
                   minSupport: Long, aprioriPrune: Boolean = true,
                   maxBasketItems: Long = DefaultMaxBasketItems): DataFrame = {
    val li0 = rows.select(col(basket).as("basket"), col(item).as("item")).distinct()
    val li = Dedup.capPopulation(li0, Seq(col("basket")), maxBasketItems)
    Dedup.withPersisted(li) { l =>
      val sup = l.groupBy(col("item")).agg(count(lit(1)).as("sup"))
      val lf =
        if (aprioriPrune)
          l.join(sup.filter(col("sup") >= minSupport).select(col("item")),
                 Seq("item"), "left_semi")
        else l
      val nBaskets = l.select(col("basket")).distinct().count()
      val a = lf.select(col("basket"), col("item").as("part_a"))
      val b = lf.select(col("basket"), col("item").as("part_b"))
      a.join(b, Seq("basket"))
        .filter(col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minSupport)
        .join(broadcast(sup.select(col("item").as("part_a"), col("sup").as("sup_a"))), Seq("part_a"))
        .join(broadcast(sup.select(col("item").as("part_b"), col("sup").as("sup_b"))), Seq("part_b"))
        .select(col("part_a"), col("part_b"), col("cnt"), col("sup_a"), col("sup_b"),
                lit(nBaskets).as("n_baskets"))
    }
  }
}
