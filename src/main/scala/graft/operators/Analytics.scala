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

  /** Two-sample Kolmogorov–Smirnov statistic between the `isA` and ¬`isA`
    * halves of `rows` on integer metric `value`, in PURE INTEGER space:
    * one row (ks_num, n_a, n_b) where KS = ks_num / (n_a·n_b).
    *
    * Scale shape: counts aggregate per metric VALUE first (one
    * exchange), so the unavoidable ordered prefix-sum window runs over
    * the metric's cardinality, not the corpus — bin wide metrics before
    * calling. Totals ride in on a 1-row broadcast.
    */
  def ksDrift(rows: DataFrame, value: String, isA: Column): DataFrame = {
    val g = rows.groupBy(col(value)).agg(
      count(lit(1)).as("cnt"),
      sum(when(isA, 1L).otherwise(0L)).as("ca"))
    val w = Window.orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = rows.agg(
      sum(when(isA, 1L).otherwise(0L)).as("n_a"),
      sum(when(isA, 0L).otherwise(1L)).as("n_b"))
    g.withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cnt") - col("ca")).over(w))
      .crossJoin(broadcast(tot)) // 1-row stats side
      .agg(max(abs(col("cuma") * col("n_b") - col("cumb") * col("n_a"))).as("ks_num"),
           max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
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
    * Input baskets are deduplicated here; the (basket, item) relation
    * is persisted across its consumers.
    */
  def coOccurrence(rows: DataFrame, basket: String, item: String,
                   minSupport: Long, aprioriPrune: Boolean = true): DataFrame = {
    val li = rows.select(col(basket).as("basket"), col(item).as("item")).distinct()
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
