package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Stage-attribution probe for the coarse-quantized auto-k SemDeDup
  * (q116, `Similarity.semDedupAutoKRemovals`): times each stage of the
  * SAME composition with a localCheckpoint barrier after every stage,
  * so each print is that stage's own work (plus its checkpoint copy —
  * which the real query also pays for seeded/cents/au; the coarse
  * relations and the final assign are barriered HERE only, so the sum
  * reads slightly above the in-catalog number). Exists because the
  * round-16 redesign cut the restricted assign's dot count ~10× while
  * the sf10 decade point fell ~7–9× — the residual cost needed owners
  * before anyone optimizes the wrong stage.
  *
  * The staged chain lives in [[removals]] with a caller-supplied
  * per-stage wrapper: `main` wraps stages with checkpoint+timing, and
  * SimilaritySpec wraps with checkpoint alone and asserts the output
  * EQUALS `semDedupAutoKRemovals` — so the probe cannot silently
  * drift into timing a pipeline production no longer runs.
  *
  * Round 17 adds the AUTO-C stage (coarseTarget) and a `--one-label`
  * mode that collapses every label to one value — the adversarial
  * geometry for a FIXED coarse layer (C = 1 makes the restricted term
  * N²/targetCell, the flat-assign class): with auto-C on, the coarse
  * layer re-subdivides itself and the restricted assigns must stay
  * bounded by coarseTarget, not by N/C. Round 18 makes the stage a
  * LADDER: when maxPop > coarseTarget² the balance rule engages extra
  * subdivide→re-assign levels coarsest-first (each stage printed with
  * its level target), so the probe attributes the recursion's cost
  * level by level.
  * Usage: runMain graft.tools.AutoKProbe [sfDir] [targetCell]
  *          [coarseTarget] [--one-label] [--floor0]
  * (--floor0 zeroes LadderRowsFloor so the ladder engages on fixtures
  * whose quadratic would not clear the production work floor.)
  */
object AutoKProbe {

  /** The probed composition — `semDedupAutoKRemovals` stage for stage
    * (refineIters = 1, the catalog geometry). `t(label)(df)` wraps
    * every intermediate; the pair/witness tail is returned LAZY so the
    * caller owns its materialization (main times the noop write; the
    * drift spec collects and compares). */
  def removals(e: DataFrame, targetCell: Long, coarseTarget: Long,
               threshold: Double,
               ladderRowsFloor: Long = Similarity.LadderRowsFloor)
              (t: String => DataFrame => DataFrame): DataFrame = {
    val units = t("unit vectors + checkpoint")(
      Similarity.unitVectors(e, Seq("vec_id" -> "id", "label" -> "cell")))
    val ccents = t("coarse centroids (exact-decimal)")(
      Similarity.exactCentroids(units))
    val coarse0 = t("coarse assign (agg top-1)")(
      Similarity.assignCellsAgg(units, ccents)
        .select(col("id"), col("assigned_cell").as("coarse")))
    // the ladder decision AND the per-level fold are
    // Similarity.autoCLadder itself (r18 verdict watch 1: a verbatim
    // mirror here could drift on decision boundaries the drift-pin
    // fixture doesn't probe) — the probe only supplies the stage-timing
    // wrapper, so what it attributes cost to IS the production fold
    val (coarse, cellsHint) =
      if (coarseTarget <= 0L) (coarse0, None)
      else {
        val (c, h) = Similarity.autoCLadder(units, coarse0, coarseTarget,
          ladderRowsFloor)(t)
        (c, Some(h))
      }
    val seeded = t("auto-k subdivide + checkpoint")(
      Similarity.withAutoCells(
        units.select(col("id"), col("unit")).join(coarse, "id"),
        targetCell, idCol = "id", cellCol = "coarse", outCol = "scell",
        cellsHint = cellsHint))
    val cents0 = t("sub-seed centroids (cents0)")(
      Similarity.exactCentroids(
        seeded.select(col("scell").as("cell"), col("unit")), "cell", "unit"))
    // hoisted once per Lloyd loop, as in production (r17 verdict task 4)
    val pin = Some(Similarity.broadcastDecision(cents0))
    val cents1 = t("lloyd round (restricted + means)") {
      val a = Similarity.assignCellsWithinCoarse(seeded, cents0,
        pinBroadcast = pin)
      Similarity.exactCentroids(
        seeded.join(a.select(col("id"), col("assigned_cell")), "id")
          .select(col("assigned_cell").as("cell"), col("unit")),
        "cell", "unit")
    }
    val assigned = t("final restricted assign")(
      Similarity.assignCellsWithinCoarse(seeded, cents1, pinBroadcast = pin)
        .select(col("id"), col("assigned_cell")))
    val au = t("population cap + join + checkpoint")(
      Dedup.capPopulation(
        seeded.select(col("id"), col("unit")).join(assigned, "id"),
        Seq(col("assigned_cell")), Similarity.DefaultMaxCell))
    au.as("a").join(au.as("b"),
        col("a.assigned_cell") <=> col("b.assigned_cell") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
              Similarity.dot(col("a.unit"), col("b.unit")).as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy(col("b_id").as("vec_id"))
      .agg(min(col("a_id")).as("witness_id"), max(col("sim")).as("max_sim"))
  }

  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val pos = args.filterNot(_.startsWith("--"))
    val sfDir = pos.headOption.getOrElse("/root/testdata/sf0.1")
    val targetCell = pos.lift(1).map(_.toLong).getOrElse(12L)
    val coarseTarget = pos.lift(2).map(_.toLong).getOrElse(32L)
    val oneLabel = flags.contains("--one-label")
    val floor = if (flags.contains("--floor0")) 0L
                else Similarity.LadderRowsFloor
    val threshold = 0.4
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[autokprobe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    println(s"[autokprobe] sfDir=$sfDir targetCell=$targetCell " +
      s"coarseTarget=$coarseTarget oneLabel=$oneLabel floor=$floor")
    val e0 = graft.Tables.load(spark, sfDir, "embeddings")
    val e = if (oneLabel) e0.withColumn("label", lit(0)) else e0
    val tail = removals(e, targetCell, coarseTarget, threshold, floor)(
      label => df => timed(label)(df.localCheckpoint()))
    timed("within-cell pairs + witness agg") {
      tail.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
