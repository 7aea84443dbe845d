package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.CvePipeline.Landing
import graft.operators.{BandIndex, Dedup}

/** The operational daily loop end-to-end: scheduler ticks landing CVE
  * deltas (K1 merge) and document deltas (persisted-index dedup), with
  * compaction cadence and injected crashes between tick steps. */
class DailyLoopSpec extends SparkSpec {

  private def landing = Landing(
    nvd = Some(res("nvd_page.json")),
    epss = Some(res("epss_scores.csv")),
    kev = Some(res("known_exploited_vulnerabilities.json")))

  private def ts(s: String) = Timestamp.valueOf(s)

  private val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text")

  /** Three daily deltas covering the corpus (mod split keeps near-dup
    * pairs spread across deltas, so cross-delta probes matter). */
  private def delta(seq: Long): DataFrame =
    docs.filter(col("doc_id") % 3 === lit((seq - 1) % 3))

  private def work() =
    java.nio.file.Files.createTempDirectory("graft_dailyloop_").toString

  private def pairSet(p: DailyLoop.Paths) =
    graft.streaming.DocsStream.readPairs(spark, p.pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private lazy val batchTruth = Dedup.minhashDupPairs(docs, 0.8)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("N ticks land deltas, merge, probe, append; final pairs equal the batch truth") {
    val p = DailyLoop.Paths(work())
    var calls = 0
    val clockTimes = Seq(
      ts("2025-04-01 00:00:00"), // tick 1 (day zero)
      ts("2025-04-02 00:00:00"), // tick 2
      ts("2025-04-03 00:00:00"), // tick 3
      ts("2025-04-03 12:00:00")) // not due — sleeps
    val ticks = DailyLoop.loop(spark, landing, delta, p,
      intervalHours = 24,
      shouldStop = () => calls >= clockTimes.length,
      clock = () => {
        val t = clockTimes(math.min(calls, clockTimes.length - 1))
        calls += 1; t
      },
      sleepMs = 1L)
    assert(ticks == 3)
    assert(DailyLoop.committedTick(spark, p)._1 == 3L)
    // the dedup state converged to the full-corpus batch answer
    assert(pairSet(p) == batchTruth && batchTruth.nonEmpty)
    // base + 3 layers, chain intact
    assert(BandIndex.chainLength(spark, p.index) == 4)
    // the CVE snapshot merged every tick: one row per id, freshness stamped
    val snap = spark.read.parquet(p.snapshot)
    assert(snap.select("id").distinct().count() == snap.count() && snap.count() > 0)
    assert(operators.Watermarks.lastUpdated(spark, p.status, CveJob.JobSource)
      .contains(ts("2025-04-03 00:00:00")))
    // not-due probe did not tick
    assert(!DailyLoop.isTickDue(spark, p, ts("2025-04-03 12:00:00")))
  }

  test("compaction cadence: the chain is collapsed in-loop and pairs are unchanged") {
    val p = DailyLoop.Paths(work())
    (1 to 3).foreach { d =>
      DailyLoop.runTick(spark, landing, delta(d), p,
        ts(f"2025-04-0$d%d 00:00:00"), maxChain = 2)
      // bounded probe cost: never more than maxChain+1 versions walked
      // (the +1 is the tick that triggers the NEXT compaction)
      assert(BandIndex.chainLength(spark, p.index) <= 3)
    }
    // compaction must not change answers
    assert(pairSet(p) == batchTruth)
    // and the compacted index still probes correctly on a fresh tick:
    // re-landing delta 1 discovers nothing new (all pairs known)
    DailyLoop.runTick(spark, landing, delta(1), p, ts("2025-04-04 00:00:00"),
      maxChain = 2)
    assert(pairSet(p) == batchTruth)
  }

  test("marker retention: old tick markers prune, the committed seq never moves") {
    val p = DailyLoop.Paths(work())
    (1 to 3).foreach { d =>
      DailyLoop.runTick(spark, CvePipeline.Landing(), delta(d), p,
        ts(f"2025-04-0$d%d 00:00:00"), keepMarkers = 2)
    }
    val markers = new java.io.File(p.ticks).listFiles.map(_.getName)
      .filter(_.startsWith("tick-")).sorted // hadoop local FS adds .crc sidecars
    assert(markers.length == 2, markers.toSeq) // tick-1 pruned
    assert(DailyLoop.committedTick(spark, p)._1 == 3L)
    assert(!DailyLoop.isTickDue(spark, p, ts("2025-04-03 12:00:00")))
  }

  test("a crash after ANY step re-runs the tick and converges to the crash-free state") {
    import DailyLoop._
    // reference run, no crashes
    val ref = Paths(work())
    (1 to 3).foreach(d =>
      runTick(spark, landing, delta(d), ref, ts(f"2025-04-0$d%d 00:00:00"),
        maxChain = 2))
    val refPairs = pairSet(ref)
    val refStore = spark.read.schema(graft.streaming.DocsStream.StoreSchema)
      .parquet(ref.store).select("doc_id", "shingle").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    for (fp <- Seq(AfterMerge, AfterDedup, AfterCompact)) {
      val p = Paths(work())
      runTick(spark, landing, delta(1), p, ts("2025-04-01 00:00:00"), maxChain = 2)
      // tick 2 crashes mid-way, then the operator re-runs it
      intercept[InjectedCrash] {
        runTick(spark, landing, delta(2), p, ts("2025-04-02 00:00:00"),
          maxChain = 2, failAt = Some(fp))
      }
      assert(DailyLoop.committedTick(spark, p)._1 == 1L, s"$fp committed early")
      runTick(spark, landing, delta(2), p, ts("2025-04-02 00:05:00"), maxChain = 2)
      runTick(spark, landing, delta(3), p, ts("2025-04-03 00:00:00"), maxChain = 2)
      // identical end state: pairs, store contents, tick count, snapshot keys
      assert(pairSet(p) == refPairs, s"pairs diverged after crash $fp")
      val store = spark.read.schema(graft.streaming.DocsStream.StoreSchema)
        .parquet(p.store).select("doc_id", "shingle").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(store == refStore, s"store diverged after crash $fp")
      // no doubled (batch-spanning) shingle rows anywhere
      val dbl = spark.read.schema(graft.streaming.DocsStream.StoreSchema)
        .parquet(p.store).groupBy("doc_id", "shingle").count()
        .filter(col("count") > 1).count()
      assert(dbl == 0, s"$dbl doubled store rows after crash $fp")
      assert(DailyLoop.committedTick(spark, p)._1 == 3L)
      val snap = spark.read.parquet(p.snapshot)
      assert(snap.select("id").distinct().count() == snap.count())
    }
  }
}
