package graft.tools

import org.apache.spark.sql.functions._

import graft.CvePipeline
import graft.CvePipeline.Landing
import graft.operators.{Merge, Watermarks}
import graft.sources.Readers

/** End-to-end drive of the CVE side of the engine (the reference's
  * `main.py job()`): land fixtures → per-source normalize → K1 merges →
  * prioritize → incremental re-merge with watermarks.
  * Usage: runMain graft.tools.CveDemo <fixtureDir> <workDir>
  */
object CveDemo {
  def main(args: Array[String]): Unit = {
    val Array(fixtures, work) = args
    val spark = graft.GraftSession.build("4")
    spark.sparkContext.setLogLevel("WARN")
    def p(name: String) = s"$fixtures/$name"

    // Full init (SURVEY.md §3.1)
    val landing = Landing(
      nvd = Some(p("nvd_page.json")),
      epss = Some(p("epss_scores.csv")),
      exploitDb = Some(p("files_exploits.csv")),
      kev = Some(p("known_exploited_vulnerabilities.json")),
      metasploit = Some(p("modules_metadata_base.json")),
      debian = Some(p("debian.json")),
      cveOrgDir = Some(p("cveorg")),
      redhat = Some(p("redhat_page.json")))
    val snap = CvePipeline.buildSnapshot(spark, landing)
    snap.write.mode("overwrite").parquet(s"$work/cve_snapshot")
    println(s"[cvedemo] snapshot rows: ${snap.count()}")
    snap.select("id", "priority").orderBy("id").collect()
      .foreach(r => println(s"[cvedemo] ${r.getString(0)} -> P${r.getInt(1)}"))

    // Incremental tick (§3.2): freshness gate + re-merge + watermark advance
    val wmPath = s"$work/update_status"
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val kevReleased = Readers.kevDateReleased(spark, p("known_exploited_vulnerabilities.json"))
    val fresh = Watermarks.isFresh(
      Watermarks.sourceLastUpdate(spark, wmPath, "kev"), kevReleased)
    println(s"[cvedemo] kev fresh? $fresh (first tick: expect false -> update)")
    if (!fresh) {
      val snapshot = spark.read.parquet(s"$work/cve_snapshot").drop("priority")
      val merged = Merge.upsert(snapshot, Readers.kev(spark, p("known_exploited_vulnerabilities.json")))
      val rescored = CvePipeline.prioritize(merged)
      rescored.write.mode("overwrite").parquet(s"$work/cve_snapshot_v2")
      Watermarks.upsert(spark, wmPath, "kev", now, Some(kevReleased))
      println(s"[cvedemo] incremental merge rows: ${rescored.count()}")
    }
    val fresh2 = Watermarks.isFresh(
      Watermarks.sourceLastUpdate(spark, wmPath, "kev"), kevReleased)
    println(s"[cvedemo] kev fresh after tick? $fresh2 (expect true -> skip)")

    // The analytic scan alone (§3.3), with pruned projection
    val pr = spark.read.parquet(s"$work/cve_snapshot_v2")
      .groupBy("priority").agg(count(lit(1)).as("n")).orderBy("priority")
    pr.collect().foreach(r => println(s"[cvedemo] P${r.getInt(0)}: ${r.getLong(1)} CVEs"))
    spark.stop()
  }
}
