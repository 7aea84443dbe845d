package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The prioritization scan (SURVEY.md §3.3, D2) — the reference's one
  * analytic query, disabled+broken in situ (quirk #3); we implement the
  * evident intent (handlers/prioritizer_handler.py:22-48) as a pure Column
  * expression: no UDF, fully codegen'd, runs as a narrow projection over
  * the snapshot (the only shuffle is the merge write-back).
  */
object Prioritizer {
  val CvssThreshold = 6.0 // prioritizer_handler.py:18
  val EpssThreshold = 0.2 // prioritizer_handler.py:19

  /** F16/F17: CVSS base score coalesce ladder v3.1 → v3.0 → v2, absent → 0
    * (prioritizer_handler.py:31-36). `nvd` is the NVD struct column.
    * `get` (0-based) is null-safe on empty arrays where ANSI-mode
    * element_at would throw. */
  def cvssBase(nvd: Column): Column = coalesce(
    get(nvd.getField("metrics").getField("cvssMetricV31"), lit(0))
      .getField("cvssData").getField("baseScore"),
    get(nvd.getField("metrics").getField("cvssMetricV30"), lit(0))
      .getField("cvssData").getField("baseScore"),
    get(nvd.getField("metrics").getField("cvssMetricV2"), lit(0))
      .getField("cvssData").getField("baseScore"),
    lit(0.0))

  /** F18: the priority ladder (prioritizer_handler.py:40-48):
    * kev present → 1; cvss≥6 ∧ epss≥0.2 → 1; cvss≥6 → 2; epss≥0.2 → 3;
    * else 4. Null epss counts as 0 (`float(... or 0)` at :38). */
  def priority(kev: Column, cvss: Column, epss: Column): Column = {
    val e = coalesce(epss, lit(0.0))
    when(kev.isNotNull, 1)
      .when(cvss >= CvssThreshold && e >= EpssThreshold, 1)
      .when(cvss >= CvssThreshold, 2)
      .when(e >= EpssThreshold, 3)
      .otherwise(4)
  }

  /** Full scorer over a merged snapshot with `nvd`, `kev`, `epss` columns
    * (P3: only these are read — Catalyst prunes the rest). */
  def score(nvd: Column, kev: Column, epss: Column): Column =
    priority(kev, cvssBase(nvd), epss.getField("epss_score"))
}
