package graft

import java.sql.Timestamp
import java.time.Instant

import graft.operators.Watermarks

class WatermarksSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  test("K3/T2: upsert + read-back round-trip, per-source isolation") {
    val dir = java.nio.file.Files.createTempDirectory("wm").toString + "/status"
    assert(Watermarks.lastUpdated(spark, dir, "nvd").isEmpty)
    Watermarks.upsert(spark, dir, "nvd", ts("2025-04-01T00:00:00Z"))
    Watermarks.upsert(spark, dir, "epss", ts("2025-04-02T00:00:00Z"),
      Some(ts("2025-04-01T12:00:00Z")))
    assert(Watermarks.lastUpdated(spark, dir, "nvd").get == ts("2025-04-01T00:00:00Z"))
    assert(Watermarks.lastUpdated(spark, dir, "epss").get == ts("2025-04-02T00:00:00Z"))
    assert(Watermarks.sourceLastUpdate(spark, dir, "epss").get == ts("2025-04-01T12:00:00Z"))
    // re-upsert advances last_updated, preserves source stamp when omitted
    Watermarks.upsert(spark, dir, "epss", ts("2025-04-03T00:00:00Z"))
    assert(Watermarks.lastUpdated(spark, dir, "epss").get == ts("2025-04-03T00:00:00Z"))
    assert(Watermarks.sourceLastUpdate(spark, dir, "epss").get == ts("2025-04-01T12:00:00Z"))
  }

  test("T3: window start falls back to 24h lookback on cold start") {
    val dir = java.nio.file.Files.createTempDirectory("wm2").toString + "/status"
    val now = ts("2025-04-10T12:00:00Z")
    assert(Watermarks.windowStart(spark, dir, "nvd", now) == ts("2025-04-09T12:00:00Z"))
    Watermarks.upsert(spark, dir, "nvd", ts("2025-04-10T00:00:00Z"))
    assert(Watermarks.windowStart(spark, dir, "nvd", now) == ts("2025-04-10T00:00:00Z"))
  }

  test("P11: freshness short-circuit semantics") {
    assert(Watermarks.isFresh(Some(ts("2025-04-02T00:00:00Z")), ts("2025-04-01T00:00:00Z")))
    assert(Watermarks.isFresh(Some(ts("2025-04-01T00:00:00Z")), ts("2025-04-01T00:00:00Z")))
    assert(!Watermarks.isFresh(Some(ts("2025-04-01T00:00:00Z")), ts("2025-04-02T00:00:00Z")))
    assert(!Watermarks.isFresh(None, ts("2025-04-01T00:00:00Z")))
  }
}
