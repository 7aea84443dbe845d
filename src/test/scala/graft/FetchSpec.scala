package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import graft.sources.Fetch
import graft.sources.Fetch.{Policy, RateLimiter, TransientFetchException}

/** S1/S2 distributed-fetch skeleton: per-partition throttling + bounded
  * retry/backoff on a simulated flaky source (no network in the sandbox). */
class FetchSpec extends SparkSpec {

  test("rate limiter: N acquisitions pass, the N+1st waits out the window") {
    var now = 0L
    val sleeps = scala.collection.mutable.ListBuffer.empty[Long]
    val rl = new RateLimiter(maxRequests = 3, windowMs = 30000L,
      clock = () => now, sleeper = ms => { sleeps += ms; now += ms })
    (1 to 3).foreach { _ => rl.acquire(); now += 1000 }
    assert(sleeps.isEmpty) // under budget: no waiting
    rl.acquire() // 4th within the window must wait until the 1st expires
    assert(sleeps == Seq(27000L)) // window 30000 - elapsed 3000
    // after the wait the window has room again without sleeping
    now += 1000; rl.acquire()
    assert(sleeps.size == 1)
  }

  test("retry: transient failures back off retryDelayMs and then succeed") {
    val sleeps = scala.collection.mutable.ListBuffer.empty[Long]
    var calls = 0
    val transport = (page: Long) => {
      calls += 1
      if (calls <= 2) throw new TransientFetchException("503") else s"page-$page"
    }
    val r = Fetch.fetchWithRetry(transport, 7L, Policy(retryDelayMs = 30000L),
      sleeper = sleeps += _)
    assert(r == sources.FetchedPage(7L, 3, "page-7"))
    assert(sleeps == Seq(30000L, 30000L)) // reference retry_delay per failure
  }

  test("retry: gives up after retryLimit attempts") {
    var calls = 0
    intercept[TransientFetchException] {
      Fetch.fetchWithRetry(
        (_: Long) => { calls += 1; throw new TransientFetchException("403") },
        0L, Policy(retryLimit = 3), sleeper = _ => ())
    }
    assert(calls == 3)
  }

  test("paging math mirrors the reference ceil-div") {
    assert(Fetch.numPages(0, 2000) == 0)
    assert(Fetch.numPages(1, 2000) == 1)
    assert(Fetch.numPages(2000, 2000) == 1)
    assert(Fetch.numPages(2001, 2000) == 2)
  }

  test("distributed fetch: every page exactly once, retries stay in-task") {
    // Flaky transport: pages divisible by 5 fail on their first attempt.
    // State lives in a shared JVM map (local mode) keyed by page.
    FetchSpec.attempts.clear()
    val transport = (page: Long) => {
      val n = FetchSpec.attempts
        .computeIfAbsent(page, _ => new AtomicInteger).incrementAndGet()
      if (page % 5 == 0 && n == 1) throw new TransientFetchException("503")
      s"body-$page"
    }
    // 23 pages of 2000 over 4 partitions; tiny retry delay to keep the
    // spec fast (the delay VALUE is asserted in the unit test above).
    val out = Fetch.fetchPages(spark, totalResults = 45001L,
      Policy(retryDelayMs = 1L), numPartitions = 4, transport).collect()
    assert(out.length == 23)
    assert(out.map(_.page).sorted.toSeq == (0L until 23L))
    out.foreach { p =>
      assert(p.attempts == (if (p.page % 5 == 0) 2 else 1))
      assert(p.body == s"body-${p.page}")
    }
  }

  test("keyed fetch: one row per (name, url) item, retries stay in-task") {
    // the cve.org per-CVE fan-out shape: each item carries its own URL;
    // urls ending in an even digit fail once before succeeding
    FetchSpec.keyedAttempts.clear()
    val items = (1 to 11).map(i => (f"CVE-2025-$i%04d", s"https://x/rec/$i"))
    val transport = (url: String) => {
      val n = FetchSpec.keyedAttempts
        .computeIfAbsent(url, _ => new AtomicInteger).incrementAndGet()
      val i = url.split("/").last.toInt
      if (i % 2 == 0 && n == 1) throw new TransientFetchException("503")
      s"body-$i"
    }
    val out = Fetch.fetchKeyed(spark, items, Policy(retryDelayMs = 1L),
      numPartitions = 3, transport).collect()
    assert(out.length == 11)
    assert(out.map(_.name).sorted.toSeq == items.map(_._1).sorted)
    out.foreach { f =>
      val i = f.name.split("-").last.toInt
      assert(f.body == s"body-$i")
      assert(f.attempts == (if (i % 2 == 0) 2 else 1))
    }
  }

  // ---- upstream freshness-stamp parsers (P11/S12 probe primitives) ----
  // All must be TOTAL: garbage input yields None (a broken probe must
  // degrade to "fetch anyway", never wedge a source or throw).

  private def instant(s: String) = java.time.Instant.parse(s)

  test("parseIsoStamp: offset, Z, bare-local and bare-date forms; None on garbage") {
    assert(Fetch.parseIsoStamp("2024-07-23T14:01:05.1793Z").get.toInstant ==
      instant("2024-07-23T14:01:05.179300Z"))
    assert(Fetch.parseIsoStamp("2024-07-23T14:01:05+02:00").get.toInstant ==
      instant("2024-07-23T12:01:05Z"))
    // bare local forms are assumed UTC (quirk #7's mixed stamp discipline)
    assert(Fetch.parseIsoStamp("2024-07-23T14:01:05").get.toInstant ==
      instant("2024-07-23T14:01:05Z"))
    assert(Fetch.parseIsoStamp(" 2024-07-23 ").get.toInstant ==
      instant("2024-07-23T00:00:00Z"))
    assert(Fetch.parseIsoStamp("not-a-date").isEmpty)
    assert(Fetch.parseIsoStamp("").isEmpty)
  }

  test("parseEpssStamp: the metadata comment line's score_date; None when absent") {
    val prefix = "#model_version:v2025.03.14,score_date:2025-08-14T12:55:00Z\n" +
      "cve,epss,percentile\nCVE-2025-0001,0.97,0.999\n"
    assert(Fetch.parseEpssStamp(prefix).get.toInstant ==
      instant("2025-08-14T12:55:00Z"))
    assert(Fetch.parseEpssStamp("cve,epss,percentile\n").isEmpty)
    assert(Fetch.parseEpssStamp("#model_version:v1,score_date:garbage\n").isEmpty)
  }

  test("parseKevStamp: top-of-file dateReleased; None when absent/malformed") {
    val prefix = """{"title": "CISA KEV", "catalogVersion": "2025.08.14",
      "dateReleased": "2025-08-14T13:06:48.1011Z", "count": 1422,"""
    assert(Fetch.parseKevStamp(prefix).get.toInstant ==
      instant("2025-08-14T13:06:48.101100Z"))
    assert(Fetch.parseKevStamp("""{"title": "no stamp here"}""").isEmpty)
    assert(Fetch.parseKevStamp("""{"dateReleased": 42}""").isEmpty)
  }

  test("parseCommitStamp: GitHub committer.date and GitLab created_at shapes") {
    val github = """[{"sha": "abc", "commit": {"author": {"name": "x",
      "date": "2025-08-10T00:00:00Z"}, "committer": {"name": "y",
      "date": "2025-08-13T09:30:00Z"}, "message": "update"}}]"""
    assert(Fetch.parseCommitStamp(github).get.toInstant ==
      instant("2025-08-13T09:30:00Z"))
    val gitlab = """[{"id": "def", "created_at": "2025-08-12T08:00:00.000+02:00",
      "title": "update"}]"""
    assert(Fetch.parseCommitStamp(gitlab).get.toInstant ==
      instant("2025-08-12T06:00:00Z"))
    assert(Fetch.parseCommitStamp("""{"message": "rate limited"}""").isEmpty)
  }

  test("gunzipPrefix: a truncated gzip prefix yields the leading plain text") {
    val text = (0 until 2000).map(i => s"CVE-2025-$i,0.5,0.9").mkString(
      "#model_version:v1,score_date:2025-08-14T00:00:00Z\n", "\n", "\n")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(text.getBytes("UTF-8")); gz.close()
    val whole = bos.toByteArray
    // a ranged peek sees only the first KBs of the compressed stream:
    // the cut lands mid-block — expected, not an error
    val out = Fetch.gunzipPrefix(whole.take(2048))
    assert(out.startsWith("#model_version:v1,score_date:2025-08-14T00:00:00Z\n"))
    assert(Fetch.parseEpssStamp(out).nonEmpty)
    // maxOut caps the inflated size even when more is decodable
    assert(Fetch.gunzipPrefix(whole, maxOut = 64).length == 64)
    // non-gzip garbage degrades to empty, never throws
    assert(Fetch.gunzipPrefix(Array[Byte](1, 2, 3)) == "")
    assert(Fetch.gunzipPrefix(Array.emptyByteArray) == "")
  }
}

object FetchSpec {
  /** Shared across executor threads in local mode. */
  val attempts = new ConcurrentHashMap[Long, AtomicInteger]()
  val keyedAttempts = new ConcurrentHashMap[String, AtomicInteger]()
}
