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
}

object FetchSpec {
  /** Shared across executor threads in local mode. */
  val attempts = new ConcurrentHashMap[Long, AtomicInteger]()
}
