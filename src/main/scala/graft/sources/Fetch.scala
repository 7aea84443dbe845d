package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** One fetched page: which page, how many attempts it took, the raw body.
  * Top-level case class so the Dataset encoder stays codegen-compatible. */
case class FetchedPage(page: Long, attempts: Int, body: String)

/** S1/S2 distributed fetch skeleton (SURVEY §2.1): the reference's
  * paginated-HTTP ingestion (datasources/nvd_handler.py:90-120, threaded
  * variant `nvd_handler copy.py:64-107,150-170`) re-expressed as a Spark
  * job — `spark.range(numPages)` spread over N partitions, each partition
  * pulling its pages through a per-partition rolling-window rate limiter
  * with bounded retry/backoff.
  *
  * The transport is an injected `Long => String` (page → body): the
  * sandbox has zero egress, so specs drive it with a simulated flaky
  * source, and production swaps in an HTTP client without touching the
  * distribution/throttle/retry logic — which is the part that matters on a
  * cluster: the cluster-wide request rate is `perPartition × partitions`,
  * so callers size `numPartitions = globalBudget / perPartitionRate`, and
  * a retry burns budget inside its own partition's window only.
  *
  * Defaults mirror the reference (configuration.ini.template:19-25;
  * nvd_handler.py:44-49): 2000 results/page, 3 attempts, 30 s retry
  * delay, 50 requests / 30 s rolling window.
  */
object Fetch {

  /** Thrown by a transport for a retryable failure (403/503 in the
    * reference's loop, `nvd_handler copy.py:72-82`). Anything else
    * propagates immediately and fails the task. */
  class TransientFetchException(msg: String) extends RuntimeException(msg)

  case class Policy(
      resultsPerPage: Int = 2000,
      retryLimit: Int = 3,       // total attempts (retry_limit)
      retryDelayMs: Long = 30000L,
      requestsPerWindow: Int = 50,
      windowMs: Long = 30000L)

  /** ceil(totalResults / perPage) — A3 paging math (nvd_handler
    * `copy.py:156-158`); also oracle-gated as q27. */
  def numPages(totalResults: Long, resultsPerPage: Int): Long =
    (totalResults + resultsPerPage - 1) / resultsPerPage

  /** The `totalResults` field of a paginated envelope body — the probe
    * that sizes the distributed fetch (the reference reads it off the
    * first response, nvd_handler `copy.py:156`). Loud on a body without
    * one: silently fetching zero pages is the failure mode this guards. */
  private val TotalRe = """"totalResults"\s*:\s*(\d+)""".r
  def parseTotalResults(body: String): Long =
    TotalRe.findFirstMatchIn(body).map(_.group(1).toLong).getOrElse(
      throw new IllegalArgumentException(
        "paginated response body carries no totalResults field"))

  /** Rolling-window rate limiter: at most `maxRequests` acquisitions per
    * trailing `windowMs`. One instance per partition (constructed inside
    * mapPartitions — never serialized, never shared across executors).
    * `clock`/`sleeper` injectable for deterministic specs. */
  final class RateLimiter(maxRequests: Int, windowMs: Long,
                          clock: () => Long = () => System.currentTimeMillis(),
                          sleeper: Long => Unit = Thread.sleep) {
    // Reachable straight from config ([nvd] public_rate_limit: 0) — fail
    // with a message at construction, not a NoSuchElementException from
    // inside an executor task.
    require(maxRequests > 0, s"rate limit must be positive, got $maxRequests")
    require(windowMs > 0, s"rate window must be positive, got $windowMs")
    private val stamps = scala.collection.mutable.Queue.empty[Long]
    def acquire(): Unit = {
      var now = clock()
      def evict(): Unit =
        while (stamps.nonEmpty && now - stamps.head >= windowMs) stamps.dequeue()
      evict()
      while (stamps.size >= maxRequests) {
        sleeper(windowMs - (now - stamps.head))
        now = clock(); evict()
      }
      stamps.enqueue(now)
    }
  }

  /** THE bounded retry loop — one implementation of the policy's
    * semantics (total attempts = retryLimit, sleep retryDelayMs after
    * a transient failure only), shared by the paginated and
    * single-file paths so they cannot drift. Returns the value and
    * the attempt count that produced it. */
  private def retrying[T](policy: Policy, sleeper: Long => Unit)
                         (op: => T): (T, Int) = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return (op, attempt)
      catch {
        case e: TransientFetchException =>
          if (attempt >= policy.retryLimit) throw e
          sleeper(policy.retryDelayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One page with the reference's bounded retry loop. */
  def fetchWithRetry(transport: Long => String, page: Long, policy: Policy,
                     sleeper: Long => Unit = Thread.sleep): FetchedPage = {
    val (body, attempts) = retrying(policy, sleeper)(transport(page))
    FetchedPage(page, attempts, body)
  }

  /** One HTTP client per JVM — java.net.http.HttpClient is thread-safe
    * and meant to be shared; living on the object (static access from
    * executor closures) it is never serialized and opens once per
    * executor, the "open the client once" site the mapPartitions shape
    * reserves. */
  @transient private lazy val httpClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30)).build()

  /** A REAL socket transport for [[fetchPages]] (JDK-native client, no
    * extra deps): GET `urlFor(page)`; 200 → body, 403/503 → retryable
    * [[TransientFetchException]] (the reference's retry statuses,
    * `nvd_handler copy.py:72-82` — NVD rate-limits with 403), anything
    * else fails the task loudly. `urlFor` is the page→URL map (the NVD
    * shape is `...?resultsPerPage=N&startIndex=page*N`); the returned
    * closure captures only it and is executor-serializable. Driven
    * against a loopback server in FetchE2eSpec — the sandbox has no
    * egress, but nothing here knows that. */
  def httpTransport(urlFor: Long => String,
                    timeoutMs: Long = 30000L): Long => String = { page =>
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(urlFor(page)))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .GET().build()
    val resp = httpClient.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 => resp.body()
      case 403 | 503 =>
        throw new TransientFetchException(s"HTTP ${resp.statusCode()} for page $page")
      case other =>
        throw new java.io.IOException(s"HTTP $other for page $page")
    }
  }

  /** Single-file GET returning raw BYTES — EPSS ships `.csv.gz` and CWE
    * `.xml.zip`, and a String round-trip would corrupt either
    * (handlers/utils.py:87 reads `response.content` for the same
    * reason). Same status contract as [[httpTransport]]: 200 → body,
    * 403/503 → retryable, anything else loud. */
  def httpBytes(url: String, timeoutMs: Long = 30000L): Array[Byte] = {
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .GET().build()
    val resp = httpClient.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    resp.statusCode() match {
      case 200 => resp.body()
      case 403 | 503 =>
        throw new TransientFetchException(s"HTTP ${resp.statusCode()} for $url")
      case other =>
        throw new java.io.IOException(s"HTTP $other for $url")
    }
  }

  /** The reference's single-file download with bounded retry
    * (handlers/utils.py:56-141 download_file + the per-handler retry
    * policy): driver-side control plane — these sources arrive as ONE
    * file per tick, never through executors. `get` injectable so specs
    * drive it transport-free. */
  def fetchFileWithRetry(url: String, policy: Policy,
                         sleeper: Long => Unit = Thread.sleep,
                         get: String => Array[Byte] = httpBytes(_)): Array[Byte] =
    retrying(policy, sleeper)(get(url))._1

  /** The distributed fetch: one output row per page, pages spread over
    * `numPartitions` tasks, each task throttled independently. The
    * limiter and any transport session state live per-partition (the
    * mapPartitions body is the "open the client once" site — same shape
    * as the multimodal codec stub). */
  def fetchPages(spark: SparkSession, totalResults: Long, policy: Policy,
                 numPartitions: Int,
                 transport: Long => String): Dataset[FetchedPage] = {
    import spark.implicits._
    val pages = numPages(totalResults, policy.resultsPerPage)
    spark.range(0L, pages, 1L, numPartitions).as[Long]
      .mapPartitions { it =>
        val limiter = new RateLimiter(policy.requestsPerWindow, policy.windowMs)
        it.map { page =>
          limiter.acquire()
          fetchWithRetry(transport, page, policy)
        }
      }
  }
}
