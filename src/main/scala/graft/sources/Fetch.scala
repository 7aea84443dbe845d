package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** One fetched page: which page, how many attempts it took, the raw body.
  * Top-level case class so the Dataset encoder stays codegen-compatible. */
case class FetchedPage(page: Long, attempts: Int, body: String)

/** One fetched KEY-addressed file (the cve.org per-CVE fan-out):
  * landing name, attempts, raw body. */
case class FetchedFile(name: String, attempts: Int, body: String)

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
    * closure captures only it (plus the header pairs) and is
    * executor-serializable. `headers` carries the keyed tier's
    * credential — the reference sends the api key as an HTTP header,
    * not a query param (`apikey` for NVD, nvd_handler.py:107;
    * `apiKey` for Red Hat, redhat_handler.py:74) — so it must ride
    * every page AND probe request or the keyed rate limit is refused.
    * Driven against a loopback server in FetchE2eSpec — the sandbox
    * has no egress, but nothing here knows that. */
  def httpTransport(urlFor: Long => String,
                    timeoutMs: Long = 30000L,
                    headers: Seq[(String, String)] = Nil): Long => String = { page =>
    val b = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(urlFor(page)))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = b.GET().build()
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
    * drive it transport-free. Whole-body-on-heap — use it for PROBES
    * and small endpoints; data downloads go through
    * [[downloadFileWithRetry]], which streams to disk. */
  def fetchFileWithRetry(url: String, policy: Policy,
                         sleeper: Long => Unit = Thread.sleep,
                         get: String => Array[Byte] = httpBytes(_)): Array[Byte] =
    retrying(policy, sleeper)(get(url))._1

  /** GET only the first `maxBytes` of a body: sends `Range: bytes=0-N`
    * AND reads the response as a stream it closes after `maxBytes` —
    * so the prefix stays a prefix whether or not the server honors
    * Range (a 200 full-body response is simply abandoned after the
    * first chunk). This is the freshness PROBE primitive for sources
    * whose publication stamp lives inside the file itself (the EPSS
    * metadata line, epss_handler.py:89-100; CISA KEV `dateReleased`,
    * cisa_handler.py:46-52) — at a daily cadence it turns a ~100 MB
    * no-change re-download into a ~2 KB peek. Same status contract as
    * [[httpTransport]] (206 = the Range worked). */
  def httpBytesPrefix(url: String, maxBytes: Int,
                      timeoutMs: Long = 30000L): Array[Byte] = {
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Range", s"bytes=0-${maxBytes - 1}")
      .GET().build()
    val resp = httpClient.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofInputStream())
    resp.statusCode() match {
      case 200 | 206 =>
        val in = resp.body()
        try in.readNBytes(maxBytes) finally in.close()
      case 403 | 503 =>
        resp.body().close()
        throw new TransientFetchException(s"HTTP ${resp.statusCode()} for $url")
      case other =>
        resp.body().close()
        throw new java.io.IOException(s"HTTP $other for $url")
    }
  }

  /** Streaming single-file GET: the body goes straight to `dest` (via
    * a same-directory temp file + atomic move) and never sits on the
    * driver heap — [[httpBytes]]' whole-body buffering is fine for the
    * reference's ≤ ~100 MB sources but a trap the moment someone
    * points a section at a multi-GB dump. Status contract as
    * [[httpBytes]]; a transient mid-stream failure leaves only the
    * temp file, which the retry overwrites. Returns bytes written. */
  def httpToFile(url: String, dest: java.nio.file.Path,
                 timeoutMs: Long = 30000L): Long = {
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .GET().build()
    val resp = httpClient.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofInputStream())
    resp.statusCode() match {
      case 200 =>
        val tmp = dest.resolveSibling(dest.getFileName.toString + ".inprogress")
        val in = resp.body()
        val n = try java.nio.file.Files.copy(in, tmp,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
        java.nio.file.Files.move(tmp, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        n
      case 403 | 503 =>
        resp.body().close()
        throw new TransientFetchException(s"HTTP ${resp.statusCode()} for $url")
      case other =>
        resp.body().close()
        throw new java.io.IOException(s"HTTP $other for $url")
    }
  }

  /** [[httpToFile]] under the shared bounded-retry policy — the data
    * path of every single-file source fetch. */
  def downloadFileWithRetry(url: String, policy: Policy,
                            dest: java.nio.file.Path,
                            sleeper: Long => Unit = Thread.sleep,
                            get: (String, java.nio.file.Path) => Long =
                              httpToFile(_, _)): Long =
    retrying(policy, sleeper)(get(url, dest))._1

  // ---- upstream freshness stamps (P11/S12 probe parsers) -------------
  //
  // The reference decides skip-vs-fetch per source by comparing the
  // upstream's own publication stamp against the stored
  // source_last_update (epss_handler.py:111-120, cisa_handler.py:55-77,
  // exploitdb_handler.py:42-45, metasploit_handler.py:52-55 via the
  // GitHub/GitLab last-commit endpoints in handlers/utils.py:148-222).
  // These parsers extract that stamp from the probe bodies; all are
  // total (None on malformed input — a broken probe must degrade to
  // "fetch anyway", never to a wedged source).

  /** ISO-8601-ish → Timestamp: offset forms (`2024-07-23T14:01:05.1793Z`,
    * `+00:00`) and bare local forms (assumed UTC — quirk #7's mixed
    * stamp discipline). */
  def parseIsoStamp(s: String): Option[java.sql.Timestamp] = {
    val t = s.trim
    def attempt(f: => java.time.Instant) = scala.util.Try(f).toOption
    attempt(java.time.OffsetDateTime.parse(t).toInstant)
      .orElse(attempt(java.time.Instant.parse(t)))
      .orElse(attempt(java.time.LocalDateTime.parse(t)
        .toInstant(java.time.ZoneOffset.UTC)))
      .orElse(attempt(java.time.LocalDate.parse(t)
        .atStartOfDay.toInstant(java.time.ZoneOffset.UTC)))
      .map(java.sql.Timestamp.from)
  }

  private val EpssScoreDateRe = """score_date:([^,\s]+)""".r
  private val KevDateReleasedRe = """"dateReleased"\s*:\s*"([^"]+)"""".r
  private val GithubCommitterDateRe =
    """"committer"\s*:\s*\{[^{}]*?"date"\s*:\s*"([^"]+)"""".r
  private val GitlabCreatedAtRe = """"created_at"\s*:\s*"([^"]+)"""".r

  /** The EPSS metadata comment line's `score_date`
    * (epss_handler.py:89-110: `#model_version:...,score_date:...`). */
  def parseEpssStamp(prefix: String): Option[java.sql.Timestamp] =
    EpssScoreDateRe.findFirstMatchIn(prefix)
      .flatMap(m => parseIsoStamp(m.group(1)))

  /** CISA KEV's top-of-file `dateReleased` (cisa_handler.py:49-52). */
  def parseKevStamp(prefix: String): Option[java.sql.Timestamp] =
    KevDateReleasedRe.findFirstMatchIn(prefix)
      .flatMap(m => parseIsoStamp(m.group(1)))

  /** A last-commit probe body, GitHub or GitLab shape: GitHub commits
    * carry `commit.committer.date` (utils.py:148-184), GitLab commits
    * `created_at` (utils.py:187-222). One parser handles both so a
    * `probe_url` can point at either forge. */
  def parseCommitStamp(body: String): Option[java.sql.Timestamp] =
    GithubCommitterDateRe.findFirstMatchIn(body)
      .map(_.group(1))
      .orElse(GitlabCreatedAtRe.findFirstMatchIn(body).map(_.group(1)))
      .flatMap(parseIsoStamp)

  /** Decompress up to `maxOut` bytes of a (possibly truncated) gzip
    * prefix — what makes [[httpBytesPrefix]] usable against the
    * `.csv.gz` EPSS feed: DEFLATE is a stream, so the first compressed
    * KBs yield the first plain-text lines; the inevitable EOF from the
    * truncation is the expected end, not an error. */
  def gunzipPrefix(bytes: Array[Byte], maxOut: Int = 8192): String = {
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](2048)
      var n = in.read(buf)
      while (n > 0 && out.size() < maxOut) {
        out.write(buf, 0, math.min(n, maxOut - out.size()))
        n = in.read(buf)
      }
    } catch {
      case _: java.io.EOFException => () // truncated prefix: expected
      case _: java.util.zip.ZipException => () // mid-block cut: expected
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The distributed fetch: one output row per page, pages spread over
    * `numPartitions` tasks, each task throttled independently. The
    * limiter and any transport session state live per-partition (the
    * mapPartitions body is the "open the client once" site — same shape
    * as the multimodal codec stub). */
  def fetchPages(spark: SparkSession, totalResults: Long, policy: Policy,
                 numPartitions: Int,
                 transport: Long => String,
                 fromPage: Long = 0L): Dataset[FetchedPage] = {
    import spark.implicits._
    val pages = numPages(totalResults, policy.resultsPerPage)
    // fromPage = 1 when the caller already holds page 0 — the driver's
    // totalResults probe body doubles as the landed page instead of a
    // second request against a rate-limited upstream
    spark.range(fromPage, pages, 1L, numPartitions).as[Long]
      .mapPartitions { it =>
        val limiter = new RateLimiter(policy.requestsPerWindow, policy.windowMs)
        it.map { page =>
          limiter.acquire()
          fetchWithRetry(transport, page, policy)
        }
      }
  }

  /** URL-addressed [[httpTransport]] — the transport shape of the
    * KEY-indexed fetch, where each item carries its own absolute URL
    * (the cve.org per-CVE github links) instead of deriving one from a
    * page number. Same status contract, same executor-serializable
    * closure discipline. */
  def httpUrlTransport(timeoutMs: Long = 30000L): String => String = { url =>
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .GET().build()
    val resp = httpClient.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 => resp.body()
      case 403 | 503 =>
        throw new TransientFetchException(s"HTTP ${resp.statusCode()} for $url")
      case other =>
        throw new java.io.IOException(s"HTTP $other for $url")
    }
  }

  /** [[fetchPages]] generalized from page-INDEXED to KEY-indexed: one
    * task-side GET per (name, url) item, spread over `numPartitions`
    * rate-limited partitions — the reference's per-CVE ThreadPool
    * fan-out (cveorg_handler.py:164-183) as a Spark job, so a
    * 10k-entry delta day distributes instead of serializing through
    * one driver loop, and the cluster-wide request rate stays
    * `perPartition × partitions` exactly as in the paginated path.
    * The retry loop and backoff are the shared [[Policy]] semantics. */
  def fetchKeyed(spark: SparkSession, items: Seq[(String, String)],
                 policy: Policy, numPartitions: Int,
                 transport: String => String): Dataset[FetchedFile] = {
    import spark.implicits._
    spark.createDataset(items)
      .repartition(math.max(1, math.min(numPartitions, items.size)))
      .mapPartitions { it =>
        val limiter = new RateLimiter(policy.requestsPerWindow, policy.windowMs)
        it.map { case (name, url) =>
          limiter.acquire()
          val (body, attempts) = retrying(policy, Thread.sleep)(transport(url))
          FetchedFile(name, attempts, body)
        }
      }
  }
}
