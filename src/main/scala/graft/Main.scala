package graft

import java.nio.file.{Files, Paths => JPaths}
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.CvePipeline.Landing

/** The CLI entry — the reference's `main.py` surface re-expressed over
  * the Spark engine: `-d/--debug` and `-c/--config` flags
  * (main.py:41-47), the startup banner (main.py:31-39), a scheduler that
  * computes the first run's delay from the last committed run and the
  * configured interval (calculate_initial_delay, main.py:107-117;
  * setup_schedule, main.py:124-148), and graceful signal shutdown
  * (handle_shutdown, main.py:160-169) via a JVM shutdown hook flipping
  * the loop's cooperative stop flag.
  *
  * Where the reference fetches straight into Mongo, this engine's tick
  * consumes a LANDED directory per tick (the zero-egress seam the fetch
  * path writes into, sources/Fetch + sources/Landing): `main` probes
  * `<root>/landing/<seq>/` for the upstreams' own filenames — the same
  * names the reference downloads (`files_exploits.csv`,
  * `modules_metadata_base.json`, `known_exploited_vulnerabilities.json`,
  * …) — and hands DailyLoop whatever landed. Missing files simply mean
  * "that source didn't land today" (the reference's per-handler
  * try/except skip).
  *
  * Everything here is driver-side control plane: argument parsing, delay
  * arithmetic, a directory probe. The data plane stays in DailyLoop /
  * CveJob, already bounded per tick.
  */
object Main {

  /** Parsed CLI flags — argparse surface plus the landing-root and
    * run-mode knobs a fetchless deployment needs. */
  final case class Args(
      debug: Boolean = false,
      config: String = "configuration.ini",
      root: String = "graft-data",
      once: Boolean = false,
      fetch: Boolean = false,
      help: Boolean = false)

  val usage: String =
    """usage: graft [-h] [-d] [-c CONFIG] [--root DIR] [--once] [--fetch]
      |
      |CVE Data Handling Script
      |
      |  -h, --help             show this help message and exit
      |  -d, --debug            Set log level to DEBUG
      |  -c, --config CONFIG    Specify a configuration file (default: configuration.ini)
      |  --root DIR             Data root: snapshot, index, landing dirs (default: graft-data)
      |  --once                 Run one tick immediately and exit (no scheduler loop)
      |  --fetch                Fetch configured HTTP sources into the landing dir before each tick
      |""".stripMargin

  /** argparse analog: unknown flags and missing option values are
    * errors (Left), not silent defaults. */
  def parseArgs(argv: Seq[String]): Either[String, Args] = {
    @annotation.tailrec
    def go(rest: List[String], acc: Args): Either[String, Args] = rest match {
      case Nil => Right(acc)
      case ("-h" | "--help") :: t => go(t, acc.copy(help = true))
      case ("-d" | "--debug") :: t => go(t, acc.copy(debug = true))
      case ("-c" | "--config") :: v :: t if !v.startsWith("-") =>
        go(t, acc.copy(config = v))
      case ("-c" | "--config") :: _ =>
        Left("argument -c/--config: expected one argument")
      case "--root" :: v :: t if !v.startsWith("-") =>
        go(t, acc.copy(root = v))
      case "--root" :: _ => Left("argument --root: expected one argument")
      case "--once" :: t => go(t, acc.copy(once = true))
      case "--fetch" :: t => go(t, acc.copy(fetch = true))
      case other :: _ => Left(s"unrecognized arguments: $other")
    }
    go(argv.toList, Args())
  }

  /** calculate_initial_delay (main.py:107-117): no last run → run now;
    * more than one interval elapsed → run now; otherwise the remainder
    * of the interval. Millis, never negative. */
  def initialDelayMs(lastRun: Option[Timestamp], intervalHours: Double,
                     now: Timestamp): Long = lastRun match {
    case None => 0L
    case Some(last) =>
      val intervalMs = (intervalHours * 3600 * 1000).toLong
      val elapsed = now.getTime - last.getTime
      if (elapsed >= intervalMs) 0L else intervalMs - elapsed
  }

  /** convert_hours_to_hms (main.py:49-55) on millis, for log lines. */
  def formatDelay(ms: Long): String = {
    val h = ms / 3600000L
    val m = (ms % 3600000L) / 60000L
    val s = (ms % 60000L) / 1000L
    s"${h}h ${m}min ${s}s"
  }

  /** Completion marker a finished fetch writes into its landing dir:
    * the tick's delta must be a FUNCTION OF ITS SEQ for the one-marker
    * crash model to hold (every pre-commit step is idempotent only
    * under a re-run with the SAME delta). A re-fetch on a crash re-run
    * would pull LIVE upstream data that may differ between attempts —
    * so a landed dir is fetched exactly once, and re-runs consume the
    * identical files the crashed attempt saw. Crash MID-fetch leaves
    * no marker and the re-run re-fetches from scratch (landPages wipes
    * its dir; single-file lands overwrite). */
  val LandedMarker = "_LANDED"

  /** The single-file sources the reference's job fetches besides NVD
    * (main.py:64-89: ExploitDB, Metasploit, CWE, EPSS, CISA KEV —
    * downloads via handlers/utils.py:56-141), each mapped to its
    * canonical landing filename (the names [[landingFrom]] probes;
    * CWE lands as the archive plus its extracted XML for the S10/J4
    * cross-ref consumer — it enriches no snapshot envelope). */
  val SingleFileSources: Seq[(String, String)] = Seq(
    "exploitdb" -> "files_exploits.csv",
    "metasploit" -> "modules_metadata_base.json",
    "cwe" -> "cwec_latest.xml.zip",
    "epss" -> "epss_scores.csv.gz",
    "cisa" -> "known_exploited_vulnerabilities.json")

  /** The in-process networked fetch (--fetch): pull each configured
    * HTTP source into the tick's landing dir BEFORE the tick consumes
    * it — the reference's main.py:64-89 shape, where fetching and
    * merging live in one process. A source fetches when its config
    * section carries a `url`; NVD is the paginated one (probe page 0
    * for totalResults, ceil-div into pages, distributed rate-limited
    * pull — the whole Fetch/Landing S1 machinery over a real socket);
    * the other five are driver-side single-file GETs with the same
    * bounded-retry policy. Gzip sources land compressed (Hadoop codecs
    * decompress on read); zip sources additionally extract their
    * single member beside the archive (the reference's transparent
    * decompress, handlers/utils.py:105-124). An already-landed dir
    * (marker present) is reused verbatim — see [[LandedMarker]]. */
  def fetchLanding(spark: SparkSession, conf: Config.Conf, dir: String): Unit = {
    val marker = JPaths.get(dir, LandedMarker)
    if (Files.exists(marker)) {
      Log.info(s"[fetch] $dir already landed — re-run consumes the " +
        "identical delta (no re-fetch)", "main")
      return
    }
    conf.get("nvd", "url").foreach { base =>
      val policy = conf.fetchPolicy("nvd")
      val transport = graft.sources.Fetch.httpTransport(p =>
        s"$base?resultsPerPage=${policy.resultsPerPage}" +
          s"&startIndex=${p * policy.resultsPerPage}")
      val total = graft.sources.Fetch.parseTotalResults(
        graft.sources.Fetch.fetchWithRetry(transport, 0L, policy).body)
      val landed = graft.sources.Landing.landPages(
        graft.sources.Fetch.fetchPages(spark, total, policy,
          numPartitions = conf.getInt("nvd", "fetch_partitions", 2),
          transport),
        s"$dir/nvd_pages")
      Log.info(s"[nvd] Landed $landed pages ($total results) into $dir/nvd_pages", "main")
    }
    SingleFileSources.foreach { case (section, name) =>
      conf.get(section, "url").foreach { url =>
        val bytes = graft.sources.Fetch.fetchFileWithRetry(
          url, conf.fetchPolicy(section))
        val landed = graft.sources.Landing.landBytes(dir, name, bytes)
        if (name.endsWith(".zip")) {
          val member = graft.sources.Landing.extractSingleMemberZip(landed, dir)
          val canonical = JPaths.get(dir, name.stripSuffix(".zip"))
          if (JPaths.get(member) != canonical)
            Files.move(JPaths.get(member), canonical,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        Log.info(s"[$section] Landed $name (${bytes.length} bytes) into $dir", "main")
      }
    }
    Files.createDirectories(JPaths.get(dir))
    Files.createFile(marker); ()
  }

  /** Probe a landed tick directory for the upstreams' canonical
    * filenames. EPSS may land gzipped (the upstream ships .csv.gz,
    * epss_handler.py:21); first match wins. NVD may also be a landed
    * PAGES directory — what [[fetchLanding]] writes. */
  def landingFrom(dir: String): Landing = {
    def f(names: String*): Option[String] =
      names.map(n => JPaths.get(dir, n))
        .find(Files.exists(_)).map(_.toString)
    Landing(
      nvd = f("nvd_page.json", "nvd.json")
        .orElse(f("nvd_pages").filter(p => Files.isDirectory(JPaths.get(p)))),
      epss = f("epss_scores.csv.gz", "epss_scores.csv"),
      exploitDb = f("files_exploits.csv"),
      kev = f("known_exploited_vulnerabilities.json"),
      metasploit = f("modules_metadata_base.json"),
      debian = f("debian.json"),
      cveOrgDir = f("cveorg").filter(p => Files.isDirectory(JPaths.get(p))),
      redhat = f("redhat_page.json", "redhat.json"))
  }

  /** The tick's document delta: `documents.parquet` under the landed
    * dir, or an empty (zero-row, correct-schema) delta when none landed
    * — a CVE-only day still merges and commits. */
  def docsDeltaFrom(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = JPaths.get(dir, "documents.parquet")
    if (Files.exists(p)) spark.read.parquet(p.toString).select("doc_id", "text")
    else Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  /** The tick's removal sets: `removals.parquet` (doc_id) deletes
    * documents, `vec_removals.parquet` (vec_id) deletes embeddings —
    * both propagate as tombstones through every persisted store
    * (DailyLoop's delete lifecycle). Absent file = nothing removed. */
  def removalsFrom(spark: SparkSession, dir: String,
                   file: String, idCol: String): Option[DataFrame] = {
    val p = JPaths.get(dir, file)
    if (Files.exists(p)) Some(spark.read.parquet(p.toString).select(idCol))
    else None
  }

  /** The tick's embedding delta (`embeddings.parquet`), None when none
    * landed — unlike docs, an ABSENT delta must skip the ANN step
    * entirely (a zero-row day-zero build would train an empty, useless
    * codebook). `label` rides along when present: it is what lets the
    * tick also maintain the IVF posting store (DailyLoop step 2c). */
  def embDeltaFrom(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = JPaths.get(dir, "embeddings.parquet")
    if (Files.exists(p)) {
      val df = spark.read.parquet(p.toString)
      val cols = Seq("vec_id", "embedding") ++
        (if (df.columns.contains("label")) Seq("label") else Nil)
      Some(df.select(cols.map(org.apache.spark.sql.functions.col): _*))
    } else None
  }

  private val Banner =
    """   ____ ____      _    _____ _____
      |  / ___|  _ \    / \  |  ___|_   _|
      | | |  _| |_) |  / _ \ | |_    | |
      | | |_| |  _ <  / ___ \|  _|   | |
      |  \____|_| \_\/_/   \_\_|     |_|   v0.1
      |""".stripMargin

  /** The scheduler run, factored for the spec: probes the marker clock,
    * logs the reference's scheduler lines, and drives DailyLoop.loop
    * until `stop` flips (or one tick in `once` mode). Returns ticks
    * run. */
  def run(spark: SparkSession, conf: Config.Conf, root: String,
          once: Boolean, stop: AtomicBoolean,
          clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
          sleepMs: Long = 1000L, fetch: Boolean = false): Int = {
    val p = DailyLoop.Paths(root)
    val intervalHours = conf.schedulerIntervalHours(default = 24)
    val threshold = conf.get("dedup", "threshold").map(_.toDouble).getOrElse(0.8)
    val maxChain = conf.getInt("dedup", "max_chain", Int.MaxValue)
    val annMaxChain = conf.getInt("dedup", "ann_max_chain", Int.MaxValue)
    val pairRebuildEvery = conf.getInt("dedup", "pair_rebuild_every", 0)
    val annRefreshEvery = conf.getInt("dedup", "ann_refresh_every", 0)
    def landing(seq: Long) = {
      val dir = s"$root/landing/$seq"
      if (fetch) fetchLanding(spark, conf, dir)
      landingFrom(dir)
    }
    def delta(seq: Long) = docsDeltaFrom(spark, s"$root/landing/$seq")
    def emb(seq: Long) = embDeltaFrom(spark, s"$root/landing/$seq")
    def docRem(seq: Long) = removalsFrom(spark, s"$root/landing/$seq",
      "removals.parquet", "doc_id")
    def vecRem(seq: Long) = removalsFrom(spark, s"$root/landing/$seq",
      "vec_removals.parquet", "vec_id")

    if (once) {
      Log.info("[Job] Starting", "main")
      val t0 = System.nanoTime()
      // --once is still a WRITER: it takes the same single-writer lease
      // as the loop (with a heartbeat through the tick), so a one-shot
      // run can neither interleave with a running loop nor with a
      // second concurrent --once against the same root
      val holder = java.net.InetAddress.getLocalHost.getHostName +
        ":" + ProcessHandle.current().pid() + ":once:" +
        java.util.UUID.randomUUID()
      DailyLoop.acquireLease(spark, p, holder)
      val hb = new DailyLoop.LeaseHeartbeat(spark, p, holder,
        DailyLoop.LeaseStaleMs)
      try {
        val seq = DailyLoop.committedTick(spark, p)._1 + 1
        DailyLoop.runTick(spark, landing(seq), delta(seq), p, clock(),
          threshold, maxChain, embDelta = emb(seq), annMaxChain = annMaxChain,
          docRemovals = docRem(seq), vecRemovals = vecRem(seq),
          pairRebuildEvery = pairRebuildEvery,
          annRefreshEvery = annRefreshEvery,
          leaseCheck = () => hb.check())
        // surface a loss the heartbeat observed during the tick's last
        // step loudly, even though the tick itself is already done
        hb.check()
      } finally { hb.close(); DailyLoop.releaseLease(spark, p, Some(holder)) }
      Log.success(f"[Job] Finished in ${(System.nanoTime() - t0) / 1e9}%.2f seconds.", "main")
      1
    } else {
      val (_, last) = DailyLoop.committedTick(spark, p)
      val delay = initialDelayMs(last, intervalHours, clock())
      if (delay > 0)
        Log.info(s"[Scheduler] Initial job to run in ${formatDelay(delay)}.", "main")
      // whole hours log as "24h", fractional as-is ("0.5h") — the float
      // scheduler semantics of main.py:210
      val ih = if (intervalHours == intervalHours.toLong.toDouble)
        intervalHours.toLong.toString else intervalHours.toString
      Log.info(s"[Scheduler] Update frequency: every ${ih}h", "main")
      val ticks = DailyLoop.loop(spark, landing, delta, p, intervalHours,
        shouldStop = () => stop.get(), clock = clock,
        threshold = threshold, maxChain = maxChain, sleepMs = sleepMs,
        embDelta = emb, annMaxChain = annMaxChain,
        docRemovals = docRem, vecRemovals = vecRem,
        pairRebuildEvery = pairRebuildEvery,
        annRefreshEvery = annRefreshEvery)
      Log.info("[Scheduler] Shutdown event detected. Exiting scheduler loop.", "main")
      ticks
    }
  }

  def main(argv: Array[String]): Unit = {
    parseArgs(argv.toSeq) match {
      case Left(err) =>
        Console.err.println(s"error: $err"); Console.err.println(usage)
        sys.exit(2)
      case Right(a) if a.help =>
        println(usage)
      case Right(a) =>
        println(Banner)
        Log.setMaxLevel(if (a.debug) "DEBUG" else "INFO")
        val conf =
          if (Files.exists(JPaths.get(a.config)))
            Config.parse(new String(Files.readAllBytes(JPaths.get(a.config))))
          else {
            Log.warning(s"config ${a.config} not found; using defaults", "main")
            Config.parse("")
          }
        val stop = new AtomicBoolean(false)
        val drained = new java.util.concurrent.CountDownLatch(1)
        // handle_shutdown analog: SIGINT/SIGTERM run JVM shutdown hooks.
        // Setting the flag alone would NOT finish the in-flight tick —
        // the JVM halts every thread the moment its hooks return — so
        // the hook also BLOCKS on the drain latch until the loop exits
        // cooperatively (tick commit marker included), mirroring the
        // reference's scheduler-thread join-on-event shutdown.
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          Log.info("Shutdown signal received. Initiating graceful shutdown...", "main")
          stop.set(true)
          drained.await()
        }))
        val spark = GraftSession.build()
        try run(spark, conf, a.root, a.once, stop, fetch = a.fetch)
        finally {
          spark.stop()
          drained.countDown() // releases the hook: safe to halt now
        }
    }
  }
}
