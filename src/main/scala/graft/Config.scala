package graft

import graft.sources.Fetch

/** Driver-side configuration surface (handlers/config_handler.py +
  * configuration.ini.template): INI sections with `key: value` /
  * `key = value` syntax, env-var overrides, boolean parsing with
  * configparser semantics, and typed accessors for the values the engine
  * actually consumes (scheduler interval, per-source fetch policy).
  *
  * Pure Scala parse — no external dependency; keys are lowercased like
  * configparser, values trimmed, `#`/`;` full-line comments ignored.
  */
object Config {

  final case class Conf(sections: Map[String, Map[String, String]],
                        env: String => Option[String] = sys.env.get) {

    def get(section: String, key: String): Option[String] =
      sections.get(section).flatMap(_.get(key.toLowerCase))
        .map(_.trim).filter(_.nonEmpty)

    /** Env wins over file when `ENVPREFIX_KEY` is set — the reference's
      * mongodb override pattern (config_handler.py:29-37). */
    def getWithEnv(section: String, key: String, envPrefix: String): Option[String] =
      env(s"${envPrefix}_${key.toUpperCase}").orElse(get(section, key))

    /** configparser boolean semantics: 1/yes/true/on vs 0/no/false/off,
      * case-insensitive; missing section/option → default; anything else
      * is a config error (config_handler.py:76-81 only catches missing). */
    def getBoolean(section: String, key: String, default: Boolean = false): Boolean =
      get(section, key) match {
        case None => default
        case Some(v) => v.toLowerCase match {
          case "1" | "yes" | "true" | "on" => true
          case "0" | "no" | "false" | "off" => false
          case other =>
            throw new IllegalArgumentException(s"not a boolean: [$section] $key = $other")
        }
      }

    def getInt(section: String, key: String, default: Int): Int =
      get(section, key).map(_.toInt).getOrElse(default)

    def getLong(section: String, key: String, default: Long): Long =
      get(section, key).map(_.toLong).getOrElse(default)

    /** [section] allowed_url_prefixes — comma-separated URL prefixes
      * the section's fetched-content-derived links (the cve.org delta
      * log's per-CVE github links) and probe URLs must match before
      * any GET. The delta log is DOWNLOADED content: without this, a
      * compromised upstream could point executor-side GETs at internal
      * endpoints (SSRF). Absent key = no restriction (the pre-existing
      * trust model; operators opt in per section). */
    def allowedUrlPrefixes(section: String): Option[Seq[String]] =
      get(section, "allowed_url_prefixes")
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))

    /** True when `url` clears [[allowedUrlPrefixes]] for the section —
      * vacuously true with no allowlist configured. A bare startsWith
      * would let an authority-only prefix ('https://host') match
      * 'https://host.evil.com' (ADVICE r15); a prefix not already
      * ending in '/' therefore only matches at a boundary the URL
      * grammar can't smuggle past: the exact string, or the prefix
      * followed by '/', '?' or '#' (path/query/fragment starts — ':'
      * deliberately excluded so 'https://host' cannot match
      * 'https://host:8080', a DIFFERENT authority). */
    def urlAllowed(section: String, url: String): Boolean =
      allowedUrlPrefixes(section).forall(_.exists { p =>
        if (p.endsWith("/")) url.startsWith(p)
        else url == p || url.startsWith(p + "/") ||
             url.startsWith(p + "?") || url.startsWith(p + "#")
      })

    /** [cvemate] scheduler — tick interval in hours
      * (configuration.ini.template:4; main.py scheduler loop). FLOAT
      * hours, matching `float(cvemate_config.get('scheduler', 4))`
      * (main.py:210): a `scheduler: 0.5` config means every 30 min. */
    def schedulerIntervalHours(default: Double = 6): Double =
      get("cvemate", "scheduler").map(_.toDouble).getOrElse(default)

    /** A source section's fetch policy (nvd_handler.py:44-49): the rate
      * limit picks the keyed tier only when an apikey is present. */
    def fetchPolicy(section: String): Fetch.Policy = {
      val hasKey = get(section, "apikey").isDefined
      Fetch.Policy(
        resultsPerPage = getInt(section, "results_per_page", 2000),
        retryLimit = getInt(section, "retry_limit", 3),
        retryDelayMs = getInt(section, "retry_delay", 30) * 1000L,
        requestsPerWindow =
          if (hasKey) getInt(section, "apikey_rate_limit", 50)
          else getInt(section, "public_rate_limit", 5),
        windowMs = getInt(section, "rolling_window", 30) * 1000L)
    }
  }

  private val SectionRe = """^\[([^\]]+)\]\s*$""".r
  private val PairRe = """^([^:=#;]+?)\s*[:=]\s*(.*)$""".r

  def parse(text: String,
            env: String => Option[String] = sys.env.get): Conf = {
    var current: String = null
    val out = scala.collection.mutable.Map.empty[String, Map[String, String]]
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      line match {
        case "" => ()
        case l if l.startsWith("#") || l.startsWith(";") => ()
        case SectionRe(name) =>
          current = name.trim.toLowerCase
          out.getOrElseUpdate(current, Map.empty)
        case PairRe(k, v) if current != null =>
          out(current) = out(current) + (k.trim.toLowerCase -> v.trim)
        case _ => () // tolerate junk lines like configparser's strict=False
      }
    }
    Conf(out.toMap, env)
  }

  def load(path: String,
           env: String => Option[String] = sys.env.get): Conf =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8), env)
}
