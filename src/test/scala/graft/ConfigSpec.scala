package graft

import org.scalatest.funsuite.AnyFunSuite

/** Config surface (handlers/config_handler.py): INI parse, env override,
  * boolean semantics, fetch-policy derivation. Driver-side — no Spark. */
class ConfigSpec extends AnyFunSuite {

  private val ini = """
    |[cvemate]
    |loglevel: info
    |save_data: False
    |scheduler: 6
    |timezone: UTC
    |
    |# comment
    |; also a comment
    |[mongodb]
    |Host: 127.0.0.1
    |Port = 27017
    |Prefix: cvemate_
    |
    |[nvd]
    |retry_limit: 3
    |retry_delay: 30
    |apikey:
    |public_rate_limit: 5
    |apikey_rate_limit: 50
    |rolling_window: 30
    |results_per_page:2000
    |
    |[redhat]
    |retry_delay: 10
    |apikey: sekrit
    |""".stripMargin

  private def conf(env: Map[String, String] = Map.empty) =
    Config.parse(ini, env.get)

  test("keys lowercase, both separators, comments skipped, empty value = absent") {
    val c = conf()
    assert(c.get("mongodb", "host").contains("127.0.0.1"))
    assert(c.get("mongodb", "Port").contains("27017")) // '=' separator; key ci
    assert(c.get("nvd", "results_per_page").contains("2000")) // no space after ':'
    assert(c.get("nvd", "apikey").isEmpty) // empty value ≡ unset (template ships blank)
    assert(c.get("nope", "x").isEmpty)
  }

  test("env override wins over file, reference MONGODB_* pattern") {
    val c = conf(Map("MONGODB_HOST" -> "db.prod"))
    assert(c.getWithEnv("mongodb", "host", "MONGODB").contains("db.prod"))
    assert(c.getWithEnv("mongodb", "port", "MONGODB").contains("27017"))
  }

  test("boolean semantics: configparser tokens; invalid throws; missing defaults") {
    val c = conf()
    assert(!c.getBoolean("cvemate", "save_data"))
    assert(c.getBoolean("missing", "flag", default = true))
    intercept[IllegalArgumentException] {
      Config.parse("[s]\nflag: maybe").getBoolean("s", "flag")
    }
  }

  test("scheduler interval and fetch policy; apikey selects the keyed rate tier") {
    val c = conf()
    assert(c.schedulerIntervalHours() == 6)
    // FLOAT hours, the reference's float(...) semantics (main.py:210):
    // sub-hour intervals are representable, not truncated
    assert(Config.parse("[cvemate]\nscheduler: 0.5")
      .schedulerIntervalHours() == 0.5)
    val nvd = c.fetchPolicy("nvd")
    assert(nvd == graft.sources.Fetch.Policy(2000, 3, 30000L, 5, 30000L)) // blank key → public tier
    val rh = c.fetchPolicy("redhat")
    assert(rh.retryDelayMs == 10000L) // redhat_handler.py:41-47 shorter delay
    assert(rh.requestsPerWindow == 50) // keyed tier
  }

  test("urlAllowed: a slash-free prefix matches only at a URL-grammar boundary") {
    // ADVICE r15: a bare startsWith let 'https://host' match
    // 'https://host.evil.com' — the authority-extension SSRF dodge
    def c(prefixes: String) =
      Config.parse(s"[s]\nallowed_url_prefixes: $prefixes")
    val host = c("https://host")
    assert(host.urlAllowed("s", "https://host"))
    assert(host.urlAllowed("s", "https://host/path.json"))
    assert(host.urlAllowed("s", "https://host?x=1"))
    assert(host.urlAllowed("s", "https://host#frag"))
    assert(!host.urlAllowed("s", "https://host.evil.com/x"),
      "authority extension must not clear a host-only prefix")
    assert(!host.urlAllowed("s", "https://hostile/x"))
    // ':' is NOT a boundary: a different port is a different authority
    assert(!host.urlAllowed("s", "https://host:8080/x"))
    // trailing-slash prefixes keep their documented string-prefix match
    val dir = c("https://host/raw/")
    assert(dir.urlAllowed("s", "https://host/raw/a/b.json"))
    assert(!dir.urlAllowed("s", "https://host/rawx/b.json"))
    // no allowlist configured = vacuously allowed (opt-in trust model)
    assert(Config.parse("[s]\nx: 1").urlAllowed("s", "https://anywhere/x"))
  }
}
