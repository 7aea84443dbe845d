package graft

import org.apache.spark.sql.functions._
import graft.sources.Readers

class ReadersSpec extends SparkSpec {

  test("S1 nvd: envelope {id, nvd}, missing-id rows skipped") {
    val df = Readers.nvd(spark, res("nvd_page.json"))
    assert(df.columns.toSeq == Seq("id", "nvd"))
    val ids = df.select("id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("CVE-2021-0002", "CVE-2022-0003", "CVE-2024-0001"))
    val base = df.filter(col("id") === "CVE-2024-0001")
      .select(col("nvd.metrics.cvssMetricV31")(0)("cvssData")("baseScore"))
      .head().getDouble(0)
    assert(base == 9.8)
  }

  test("S6 epss: typed doubles, incomplete rows dropped, metadata parsed") {
    val df = Readers.epss(spark, res("epss_scores.csv"))
    assert(df.count() == 3) // CVE-2020-0003 has empty epss -> dropped (P7)
    val row = df.filter(col("id") === "CVE-2024-0001")
      .select("epss.epss_score", "epss.percentile").head()
    assert(row.getDouble(0) == 0.97452 && row.getDouble(1) == 0.99923)
    val (mv, sd) = Readers.epssMetadata(spark, res("epss_scores.csv"))
    assert(mv == "v2023.03.01")
    assert(sd.toInstant.toString == "2025-04-03T00:00:00Z")
  }

  test("S6/S11 epss: identical results from the gzipped wire format") {
    val plain = Readers.epss(spark, res("epss_scores.csv"))
      .orderBy("id").collect().toSeq
    val gz = Readers.epss(spark, res("epss_scores.csv.gz"))
      .orderBy("id").collect().toSeq
    assert(plain == gz)
    val (mv, _) = Readers.epssMetadata(spark, res("epss_scores.csv.gz"))
    assert(mv == "v2023.03.01")
  }

  test("S6 epss: malformed metadata line aborts (epss_handler.py:97-99)") {
    intercept[IllegalArgumentException] {
      Readers.epssMetadata(spark, res("epss_malformed.csv"))
    }
  }

  test("S5 exploitdb: codes split+exploded, CVE-prefix filtered, codes dropped") {
    val df = Readers.exploitDb(spark, res("files_exploits.csv"))
    // 10001 -> 2 CVE codes; 10002 -> none; 10003 -> 1 CVE + 1 OSVDB (filtered)
    assert(df.count() == 3)
    assert(df.filter(col("id") === "CVE-2024-0001").count() == 2) // J2 collision
    assert(!df.select("exploitdb.*").columns.contains("codes"))   // P10/F24
    val authors = df.filter(col("id") === "CVE-2024-9999")
      .select("exploitdb.author").collect().map(_.getString(0))
    assert(authors.toSeq == Seq("alice"))
  }

  test("S7 kev: one row per vulnerability, dateReleased probe") {
    val df = Readers.kev(spark, res("known_exploited_vulnerabilities.json"))
    assert(df.count() == 2)
    assert(df.filter(col("id") === "CVE-2019-9999")
      .select("kev.knownRansomwareCampaignUse").head().getString(0) == "Unknown")
    val dr = Readers.kevDateReleased(spark, res("known_exploited_vulnerabilities.json"))
    assert(dr.toInstant.toString == "2025-04-03T14:01:05.179Z")
  }

  test("S9 metasploit: map explode, per-CVE rows, no-references guard") {
    val df = Readers.metasploit(spark, res("modules_metadata_base.json"))
    assert(df.count() == 3) // 2 CVE refs module1 + 1 ref module2; noref skipped
    assert(df.filter(col("id") === "CVE-2024-0001").count() == 2) // J2 collision
    val keys = df.filter(col("id") === "CVE-2024-0001")
      .select("metasploit.key").collect().map(_.getString(0)).sorted
    assert(keys.toSeq == Seq("exploit_linux/http/example_rce",
                             "exploit_windows/local/example_lpe"))
  }

  test("S8 debian: double map explode, non-CVE keys filtered") {
    val df = Readers.debian(spark, res("debian.json"))
    assert(df.count() == 3) // TEMP- key filtered
    assert(df.filter(col("id") === "CVE-2024-0001").count() == 2) // two packages
    val status = df.filter(col("id") === "CVE-2024-0001" &&
                           col("debian.package") === "openssl")
      .select(element_at(col("debian.cve_details.releases"), "bookworm")("status"))
      .head().getString(0)
    assert(status == "resolved")
  }

  test("S4 deltaLog: min fetchTime, watermark filter, updated ∪ new dedup") {
    val log = Readers.deltaLog(spark, res("deltaLog.json"))
    assert(Readers.deltaLogMinFetch(log).toInstant.toString == "2025-04-01T10:00:00Z")
    val wm = java.sql.Timestamp.from(java.time.Instant.parse("2025-04-01T12:00:00Z"))
    val delta = Readers.deltaCves(log, wm)
    // CVE-2024-0001 appears in two records -> latest fetchTime wins
    assert(delta.count() == 2)
    val link = delta.filter(col("cveId") === "CVE-2024-0001")
      .select("githubLink").head().getString(0)
    assert(link == "https://raw.example/CVE-2024-0001.json")
    // watermark after everything -> empty
    val wmLate = java.sql.Timestamp.from(java.time.Instant.parse("2025-04-04T00:00:00Z"))
    assert(Readers.deltaCves(log, wmLate).count() == 0)
  }

  test("S3 cveorg: dir scan filters CVE*.json members, id from filename") {
    val df = Readers.cveOrg(spark, res("cveorg"))
    val ids = df.select("id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("CVE-2024-0001", "CVE-2025-0100")) // delta.json skipped
    assert(df.filter(col("id") === "CVE-2025-0100")
      .select("cveorg.containers.cna.title").head().getString(0)
      == "New record from the delta")
  }

  test("S2 redhat: normalized {id, redhat} envelope") {
    val df = Readers.redhat(spark, res("redhat_page.json"))
    assert(df.count() == 2)
    assert(df.filter(col("id") === "CVE-2024-0001")
      .select("redhat.severity").head().getString(0) == "important")
  }

  test("S10 cwe xml: weakness rows with attributes + related array") {
    val df = Readers.cweXml(spark, res("cwec_mini.xml"))
    assert(df.count() == 3)
    val xss = df.filter(col("ID") === "79").head()
    assert(xss.getAs[String]("Name") == "XSS")
    val rel = df.filter(col("ID") === "79")
      .select(explode(col("Related_Weaknesses")).as("r"))
      .select("r.id", "r.nature").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    assert(rel.toSeq == Seq(("352", "PeerOf"), ("74", "ChildOf")))
    // F6/F8: xhtml rewritten, text flattened
    val desc = df.filter(col("ID") === "79").select("Description").head().getString(0)
    assert(desc == "Improper neutralization of input during web page generation")
  }

  test("S10 cwe xml: malformed document yields zero rows, no crash") {
    assert(Readers.cweXml(spark, res("cwec_malformed.xml")).count() == 0)
  }
}
