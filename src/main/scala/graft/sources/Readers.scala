package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-only readers for every reference source format (SURVEY.md §2.1).
  *
  * Network fetch is isolated behind a landing-directory interface: the
  * reference's paginated/threaded HTTP pulls (S1/S2) land pages as files;
  * everything after that is a declared-schema Spark read, so tests and
  * bench run fully offline and the same code scales out (a landing dir of
  * 10⁵ page files reads as one partitioned scan).
  *
  * Each reader normalizes to the envelope the reference upserts:
  * `{id, <source>: struct}` (SURVEY.md §1.1).
  */
object Readers {

  /** S1: NVD API page files → {id, nvd} (nvd_handler.py:73-77; P1/P2
    * missing-id skip at :78-79). */
  def nvd(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.nvdPage).option("multiLine", true).json(path)
      .select(explode(col("vulnerabilities")).as("vul"))
      .select(col("vul.cve.id").as("id"), col("vul.cve").as("nvd"))
      .filter(col("id").isNotNull)

  /** S6 metadata line: `#model_version:vX,score_date:T` regex
    * (epss_handler.py:93-101). Returns (model_version, score_date). */
  def epssMetadata(spark: SparkSession, path: String): (String, java.sql.Timestamp) = {
    val line = spark.read.text(path).limit(1)
      .select(
        regexp_extract(col("value"), "model_version:([^,]*),score_date:(.*)$", 1)
          .as("mv"),
        try_to_timestamp(
          regexp_extract(col("value"), "model_version:([^,]*),score_date:(.*)$", 2))
          .as("sd"))
      .head()
    val mv = line.getString(0)
    if (mv.isEmpty || line.isNullAt(1))
      throw new IllegalArgumentException(s"malformed EPSS metadata line in $path")
    (mv, line.getTimestamp(1))
  }

  /** S6 body: CSV.gz with leading comment line → {id, epss: {epss_score,
    * percentile}} typed DOUBLE at ingest (quirk #8 — intent, not the
    * string round-trip); P7 completeness filter (epss_handler.py:140-142). */
  def epss(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.epssCsv)
      .option("header", true).option("comment", "#").csv(path)
      .na.drop(Seq("cve", "epss", "percentile"))
      .select(col("cve").as("id"),
        struct(col("epss").cast("double").as("epss_score"),
               col("percentile").cast("double").as("percentile")).as("epss"))

  /** S5: Exploit-DB CSV → one row per (CVE code, exploit): F1 split on `;`,
    * F20 explode, P4 CVE- prefix filter, P10/F24 drop `codes`
    * (exploitdb_handler.py:62-78). */
  def exploitDb(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.schema(Schemas.exploitDbCsv).option("header", true).csv(path)
    val payload = struct(raw.columns.filter(_ != "codes").map(col): _*)
    raw
      .select(explode(split(coalesce(col("codes"), lit("")), ";")).as("code"),
              payload.as("exploitdb"))
      .filter(col("code").startsWith("CVE-"))
      .select(col("code").as("id"), col("exploitdb"))
  }

  /** S7: CISA KEV catalog → {id, kev} (cisa_handler.py:65-67). */
  def kev(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.kevCatalog).option("multiLine", true).json(path)
      .select(explode(col("vulnerabilities")).as("vul"))
      .select(col("vul.cveID").as("id"), col("vul").as("kev"))
      .filter(col("id").isNotNull)

  /** KEV catalog freshness stamp (cisa_handler.py:52-55). */
  def kevDateReleased(spark: SparkSession, path: String): java.sql.Timestamp =
    spark.read.schema(Schemas.kevCatalog).option("multiLine", true).json(path)
      .select(to_timestamp(col("dateReleased")).as("dr")).head().getTimestamp(0)

  /** S9: Metasploit module map → one row per (CVE ref, module):
    * F19 map explode, P4 prefix filter, {id, metasploit: {key, data}}
    * (metasploit_handler.py:67-77). */
  def metasploit(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", true).text(path)
      .select(explode(from_json(col("value"), Schemas.msfMap)).as(Seq("key", "data")))
      .select(col("key"), col("data"), explode_outer(col("data.references")).as("ref"))
      .filter(col("ref").startsWith("CVE-"))
      .select(col("ref").as("id"),
              struct(col("key"), col("data")).as("metasploit"))

  /** S8: Debian tracker nested map → double explode →
    * {id, debian: {package, cve_details}} (debian_handler.py:60-71). */
  def debian(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", true).text(path)
      .select(explode(from_json(col("value"), Schemas.debianMap)).as(Seq("package", "cves")))
      .select(col("package"), explode(col("cves")).as(Seq("id", "cve_details")))
      .filter(col("id").startsWith("CVE-"))
      .select(col("id"),
              struct(col("package"), col("cve_details")).as("debian"))

  /** S4: cvelistV5 deltaLog.json (cveorg_handler.py:123-156). */
  def deltaLog(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.deltaLog).option("multiLine", true).json(path)
      .withColumn("fetchTime", to_timestamp(col("fetchTime")))

  /** A1: min(fetchTime) staleness probe (cveorg_handler.py:126-127). */
  def deltaLogMinFetch(log: DataFrame): java.sql.Timestamp =
    log.agg(min(col("fetchTime"))).head().getTimestamp(0)

  /** P8/U1: entries newer than the watermark, updated ∪ new, one row per
    * delta item (quirk #4 intent — the reference's quadratic re-extend is
    * a bug), deduped on cveId keeping the latest fetchTime. */
  def deltaCves(log: DataFrame, watermark: java.sql.Timestamp): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cveId")).orderBy(col("fetchTime").desc)
    log.filter(col("fetchTime") > lit(watermark))
      .select(col("fetchTime"),
        explode(concat(coalesce(col("updated"), array()),
                       coalesce(col("new"), array()))).as("item"))
      .select(col("fetchTime"), col("item.cveId").as("cveId"),
              col("item.githubLink").as("githubLink"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** S3/P5/F3: landed cvelistV5 clone → {id, cveorg}. Two layouts,
    * dispatched on what actually landed:
    *  - file-per-member tree (the keyed fan-out's landing, and legacy
    *    extractZip clones): id from the filename (basename minus
    *    .json), members filtered to CVE*.json (cveorg_handler.py:70-71,
    *    79-80);
    *  - batched JSONL envelopes (`Landing.extractZipBatched` — the
    *    day-zero clone): `{name, body}` lines whose bodies are parsed
    *    DISTRIBUTED via from_json — the driver never parses a record,
    *    and a 500k-member clone scans as dozens of files, not half a
    *    million.
    * Both produce the identical relation (GraftSpec pins it). */
  def cveOrg(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batched = fs.exists(p) &&
      fs.globStatus(new org.apache.hadoop.fs.Path(p, "batch-*.jsonl"))
        .nonEmpty
    if (batched)
      spark.read
        .schema("name STRING, body STRING")
        .json(new org.apache.hadoop.fs.Path(p, "batch-*.jsonl").toString)
        .filter(col("name").startsWith("CVE") && col("name").endsWith(".json"))
        .select(regexp_extract(col("name"), "(.+)\\.json$", 1).as("id"),
                from_json(col("body"), Schemas.cveV5Record).as("rec"))
        .select(col("id"),
                struct(col("rec.cveMetadata").as("cveMetadata"),
                       col("rec.containers").as("containers")).as("cveorg"))
    else
      spark.read.schema(Schemas.cveV5Record)
        .option("multiLine", true)
        .option("recursiveFileLookup", true)
        .option("pathGlobFilter", "CVE*.json")
        .json(dir)
        .withColumn("id",
          regexp_extract(input_file_name(), "([^/]+)\\.json$", 1))
        .filter(col("id").startsWith("CVE"))
        .select(col("id"), struct(col("cveMetadata"), col("containers")).as("cveorg"))
  }

  /** S2: Red Hat Hydra page files → normalized {id, redhat} (the dormant
    * handler stores the bare dict with no envelope, redhat_handler.py:91-94
    * — we normalize per SURVEY.md §1.1). */
  def redhat(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.redhatPage).option("multiLine", true).json(path)
      .select(explode(col("vulnerabilities")).as("vul"))
      .select(col("vul.cve.CVE").as("id"), col("vul.cve").as("redhat"))
      .filter(col("id").isNotNull)

  /** S10/D1: CWE weakness XML → one row per Weakness element, parsed with
    * scala.xml inside a flatMap (no spark-xml offline). Namespace-agnostic
    * (F7); Description is the recursive text flatten (F8) after the
    * XHTML→HTML rewrite (F6). Malformed XML yields zero rows (the
    * reference logs and continues, cwe_handler.py:100-102). */
  def cweXml(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val rows = spark.read.option("wholetext", true).textFile(path)
      .flatMap(CweXmlParser.parse _)
    rows.toDF()
  }
}
