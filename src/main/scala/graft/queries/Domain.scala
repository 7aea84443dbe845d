package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Merge, Prioritizer}
import QueryUtil._

/** CVE-domain end-to-end queries over the driver's testdata (SURVEY.md
  * §2.3 J4, §3.1+§3.3, §2.1 S12) — the shapes the reference runs as a
  * whole job, each with a DuckDB oracle.
  *
  *  - q51: the CWE cross-reference join (datasources/cwe_handler.py:82-90,
  *    114; README.rst:34-40). The weakness registry is an external side
  *    table in the reference (parsed from cwec XML) — modeled here as an
  *    inline broadcast dim; the CVE side carries weakness references as an
  *    array, and the scale-correct form of the `array_contains` join is
  *    explode + equi-join against the broadcast dim.
  *  - q52: the flagship pipeline (main.py:64-98 → prioritizer_handler
  *    .py:22-48) through the REAL operators — Merge.init / chained
  *    Merge.upsert folds / Prioritizer.priority — with the oracle as the
  *    equivalent chain of full-outer joins + CASE ladder, including the
  *    $setOnInsert created_at/updated_at bookkeeping.
  *  - q53: the S12 freshness probe's relational analog
  *    (handlers/utils.py:164-184): latest-commit top-1 via orderBy desc +
  *    limit 1 → TakeOrderedAndProject, no full sort at any scale.
  */
object Domain {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  /** term → (CWE id, category): the weakness registry rows (cwe_handler
    * builds exactly this id-keyed side table from the XML catalog). */
  private val CweCatalog = Seq(
    ("hash",   "CWE-328", "crypto"),
    ("key",    "CWE-321", "crypto"),
    ("join",   "CWE-89",  "injection"),
    ("filter", "CWE-20",  "validation"),
    ("scan",   "CWE-200", "exposure"),
    ("merge",  "CWE-362", "race"),
    ("window", "CWE-367", "race"),
    ("sort",   "CWE-400", "resource"),
    ("stream", "CWE-770", "resource"),
    ("vector", "CWE-190", "overflow"))

  private val T0 = "2026-01-01 00:00:00" // snapshot init tick
  private val T1 = "2026-02-01 00:00:00" // enrichment tick

  val queries: Map[String, Q] = Map(
    // J4: CVEs-per-weakness rollup. The doc's weakness references are its
    // distinct terms; explode fans out ~30× then the broadcast hash join
    // filters to catalog hits — the fact side never shuffles, and the
    // count-distinct is a two-phase partial agg on (cwe_id, doc_id).
    "q51_cwe_xref" -> ((s, dir) => {
      import s.implicits._
      val cwe = broadcast(CweCatalog.toDF("term", "cwe_id", "category"))
      t(s, dir, "documents")
        .select($"doc_id", explode(array_distinct(split($"text", " "))).as("term"))
        .join(cwe, "term")
        .groupBy($"cwe_id", $"category")
        .agg(countDistinct($"doc_id").as("cve_count"))
        .orderBy("cwe_id")
    }),

    // §3.1+§3.3 end-to-end: init snapshot at T0, three source upserts at
    // T1 (nvd-like scores with a genuinely-nullable v3.1 branch, epss-like
    // rate, kev-like flag), then the F17 coalesce ladder and F18 priority
    // ladder. This variant merges via the fold of full-outer joins (one
    // shuffle per source; AQE broadcasts the small deltas).
    "q52_cve_pipeline" -> ((s, dir) =>
      pipeline(s, dir)((snap0, deltas, t1) =>
        deltas.foldLeft(snap0)((snap, d) => Merge.upsert(snap, d, "id", now = t1)))),

    // The same pipeline through Merge.upsertMany — the one-shuffle N-way
    // merge (union + keyed agg) that replaces the chain of full-outer
    // joins at scale. MUST produce q52's exact answer (same oracle SQL):
    // the fused plan is an optimization, not a semantics change.
    "q58_cve_pipeline_fused" -> ((s, dir) =>
      pipeline(s, dir)((snap0, deltas, t1) =>
        Merge.upsertMany(snap0, deltas, "id", now = t1))),

    // S12 relational analog: newest record wins — TakeOrderedAndProject
    // (per-partition top-1 + driver merge of 1-row candidates), never a
    // global sort.
    "q53_latest_commit" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_id", $"ts", $"user_id")
        .orderBy($"ts".desc, $"event_id".desc)
        .limit(1)
    })
  )

  /** Shared construction for q52/q58: the same snapshot + source deltas
    * and the same scoring tail, parameterized ONLY by the merge strategy —
    * so the two catalog entries can differ in nothing but the plan. */
  private def pipeline(s: SparkSession, dir: String)(
      merge: (DataFrame, Seq[DataFrame], org.apache.spark.sql.Column) => DataFrame)
      : DataFrame = {
    import s.implicits._
    val t0 = lit(T0).cast("timestamp")
    val t1 = lit(T1).cast("timestamp")
    val nvd = t(s, dir, "orders")
      .groupBy($"o_custkey".as("id"))
      .agg(max(when($"o_orderpriority" === "1-URGENT", $"o_totalprice"))
             .as("urgent_max"),
           max($"o_totalprice").as("any_max"))
    val eps = t(s, dir, "events")
      .groupBy($"user_id".as("id"))
      .agg((davg($"value", 6) / 500).as("epss"))
    val kev = t(s, dir, "events")
      .filter($"event_type" === "error")
      .select($"user_id".as("id")).distinct()
      .withColumn("kev_flag", lit(true))
    val snap0 = Merge.init(
      t(s, dir, "customer").select($"c_custkey".as("id"), $"c_name".as("name")),
      now = t0)
    merge(snap0, Seq(nvd, eps, kev), t1)
      .withColumn("cvss",
        coalesce($"urgent_max", $"any_max", lit(0.0)) / 50000)
      .select($"id", $"name", $"cvss", $"epss", $"kev_flag",
              Prioritizer.priority($"kev_flag", $"cvss", $"epss").as("priority"),
              $"created_at", $"updated_at")
      .orderBy("id")
  }

  private val cweValuesSql = CweCatalog
    .map { case (t, id, c) => s"('$t', '$id', '$c')" }.mkString(",\n    ")

  /** Shared by q52 and q58 — the fused merge is plan-level only; the
    * answer (and so the oracle) is identical. */
  private val pipelineSql =
    s"""WITH nvd AS (
          SELECT o_custkey AS id,
                 MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END)
                   AS urgent_max,
                 MAX(o_totalprice) AS any_max
          FROM orders GROUP BY 1),
        eps AS (
          SELECT user_id AS id, ${davgSql("value", 6)} / 500 AS epss
          FROM events GROUP BY 1),
        kev AS (
          SELECT DISTINCT user_id AS id, TRUE AS kev_flag
          FROM events WHERE event_type = 'error'),
        snap AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        merged AS (
          SELECT COALESCE(snap.id, nvd.id, eps.id, kev.id) AS id,
                 snap.name AS name,
                 COALESCE(nvd.urgent_max, nvd.any_max, 0.0) / 50000 AS cvss,
                 eps.epss AS epss, kev.kev_flag AS kev_flag,
                 CASE WHEN snap.id IS NOT NULL THEN TIMESTAMP '$T0'
                      ELSE TIMESTAMP '$T1' END AS created_at,
                 CASE WHEN nvd.id IS NOT NULL OR eps.id IS NOT NULL
                           OR kev.id IS NOT NULL
                      THEN TIMESTAMP '$T1'
                      ELSE TIMESTAMP '$T0' END AS updated_at
          FROM snap
          FULL JOIN nvd ON snap.id = nvd.id
          FULL JOIN eps ON COALESCE(snap.id, nvd.id) = eps.id
          FULL JOIN kev ON COALESCE(snap.id, nvd.id, eps.id) = kev.id)
        SELECT id, name, cvss, epss, kev_flag,
               CASE WHEN kev_flag IS NOT NULL THEN 1
                    WHEN cvss >= 6.0 AND COALESCE(epss, 0) >= 0.2 THEN 1
                    WHEN cvss >= 6.0 THEN 2
                    WHEN COALESCE(epss, 0) >= 0.2 THEN 3
                    ELSE 4 END AS priority,
               created_at, updated_at
        FROM merged ORDER BY id"""

  val oracle: Map[String, String] = Map(
    "q51_cwe_xref" ->
      s"""WITH cwe(term, cwe_id, category) AS (VALUES
    $cweValuesSql),
          refs AS (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
            FROM documents)
          SELECT cwe.cwe_id AS cwe_id, cwe.category AS category,
                 COUNT(DISTINCT refs.doc_id) AS cve_count
          FROM refs JOIN cwe ON refs.term = cwe.term
          GROUP BY cwe.cwe_id, cwe.category ORDER BY cwe_id""",

    "q52_cve_pipeline" -> pipelineSql,
    "q58_cve_pipeline_fused" -> pipelineSql,

    "q53_latest_commit" ->
      """SELECT event_id, ts, user_id FROM events
         ORDER BY ts DESC, event_id DESC LIMIT 1"""
  )
}
