package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import QueryUtil._

/** Relational operator inventory (SURVEY.md §2) expressed over the driver's
  * TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Conventions for oracle parity:
  *  - every output column is aliased identically on both sides (lowercase);
  *  - every query ends in a total ORDER BY over a unique key set;
  *  - double aggregation goes through exact decimal ([[QueryUtil.dsum]]);
  *  - integer outputs are BIGINT on both sides.
  *
  * Scale notes are inline: each query is written so the same plan holds on
  * a 1000-executor cluster (broadcast dims, partial aggs, no collects).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // Salted skew join, RESULT-gated: Joins.saltedJoin spreads one hot
    // key over `factor` reducers (deterministic event_id salt on the
    // large side, factor-exploded small side) and must produce exactly
    // the plain equi-join's answer — the oracle runs the unsalted join,
    // so hash equality proves salting is result-neutral, the same way
    // q98 gates the Apriori prune and q110 the prefix decomposition.
    "q111_salted_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id").as("c_custkey"), col("value"), col("event_id"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      graft.operators.Joins
        .saltedJoin(ev, cust, "c_custkey", factor = 8, saltCols = Seq("event_id"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("events"), dsum(col("value"), 6).as("value_sum"))
        .orderBy("c_mktsegment")
    }),

    // S-scan + P3 projection pushdown: only 3 of 11 lineitem columns read.
    "q01_scan_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P2/P4/P8-style predicates; pushed to the parquet scan.
    "q02_filter_range" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
                $"l_shipdate" <  lit("1998-01-01").cast("timestamp") &&
                $"l_quantity" > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // A5 hash aggregate (TPC-H Q1 shape): partial+final agg, exact decimal sums.
    "q03_agg_group" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 6)))
            .cast("double").as("sum_disc_price"),
          davg($"l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // A1/O4 min-max aggregate over raw (non-arithmetic) values.
    "q04_agg_min_max" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(min($"o_orderdate").as("min_date"),
             max($"o_orderdate").as("max_date"),
             max($"o_totalprice").as("max_price"),
             count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    }),

    // A4 distinct aggregation (expand + two-phase agg in Spark).
    "q05_count_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("distinct_parts"),
             countDistinct($"l_suppkey").as("distinct_supps"),
             count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // J1-small: star join with explicitly broadcast dimensions — at 100 TB
    // the fact side never shuffles for dims this small.
    "q06_join_broadcast" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("cust_cnt"), dsum($"c_acctbal").as("acct_total"))
        .orderBy("r_name")
    }),

    // J1-large: fact-to-fact equi-join; shuffle hash/SMJ on the join key,
    // AQE picks at runtime. Filter is pushed below the join.
    "q07_join_fact" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
        .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp"))
        .groupBy($"o_orderpriority")
        .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 6)))
               .cast("double").as("revenue"),
             count(lit(1)).as("line_cnt"))
        .orderBy("o_orderpriority")
    }),

    // K1/J1: the reference's upsert-merge = full-outer join + per-column
    // coalesce (handlers/mongodb_handler.py:155-175 semantics).
    "q08_merge_full_outer" -> ((s, dir) => {
      import s.implicits._
      val snapshot = t(s, dir, "customer")
        .select($"c_custkey".as("id"), $"c_name".as("name"), $"c_acctbal".as("acctbal"))
      val delta = t(s, dir, "orders")
        .groupBy($"o_custkey".as("id"))
        .agg(dsum($"o_totalprice").as("spend"), count(lit(1)).as("order_cnt"))
      snapshot.join(delta, Seq("id"), "full_outer")
        .select(
          $"id",
          coalesce($"name", lit("<new>")).as("name"),
          coalesce($"acctbal", lit(0.0)).as("acctbal"),
          coalesce($"spend", lit(0.0)).as("spend"),
          coalesce($"order_cnt", lit(0L)).as("order_cnt"),
          when($"name".isNotNull && $"spend".isNotNull, "both")
            .when($"name".isNotNull, "snapshot_only")
            .otherwise("delta_only").as("src"))
        .orderBy("id")
    }),

    // J3/U2: anti join (exclude-set membership).
    "q09_anti_join" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy("c_custkey")
    }),

    // P6: semi join (include-list membership).
    "q10_semi_join" -> ((s, dir) => {
      import s.implicits._
      val urgent = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
      t(s, dir, "customer")
        .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy("c_custkey")
    }),

    // J2 fidelity: last-writer-wins via row_number (dedup to newest row).
    "q11_window_lww" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey".as("last_orderkey"),
                $"o_orderdate".as("last_orderdate"))
        .orderBy("o_custkey")
    }),

    // O2/EXT top-k per group.
    "q12_window_topk" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"p_brand")
        .orderBy($"p_retailprice".desc, $"p_partkey".asc)
      t(s, dir, "part")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"p_brand", $"rk".cast("long").as("rk"), $"p_partkey", $"p_retailprice")
        .orderBy("p_brand", "rk")
    }),

    // Window frame: running totals (exact decimal, then double).
    "q13_window_running" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("seq", row_number().over(
          Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)))
        .withColumn("run_spend",
          sum($"o_totalprice".cast(DecimalType(18, 2))).over(w).cast("double"))
        .select($"o_custkey", $"seq".cast("long").as("seq"), $"o_orderkey", $"run_spend")
        .orderBy("o_custkey", "seq")
    }),

    // O2: global top-k (TakeOrderedAndProject — no full sort at scale).
    "q14_sort_limit" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    }),

    // O3: offset/limit pagination.
    "q15_sort_offset" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .orderBy($"o_orderkey".asc)
        .offset(100).limit(50)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
    }),

    // U1/U3: union-all of two branches with a lineage tag.
    "q16_union_all" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val hi = o.filter($"o_totalprice" > 400000.0)
        .select($"o_orderkey".as("id"), lit("high_value").as("bucket"))
      val ur = o.filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey".as("id"), lit("urgent").as("bucket"))
      hi.unionAll(ur).orderBy("bucket", "id")
    }),

    // U2: EXCEPT (distinct) — parts never ordered.
    "q17_except" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part").select($"p_partkey".as("k"))
        .except(t(s, dir, "lineitem").select($"l_partkey".as("k")))
        .orderBy("k")
    }),

    // Set op: INTERSECT (distinct) — nations having customers and suppliers.
    "q18_intersect" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_nationkey".as("k"))
        .intersect(t(s, dir, "supplier").select($"s_nationkey".as("k")))
        .orderBy("k")
    }),

    // F1/F20: split + explode (generator), re-aggregated.
    "q19_explode_tokens" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select(explode(split($"p_name", " ")).as("word"))
        .groupBy($"word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("word")
    }),

    // F15: JSON path extraction from a string column.
    "q20_json_extract" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select(get_json_object($"props", "$.k").cast("long").as("k_val"))
        .groupBy($"k_val")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("k_val")
    }),

    // F18: the prioritizer's when-ladder (thresholded case expression).
    "q21_case_ladder" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .withColumn("priority",
          when($"o_orderpriority" === "1-URGENT" && $"o_totalprice" >= 300000.0, 1L)
            .when($"o_totalprice" >= 300000.0, 2L)
            .when($"o_orderpriority" === "1-URGENT", 3L)
            .otherwise(4L))
        .groupBy($"priority")
        .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
        .orderBy("priority")
    }),

    // F16/F17: coalesce ladder with nullable branches.
    "q22_coalesce_ladder" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .select(coalesce(
          nullif($"c_mktsegment", lit("AUTOMOBILE")),
          nullif($"c_name", lit("none")),
          lit("fallback")).as("resolved"))
        .groupBy($"resolved")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("resolved")
    }),

    // F10/F11: date truncation + formatting.
    "q23_date_trunc" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy(date_trunc("month", $"o_orderdate").as("month"),
                 date_format($"o_orderdate", "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
        .orderBy("month")
    }),

    // F12: timestamp difference in days (order → last ship).
    "q24_datediff" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey", $"o_orderdate")
        .agg(max($"l_shipdate").as("last_ship"))
        .select(datediff($"last_ship", $"o_orderdate").cast("long").as("wait_days"))
        .groupBy($"wait_days")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("wait_days")
    }),

    // EXT (SURVEY §2.4): rollup with grouping id.
    "q25_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"))
        .orderBy($"gid", $"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
    }),

    // T5-as-batch: tumbling-hour event aggregation (streaming analog is
    // window($"ts","1 hour") — same grouping keys).
    "q26_events_hourly" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("cnt"), dsum($"value", 6).as("value_sum"))
        .orderBy("hour", "event_type")
    }),

    // A3-style: count + derived page arithmetic, single wide agg.
    "q27_paging_math" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("total_results"))
        .select($"o_orderstatus",
                $"total_results",
                ceil($"total_results" / lit(2000.0)).cast("long").as("num_pages"))
        .orderBy("o_orderstatus")
    }),

    // F2-F5/F22: string-function battery — split element, trim/ltrim,
    // regexp metadata extract (2 groups), URI credential masking.
    "q28_string_fns" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select(
          $"p_partkey",
          element_at(split($"p_name", " "), 1).as("first_word"),
          element_at(split($"p_name", " "), -1).as("last_word"),
          trim(concat(lit("  "), $"p_brand", lit("  "))).as("brand_trim"),
          regexp_extract($"p_type", "^(\\w+) (\\w+)", 1).as("type_head"),
          regexp_extract($"p_type", "^(\\w+) (\\w+)", 2).as("type_mid"),
          regexp_replace(
            concat(lit("db://user:secret@host/"), $"p_brand"),
            "://([^:]+):[^@]+@", "://$1:***@").as("masked_uri"))
        .orderBy("p_partkey")
    }),

    // EXT §2.4: cube — all grouping-set combinations in one pass.
    "q29_cube" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"))
        .orderBy($"gid", $"o_orderstatus".asc_nulls_first,
                 $"o_orderpriority".asc_nulls_first)
    })
  )

  val oracle: Map[String, String] = Map(
    // the UNSALTED join: salting must be result-neutral
    "q111_salted_join" ->
      s"""SELECT c_mktsegment, COUNT(*) AS events,
                 ${dsumSql("value", 6)} AS value_sum
          FROM events e JOIN customer c ON e.user_id = c.c_custkey
          GROUP BY 1 ORDER BY c_mktsegment""",

    "q01_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",

    "q02_filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_quantity > 30
         ORDER BY l_orderkey, l_linenumber""",

    "q03_agg_group" ->
      s"""SELECT l_returnflag, l_linestatus,
            ${dsumSql("l_quantity")} AS sum_qty,
            ${dsumSql("l_extendedprice")} AS sum_base_price,
            CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
            ${davgSql("l_quantity")} AS avg_qty,
            COUNT(*) AS count_order
          FROM lineitem GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""",

    "q04_agg_min_max" ->
      """SELECT o_orderpriority, MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date,
                MAX(o_totalprice) AS max_price, COUNT(*) AS cnt
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q05_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts,
                COUNT(DISTINCT l_suppkey) AS distinct_supps, COUNT(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q06_join_broadcast" ->
      s"""SELECT r_name, COUNT(*) AS cust_cnt, ${dsumSql("c_acctbal")} AS acct_total
          FROM customer JOIN nation ON c_nationkey = n_nationkey
                        JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name ORDER BY r_name""",

    "q07_join_fact" ->
      """SELECT o_orderpriority,
                CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                COUNT(*) AS line_cnt
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE l_shipdate >= TIMESTAMP '1998-01-01'
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q08_merge_full_outer" ->
      s"""WITH snapshot AS (
            SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal FROM customer),
          delta AS (
            SELECT o_custkey AS id, ${dsumSql("o_totalprice")} AS spend, COUNT(*) AS order_cnt
            FROM orders GROUP BY o_custkey)
          SELECT COALESCE(s.id, d.id) AS id,
                 COALESCE(s.name, '<new>') AS name,
                 COALESCE(s.acctbal, 0.0) AS acctbal,
                 COALESCE(d.spend, 0.0) AS spend,
                 COALESCE(d.order_cnt, 0) AS order_cnt,
                 CASE WHEN s.name IS NOT NULL AND d.spend IS NOT NULL THEN 'both'
                      WHEN s.name IS NOT NULL THEN 'snapshot_only'
                      ELSE 'delta_only' END AS src
          FROM snapshot s FULL OUTER JOIN delta d ON s.id = d.id
          ORDER BY id""",

    "q09_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "q10_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",

    "q11_window_lww" ->
      """SELECT o_custkey, o_orderkey AS last_orderkey, o_orderdate AS last_orderdate
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
               FROM orders) WHERE rn = 1
         ORDER BY o_custkey""",

    "q12_window_topk" ->
      """SELECT p_brand, CAST(rk AS BIGINT) AS rk, p_partkey, p_retailprice
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand
                                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
               FROM part) WHERE rk <= 3
         ORDER BY p_brand, rk""",

    "q13_window_running" ->
      """SELECT o_custkey, CAST(seq AS BIGINT) AS seq, o_orderkey, run_spend
         FROM (SELECT o_custkey, o_orderkey,
                      ROW_NUMBER() OVER w AS seq,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                           (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
               FROM orders
               WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC))
         ORDER BY o_custkey, seq""",

    "q14_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",

    "q15_sort_offset" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
         ORDER BY o_orderkey ASC LIMIT 50 OFFSET 100""",

    "q16_union_all" ->
      """SELECT * FROM (
           SELECT o_orderkey AS id, 'high_value' AS bucket FROM orders WHERE o_totalprice > 400000.0
           UNION ALL
           SELECT o_orderkey AS id, 'urgent' AS bucket FROM orders WHERE o_orderpriority = '1-URGENT')
         ORDER BY bucket, id""",

    "q17_except" ->
      """SELECT p_partkey AS k FROM part
         EXCEPT SELECT l_partkey AS k FROM lineitem
         ORDER BY k""",

    "q18_intersect" ->
      """SELECT c_nationkey AS k FROM customer
         INTERSECT SELECT s_nationkey AS k FROM supplier
         ORDER BY k""",

    "q19_explode_tokens" ->
      """SELECT word, COUNT(*) AS cnt
         FROM (SELECT UNNEST(string_split(p_name, ' ')) AS word FROM part)
         GROUP BY word ORDER BY word""",

    "q20_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val, COUNT(*) AS cnt
         FROM events GROUP BY k_val ORDER BY k_val""",

    "q21_case_ladder" ->
      s"""SELECT CASE WHEN o_orderpriority = '1-URGENT' AND o_totalprice >= 300000.0 THEN 1
                      WHEN o_totalprice >= 300000.0 THEN 2
                      WHEN o_orderpriority = '1-URGENT' THEN 3
                      ELSE 4 END AS priority,
                 COUNT(*) AS cnt, ${dsumSql("o_totalprice")} AS total
          FROM orders GROUP BY 1 ORDER BY priority""",

    "q22_coalesce_ladder" ->
      """SELECT COALESCE(NULLIF(c_mktsegment, 'AUTOMOBILE'), NULLIF(c_name, 'none'), 'fallback') AS resolved,
                COUNT(*) AS cnt
         FROM customer GROUP BY 1 ORDER BY resolved""",

    "q23_date_trunc" ->
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
                 strftime(o_orderdate, '%Y-%m') AS ym,
                 COUNT(*) AS cnt, ${dsumSql("o_totalprice")} AS total
          FROM orders GROUP BY 1, 2 ORDER BY month""",

    "q24_datediff" ->
      """SELECT wait_days, COUNT(*) AS cnt FROM (
           SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(MAX(l_shipdate) AS DATE)) AS BIGINT) AS wait_days
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           GROUP BY o_orderkey, o_orderdate)
         GROUP BY wait_days ORDER BY wait_days""",

    "q25_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS cnt,
                CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
         FROM customer JOIN nation ON c_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""",

    "q26_events_hourly" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
                 COUNT(*) AS cnt, ${dsumSql("value", 6)} AS value_sum
          FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",

    "q27_paging_math" ->
      """SELECT o_orderstatus, COUNT(*) AS total_results,
                CAST(CEIL(COUNT(*) / 2000.0) AS BIGINT) AS num_pages
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q28_string_fns" ->
      """SELECT p_partkey,
                string_split(p_name, ' ')[1] AS first_word,
                string_split(p_name, ' ')[-1] AS last_word,
                trim('  ' || p_brand || '  ') AS brand_trim,
                regexp_extract(p_type, '^(\w+) (\w+)', 1) AS type_head,
                regexp_extract(p_type, '^(\w+) (\w+)', 2) AS type_mid,
                regexp_replace('db://user:secret@host/' || p_brand,
                               '://([^:]+):[^@]+@', '://\1:***@') AS masked_uri
         FROM part ORDER BY p_partkey""",

    "q29_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
                CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
  )
}
