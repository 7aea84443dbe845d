package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import QueryUtil._

/** Advanced EXT operators (SURVEY.md §2.3 EXT joins, §2.9 T5 batch
  * analog): sessionization, as-of join, range join. Each is written the
  * way it survives 100 TB — window functions over a single shuffle on the
  * entity key, broadcast of the small side of the non-equi join.
  */
object Advanced {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  /** Max edit distance for the fuzzy brand-pair linkage (q97) — also
    * bounds the length-band blocking predicate (|len Δ| ≤ d is implied
    * by lev ≤ d, so the band never drops a true match). */
  val FuzzyMaxDist = 2

  /** Minimum pair co-occurrence count for q98 — by the Apriori
    * property also the item-support prefilter bound (an item in any
    * qualifying pair has support ≥ the pair's support). */
  val MinSupport = 2L

  /** q98's giant-basket population cap (oracle-mirrored via QUALIFY):
    * binds nothing on TPC-H (≤ 7 items/order at every SF) but bounds a
    * real cart/session basket's C(size, 2) fanout — see
    * Analytics.coOccurrence. */
  val MaxBasketItems = graft.operators.Analytics.DefaultMaxBasketItems

  /** Explicit pivot column set for q100 — pivot values MUST be declared,
    * not discovered: discovery is an extra job AND makes the output
    * schema data-dependent (a new event type would silently widen the
    * table). Shared with the oracle's CASE ladder. */
  val PivotEventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Shared long→wide reshape for q100 (pivot) and q102 (unpivot). */
  private def pivotWide(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(date_trunc("day", $"ts").as("day"))
      .pivot("event_type", PivotEventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, PivotEventTypes)
  }

  val queries: Map[String, Q] = Map(
    // Windowed anomaly detection over the event stream: flag hours whose
    // count spikes > 3σ above the trailing 24-observed-hours baseline.
    // The 3σ test is algebraically rearranged into INTEGER arithmetic —
    // (W·x − Σ)² > 9·(W·Σx² − Σ²) with W = 24 — so there is no stddev/
    // sqrt to drift by ulps between engines. One shuffle (event_type
    // window); per-group trailing frames, no global sort of the stream.
    "q71_anomaly_hours" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"hour")
        .rowsBetween(-24, -1)
      t(s, dir, "events")
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("wn", count(lit(1)).over(w))
        .withColumn("wsum", sum($"cnt").over(w))
        .withColumn("wsumsq", sum($"cnt" * $"cnt").over(w))
        .filter($"wn" === 24) // full baseline only
        .filter($"cnt" * 24 > $"wsum") // spike, not dip
        .filter(($"cnt" * 24 - $"wsum") * ($"cnt" * 24 - $"wsum") >
                ($"wsumsq" * 24 - $"wsum" * $"wsum") * 9)
        .select($"event_type", $"hour", $"cnt", $"wsum".as("baseline_sum"))
        .orderBy("event_type", "hour")
    }),

    // T5 batch analog of session_window: gap-based sessionization via
    // lag + cumulative sum — one shuffle on user_id, no state store.
    "q43_sessionize" -> ((s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc)
      t(s, dir, "events")
        .withColumn("prev_ts", lag($"ts", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_ts".isNull ||
               unix_micros($"ts") - unix_micros($"prev_ts") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum($"new_session").over(byUser))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("events"),
             dsum($"value", 6).as("value_sum"),
             ((unix_micros(max($"ts")) - unix_micros(min($"ts"))) / lit(1000000L))
               .cast("long").as("duration_s"))
        .orderBy("user_id", "session_id")
    }),

    // EXT as-of join: latest order at-or-before each event, per entity.
    // Equi-join on the key + row_number keeps it a hash join, not a BNL;
    // at scale both sides shuffle once on the key.
    "q44_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .filter($"user_id" <= 50)
        .select($"event_id", $"user_id", $"ts")
      val ord = t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      val w = Window.partitionBy($"event_id")
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      ev.join(ord, $"user_id" === $"o_custkey" && $"o_orderdate" <= $"ts", "left")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"event_id", $"user_id",
                $"o_orderkey".as("asof_orderkey"),
                $"o_totalprice".as("asof_totalprice"))
        .orderBy("event_id")
    }),

    // Funnel analysis: per-user ordered-stage progression (first view →
    // first click after it → first purchase after that). Three chained
    // full-partition window aggregates over ONE user_id shuffle — no
    // self-joins, no per-stage passes over the event log. Null stage
    // timestamps mean the user never reached that stage.
    "q78_funnel" -> ((s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id")
      t(s, dir, "events")
        .filter($"event_type".isin("view", "click", "purchase"))
        .select($"user_id", $"event_type", $"ts")
        .withColumn("v_ts",
          min(when($"event_type" === "view", $"ts")).over(byUser))
        .withColumn("c_ts",
          min(when($"event_type" === "click" && $"ts" > $"v_ts", $"ts")).over(byUser))
        .withColumn("p_ts",
          min(when($"event_type" === "purchase" && $"ts" > $"c_ts", $"ts")).over(byUser))
        .groupBy($"user_id")
        .agg(min($"v_ts").as("v_ts"), min($"c_ts").as("c_ts"),
             min($"p_ts").as("p_ts"))
        .orderBy("user_id")
    }),

    // Time-range sliding window: per event, this user's activity over the
    // trailing hour — a RANGE frame on integer epoch-micros (identical
    // frame semantics in any engine, no interval-arithmetic divergence).
    // Money sums in integer cents: ROUND(value*100) is one IEEE multiply
    // + one deterministic round, and BIGINT sums are order-independent.
    "q79_time_window" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"tsu")
        .rangeBetween(-3600L * 1000000L, 0L)
      t(s, dir, "events")
        .select($"event_id", $"user_id", unix_micros($"ts").as("tsu"),
                round($"value" * 100.0).cast("long").as("cents"))
        .withColumn("cnt_1h", count(lit(1)).over(w))
        .withColumn("cents_1h", sum($"cents").over(w))
        .select($"event_id", $"user_id", $"cnt_1h", $"cents_1h")
        .orderBy("event_id")
    }),

    // Equi-width histogram of order totals: bucket id from one IEEE
    // divide + floor (no width_bucket engine-semantics to match), counts
    // and exact bucket bounds. The profiling complement to q70 — shape of
    // a distribution, not just min/max.
    // Streaming windowed aggregation, batch-replay oracle (the events-
    // side sibling of q85): the REAL streaming path — file source,
    // event-time watermark, append mode (only watermark-closed windows
    // emit), AvailableNow — hash-compared against SQL computing the same
    // hourly aggregate restricted to the same close condition
    // (window end ≤ max(ts) − the 2 h lateness bound). This gates the
    // watermark/window semantics themselves, not just the arithmetic.
    "q91_stream_hourly" -> ((s, dir) => {
      graft.streaming.EventsStream.replayHourly(s, dir)
        .orderBy("window_start", "event_type")
    }),

    // Session-window streaming semantics, batch-replay oracle (q91's
    // sibling for the merge-on-overlap window family): session_window
    // merges an event into a session iff it lands strictly inside
    // last-event + gap (diff >= gap starts a new session — mirrored with
    // >= in the oracle, unlike q43's batch islands which use >), and a
    // session emits when the watermark passes its end. The oracle
    // rebuilds sessions with gaps-and-islands and applies the same close
    // condition.
    "q92_stream_sessions" -> ((s, dir) => {
      graft.streaming.EventsStream.replaySessions(s, dir)
        .orderBy("user_id", "session_start")
    }),

    // Sliding-window streaming semantics, batch-replay oracle — the
    // overlapping member of the window family (q91 tumbling, q92
    // session). Every event belongs to exactly 2 epoch-aligned 1h/30m
    // windows; the oracle expands each event into both its window starts
    // and applies the same per-window close condition as q91.
    "q109_stream_sliding" -> ((s, dir) => {
      graft.streaming.EventsStream.replaySliding(s, dir)
        .orderBy("window_start", "event_type")
    }),

    // Session windows REBUILT in arbitrary user state
    // (flatMapGroupsWithState + EventTimeTimeout): interval-merge logic,
    // closed sessions buffered in state until the watermark passes
    // their end, value sums as exact decimal micro-units. Must emit
    // exactly what the native session_window emits — gated by the SAME
    // oracle as q92, which is the strongest statement the custom-state
    // surface can make.
    "q114_stream_custom_sessions" -> ((s, dir) => {
      graft.streaming.EventsStream.replayCustomSessions(s, dir)
        .orderBy("user_id", "session_start")
    }),

    // Arbitrary keyed state (mapGroupsWithState) through the real
    // engine: per-user running totals accumulated in the state store
    // across micro-batches, update-mode emissions captured via
    // foreachBatch, final snapshot = max(events) per user (running
    // counts are strictly increasing, so the extraction is batching-
    // independent). Gates the custom-state path's exactly-once-per-event
    // accounting against the plain batch aggregate.
    "q113_stream_state_totals" -> ((s, dir) => {
      graft.streaming.EventsStream.replayRunningTotals(s, dir)
        .orderBy("user_id")
    }),

    "q80_histogram" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select(floor($"o_totalprice" / 50000.0).cast("long").as("bucket"),
                $"o_totalprice")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("cnt"),
             min($"o_totalprice").as("lo"),
             max($"o_totalprice").as("hi"))
        .orderBy("bucket")
    }),

    // EXT range join: band lookup on a value interval. The band table is
    // tiny and broadcast → a broadcast nested-loop the executor evaluates
    // per row; no shuffle of the fact side.
    "q45_range_join" -> ((s, dir) => {
      import s.implicits._
      val bands = broadcast(Seq(
        ("budget", 900.0, 935.0),
        ("mid", 935.0, 970.0),
        ("premium", 970.0, 1000.0)
      ).toDF("band", "lo", "hi"))
      t(s, dir, "part")
        .join(bands, $"p_retailprice" >= $"lo" && $"p_retailprice" < $"hi", "left")
        .groupBy($"band")
        .agg(count(lit(1)).as("cnt"),
             sum($"p_retailprice".cast(DecimalType(18, 2))).cast("double").as("price_sum"))
        .orderBy($"band".asc_nulls_first)
    }),

    // Cohort retention: users grouped by first-seen week, activity
    // counted per week offset — the engagement matrix behind every
    // retention dashboard. Scale shape: the first-seen timestamp rides
    // on the event rows via a window min (ONE shuffle on user_id — no
    // self-join back), then the cohort cell aggregate is a second,
    // cardinality-bounded shuffle on (cohort_week, week_offset). Week
    // offsets divide exactly (both ends Monday-truncated), so the
    // arithmetic is integer end-to-end.
    "q95_cohort_retention" -> ((s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id")
      t(s, dir, "events")
        .select($"user_id", $"ts")
        .withColumn("first_ts", min($"ts").over(byUser))
        .select($"user_id",
                date_trunc("week", $"first_ts").as("cohort_week"),
                (datediff(date_trunc("week", $"ts"),
                          date_trunc("week", $"first_ts")) / 7)
                  .cast("long").as("week_offset"))
        .groupBy($"cohort_week", $"week_offset")
        .agg(countDistinct($"user_id").as("users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // EXT fuzzy join (record linkage): near-identical part names within
    // a brand, verified by edit distance, reported as the per-brand
    // linkage summary (row-pair count + exact distance mass — identical
    // to the naive part×part self-join the oracle runs).
    //
    // Scale shape, in priority order:
    //  1. VALUE-SPACE COLLAPSE: group to distinct (brand, name) with
    //     multiplicities FIRST — the edit-distance verify then runs over
    //     name pairs, not row pairs (64 distinct names vs 20k rows at
    //     sf0.1 ≈ 160× fewer levenshteins; row-pair counts come back via
    //     mA·mB / C(m,2) multiplication, exactly). This is the move that
    //     survives 100 TB whenever the value domain is smaller than the
    //     row count — and when it isn't, the block key widens to
    //     (brand, length bucket) and hot blocks get salted
    //     (Joins.saltedJoin).
    //  2. The cheap length-band predicate prunes before levenshtein
    //     (|lenΔ| ≤ d is implied by lev ≤ d — never drops a match).
    //  3. The levenshtein itself is THRESHOLD-BANDED (O(d·len), returns
    //     −1 above d) — never pays the full O(len²) DP on a far pair.
    "q97_fuzzy_brand_pairs" -> ((s, dir) => {
      import s.implicits._
      // withPersisted: the distinct-name relation feeds BOTH self-join
      // sides — unpersisted, each side would re-run the full part scan
      // + aggregation (the multi-consumer re-execution pitfall).
      graft.operators.Dedup.withPersisted(
        t(s, dir, "part")
          .groupBy($"p_brand", $"p_name").agg(count(lit(1)).as("m"))) { g =>
      val a = g.select($"p_brand", $"p_name".as("a_name"), $"m".as("ma"))
      val b = g.select($"p_brand", $"p_name".as("b_name"), $"m".as("mb"))
      a.join(b, Seq("p_brand"))
        .filter($"a_name" <= $"b_name")
        .filter(abs(length($"a_name") - length($"b_name")) <= FuzzyMaxDist)
        .withColumn("dist", levenshtein($"a_name", $"b_name", FuzzyMaxDist))
        .filter($"dist" >= 0) // banded: −1 means > threshold
        .withColumn("npairs", // row pairs this name pair stands for
          when($"a_name" === $"b_name", ($"ma" * ($"ma" - 1) / 2).cast("long"))
            .otherwise($"ma" * $"mb"))
        // npairs = 0 only for singleton self-pairs (m = 1, a == b): the
        // oracle's row-level self-join (l < r) emits no row for those, so
        // a brand with ONLY singleton names must produce no group at all
        // — result-neutral for brands with real pairs (0 adds nothing).
        .filter($"npairs" > 0)
        .groupBy($"p_brand")
        .agg(sum($"npairs").cast("long").as("pairs"),
             sum($"dist" * $"npairs").cast("long").as("dist_sum"))
        .orderBy("p_brand")
      }
    }),

    // EXT market-basket co-occurrence (association mining, pair level):
    // parts bought together in an order, with supports + basket count
    // riding along so confidence/lift are one division away — kept as
    // exact integers for cross-engine hashing. Scale shape:
    //  - Apriori prune FIRST: an item in any pair with support ≥ T has
    //    item support ≥ T, so low-support items drop before the
    //    quadratic per-basket expansion (on skewed real data this is
    //    the df-cap analog; a giant basket needs a per-basket item cap
    //    the same way a hot shingle needs maxShingleDf);
    //  - the basket self-join shuffles on the basket key once, and the
    //    per-basket pair fanout is C(basket size, 2)-bounded;
    //  - item supports join back via broadcast (item dim ≪ pair count);
    //  - the basket relation is persisted across its three consumers
    //    (supports, pair sides).
    "q98_item_pairs" -> ((s, dir) =>
      graft.operators.Analytics.coOccurrence(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey", MinSupport,
        maxBasketItems = MaxBasketItems)
        .orderBy("part_a", "part_b")),

    // Relational pivot: long → wide with a DECLARED value set (see
    // PivotEventTypes). groupBy().pivot(col, values) skips the extra
    // distinct-discovery job and keeps the schema static — both
    // requirements at 100 TB. Absent cells are zero-filled to match the
    // oracle's CASE-count semantics.
    "q100_pivot" -> ((s, dir) => pivotWide(s, dir).orderBy("day")),

    // The inverse operator: unpivot (melt) the wide frame back to long
    // form — `Dataset.unpivot` is a zero-shuffle narrow reshape (each
    // wide row emits one long row per value column in place). Gated
    // against the dense day × type long form.
    "q102_unpivot" -> ((s, dir) =>
      pivotWide(s, dir)
        .unpivot(Array(col("day")), PivotEventTypes.map(col).toArray,
                 "event_type", "cnt")
        .orderBy("day", "event_type")),

    // SCD2 (slowly-changing-dimension) interval build: collapse each
    // user's event-type history into validity intervals [valid_from,
    // valid_to) — consecutive same-type events merge into one segment,
    // the current segment stays open (null valid_to). The warehouse
    // temporal-table op: lag to mark changes, running sum to number
    // segments, one min/max aggregate per segment. ONE shuffle on
    // user_id shared by both windows; ties broken by event_id for a
    // total order.
    "q104_scd2_intervals" -> ((s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("chg",
          when(lag($"event_type", 1).over(byUser).isNull ||
               lag($"event_type", 1).over(byUser) =!= $"event_type", 1L)
            .otherwise(0L))
        .withColumn("seg", sum($"chg").over(byUser))
        .groupBy($"user_id", $"seg", $"event_type")
        .agg(min($"ts").as("valid_from"), count(lit(1)).as("n_events"))
        .withColumn("valid_to",
          lead($"valid_from", 1).over(
            Window.partitionBy($"user_id").orderBy($"seg")))
        .select($"user_id", $"seg", $"event_type", $"valid_from",
                $"valid_to", $"n_events")
        .orderBy("user_id", "seg")
    }),

    // Stream-stream interval join through the REAL engine (file source,
    // two watermarked sides, event-time-bounded state) — closes the
    // last spec-only streaming path with an oracle row (q91/q92
    // pattern). Inner matches emit once both sides arrive, so the
    // bounded replay equals the batch condition join the oracle runs.
    "q103_stream_interval_join" -> ((s, dir) =>
      graft.streaming.EventsStream.replayIntervalJoin(s, dir)
        .orderBy("event_id", "fact_id")),

    // Time-series gap filling: a dense hour spine per event type (the
    // 1-row min/max span broadcast into the tiny type dimension,
    // sequence + explode), left-joined counts, zero fill + last-known
    // forward fill. The hourly aggregate is the only corpus-width
    // shuffle; the forward-fill window partitions on event_type. The
    // spine stays spine-sized at any corpus scale (hours × types) —
    // for high-cardinality entity spines the same explode parallelizes
    // per entity.
    "q101_gap_fill" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val hourly = ev
        .groupBy($"event_type", date_trunc("hour", $"ts").as("hr"))
        .agg(count(lit(1)).as("c"))
      val span = ev.agg(date_trunc("hour", min($"ts")).as("lo"),
                        date_trunc("hour", max($"ts")).as("hi"))
      val spine = ev.select($"event_type").distinct()
        .crossJoin(broadcast(span)) // 1-row span side
        .select($"event_type",
                explode(sequence($"lo", $"hi", expr("interval 1 hour"))).as("hr"))
      val w = Window.partitionBy($"event_type").orderBy($"hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly, Seq("event_type", "hr"), "left")
        .withColumn("cnt", coalesce($"c", lit(0L)))
        .withColumn("carried",
          coalesce(last($"c", ignoreNulls = true).over(w), lit(0L)))
        .select($"event_type", $"hr", $"cnt", $"carried")
        .orderBy("event_type", "hr")
    })
  )

  /** Shared by q92 (native session_window) and q114 (the custom-state
    * rebuild): gaps-and-islands sessions under the session_window merge
    * rule (diff >= gap starts new) and the watermark close condition. */
  private val sessionsOracleSql =
    s"""WITH mx AS (SELECT MAX(ts) AS m FROM events),
        marked AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                           >= 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)),
        sessioned AS (
          SELECT *, SUM(new_session) OVER
                 (PARTITION BY user_id ORDER BY ts ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
          FROM marked),
        sess AS (
          SELECT MIN(ts) AS session_start,
                 MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                 user_id, COUNT(*) AS events,
                 ${dsumSql("value", 6)} AS value_sum
          FROM sessioned GROUP BY user_id, session_id)
        SELECT session_start, session_end, user_id, events, value_sum
        FROM sess, mx
        WHERE session_end <= m - INTERVAL 2 HOUR
        ORDER BY user_id, session_start"""

  val oracle: Map[String, String] = Map(
    "q71_anomaly_hours" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS cnt
           FROM events GROUP BY 1, 2),
         stats AS (
           SELECT event_type, hour, cnt,
                  COUNT(*) OVER w AS wn,
                  CAST(SUM(cnt) OVER w AS BIGINT) AS wsum,
                  CAST(SUM(cnt * cnt) OVER w AS BIGINT) AS wsumsq
           FROM hourly
           WINDOW w AS (PARTITION BY event_type ORDER BY hour
                        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         SELECT event_type, hour, cnt, wsum AS baseline_sum
         FROM stats
         WHERE wn = 24 AND cnt * 24 > wsum
           AND (cnt * 24 - wsum) * (cnt * 24 - wsum) >
               (wsumsq * 24 - wsum * wsum) * 9
         ORDER BY event_type, hour""",

    "q43_sessionize" ->
      s"""WITH marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)),
          sessioned AS (
            SELECT *, CAST(SUM(new_session) OVER
                   (PARTITION BY user_id ORDER BY ts ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
            FROM marked)
          SELECT user_id, session_id, COUNT(*) AS events,
                 ${dsumSql("value", 6)} AS value_sum,
                 CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT)
                   AS duration_s
          FROM sessioned GROUP BY user_id, session_id
          ORDER BY user_id, session_id""",

    "q78_funnel" ->
      """WITH f AS (SELECT user_id, event_type, ts FROM events
                    WHERE event_type IN ('view', 'click', 'purchase')),
         w1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
                            OVER (PARTITION BY user_id) AS v_ts FROM f),
         w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > v_ts
                                   THEN ts END)
                            OVER (PARTITION BY user_id) AS c_ts FROM w1),
         w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > c_ts
                                   THEN ts END)
                            OVER (PARTITION BY user_id) AS p_ts FROM w2)
         SELECT user_id, MIN(v_ts) AS v_ts, MIN(c_ts) AS c_ts, MIN(p_ts) AS p_ts
         FROM w3 GROUP BY user_id ORDER BY user_id""",

    "q79_time_window" ->
      """SELECT event_id, user_id,
                COUNT(*) OVER w AS cnt_1h,
                CAST(SUM(cents) OVER w AS BIGINT) AS cents_1h
         FROM (SELECT event_id, user_id, epoch_us(ts) AS tsu,
                      CAST(ROUND(value * 100.0) AS BIGINT) AS cents
               FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY tsu
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "q80_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
                COUNT(*) AS cnt, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
         FROM orders GROUP BY 1 ORDER BY bucket""",

    // Session mirror: islands with the session_window merge rule
    // (>= gap starts new), end = last event + gap, closed sessions only.
    "q92_stream_sessions" -> sessionsOracleSql,

    // the custom-state session rebuild must emit EXACTLY what the
    // native session_window emits: one oracle, two engines' worth of
    // session machinery gated against it
    "q114_stream_custom_sessions" -> sessionsOracleSql,

    "q113_stream_state_totals" ->
      """SELECT user_id, COUNT(*) AS events
         FROM events GROUP BY 1 ORDER BY user_id""",

    // Sliding-window close mirror: each event expands into its two
    // 30-min-phased window starts (both always contain the event, since
    // slide < length and windows are epoch-aligned); a window copy
    // emits once its end <= watermark, exactly as tumbling.
    "q109_stream_sliding" ->
      s"""WITH mx AS (SELECT MAX(ts) AS m FROM events),
          cand AS (
            SELECT event_type, value,
                   UNNEST([time_bucket(INTERVAL 30 MINUTE, ts),
                           time_bucket(INTERVAL 30 MINUTE, ts)
                             - INTERVAL 30 MINUTE]) AS window_start
            FROM events)
          SELECT window_start, event_type, COUNT(*) AS cnt,
                 ${dsumSql("value", 6)} AS value_sum
          FROM cand, mx
          WHERE window_start + INTERVAL 1 HOUR <= m - INTERVAL 2 HOUR
          GROUP BY 1, 2 ORDER BY window_start, event_type""",

    // Window close mirror: Spark emits an append-mode window once
    // window.end <= watermark = max event time - lateness.
    "q91_stream_hourly" ->
      s"""WITH mx AS (SELECT MAX(ts) AS m FROM events)
          SELECT date_trunc('hour', ts) AS window_start, event_type,
                 COUNT(*) AS cnt, ${dsumSql("value", 6)} AS value_sum
          FROM events, mx
          WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 2 HOUR
          GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "q44_asof_join" ->
      """SELECT event_id, user_id, asof_orderkey, asof_totalprice FROM (
           SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey,
                  o.o_totalprice AS asof_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY e.event_id
                                     ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
           FROM (SELECT event_id, user_id, ts FROM events WHERE user_id <= 50) e
           LEFT JOIN orders o
             ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
         WHERE rn = 1 ORDER BY event_id""",

    "q45_range_join" ->
      """WITH bands(band, lo, hi) AS (
           VALUES ('budget', 900.0, 935.0), ('mid', 935.0, 970.0),
                  ('premium', 970.0, 1000.0))
         SELECT band, COUNT(*) AS cnt,
                CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
         FROM part LEFT JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
         GROUP BY band ORDER BY band NULLS FIRST""",

    "q95_cohort_retention" ->
      """WITH e AS (SELECT user_id, ts,
                           MIN(ts) OVER (PARTITION BY user_id) AS first_ts
                    FROM events)
         SELECT CAST(date_trunc('week', first_ts) AS TIMESTAMP) AS cohort_week,
                CAST(date_diff('day', CAST(date_trunc('week', first_ts) AS DATE),
                               CAST(date_trunc('week', ts) AS DATE)) // 7
                     AS BIGINT) AS week_offset,
                COUNT(DISTINCT user_id) AS users
         FROM e GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",

    "q97_fuzzy_brand_pairs" ->
      s"""SELECT a.p_brand AS p_brand, COUNT(*) AS pairs,
                 CAST(SUM(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS dist_sum
          FROM part a JOIN part b
            ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
           AND abs(length(a.p_name) - length(b.p_name)) <= $FuzzyMaxDist
           AND levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDist
          GROUP BY 1 ORDER BY p_brand""",

    "q98_item_pairs" ->
      s"""WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          li AS (SELECT * FROM li0
                 QUALIFY COUNT(*) OVER (PARTITION BY l_orderkey) <= $MaxBasketItems),
          sup AS (SELECT l_partkey, COUNT(*) AS sup FROM li GROUP BY 1),
          nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM li),
          pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   COUNT(*) AS cnt
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= $MinSupport)
          SELECT part_a, part_b, cnt, sa.sup AS sup_a, sb.sup AS sup_b,
                 CAST(n_baskets AS BIGINT) AS n_baskets
          FROM pairs JOIN sup sa ON part_a = sa.l_partkey
                     JOIN sup sb ON part_b = sb.l_partkey, nb
          ORDER BY part_a, part_b""",

    "q100_pivot" -> {
      val cases = PivotEventTypes.map(t =>
        s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS $t").mkString(",\n")
      s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 $cases
          FROM events GROUP BY 1 ORDER BY day"""
    },

    "q104_scd2_intervals" ->
      """WITH marked AS (
           SELECT user_id, ts, event_id, event_type,
                  CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                       THEN 1 ELSE 0 END AS chg
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         seg AS (
           SELECT *, SUM(chg) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS seg
           FROM marked),
         segs AS (
           SELECT user_id, seg, event_type,
                  MIN(ts) AS valid_from, COUNT(*) AS n_events
           FROM seg GROUP BY 1, 2, 3)
         SELECT user_id, CAST(seg AS BIGINT) AS seg, event_type,
                valid_from,
                lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg)
                  AS valid_to,
                n_events
         FROM segs ORDER BY user_id, seg""",

    "q103_stream_interval_join" ->
      """SELECT l.event_id AS event_id, r.event_id AS fact_id,
                l.user_id AS user_id
         FROM events l JOIN events r
           ON l.user_id = r.user_id
          AND l.event_type = 'click' AND r.event_type = 'purchase'
          AND r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts
         ORDER BY event_id, fact_id""",

    "q102_unpivot" -> {
      val typeRows = PivotEventTypes.map(t => s"('$t')").mkString(", ")
      s"""WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
          types(event_type) AS (VALUES $typeRows),
          h AS (SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS c
                FROM events GROUP BY 1, 2)
          SELECT CAST(d.day AS TIMESTAMP) AS day, t.event_type,
                 CAST(COALESCE(c, 0) AS BIGINT) AS cnt
          FROM days d CROSS JOIN types t
          LEFT JOIN h ON h.day = d.day AND h.event_type = t.event_type
          ORDER BY day, t.event_type"""
    },

    "q101_gap_fill" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS c
           FROM events GROUP BY 1, 2),
         span AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
                         date_trunc('hour', MAX(ts)) AS hi FROM events),
         spine AS (
           SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
           FROM (SELECT DISTINCT event_type FROM events), span)
         SELECT s.event_type, CAST(s.hr AS TIMESTAMP) AS hr,
                CAST(COALESCE(c, 0) AS BIGINT) AS cnt,
                CAST(COALESCE(LAST_VALUE(c IGNORE NULLS) OVER (
                       PARTITION BY s.event_type ORDER BY s.hr
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                     AS BIGINT) AS carried
         FROM spine s LEFT JOIN hourly h
           ON s.event_type = h.event_type AND s.hr = h.hr
         ORDER BY s.event_type, s.hr"""
  )
}
