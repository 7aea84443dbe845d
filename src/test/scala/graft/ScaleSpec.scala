package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Scale-mechanics evidence: bucketed co-located joins (SURVEY K6 — the
  * "index" analog), salted skew joins, and pushdown assertions. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    // Counts the INITIAL physical plan's exchanges — the distribution
    // requirements Catalyst planned. (The noop write executes a separate
    // cloned query execution, so AQE never finalizes THIS plan; that is
    // fine here, since AQE only reuses/coalesces exchanges, never adds
    // one, so the initial count is the upper bound these tests pin.)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    var n = 0
    finalPlan.foreach { case _: ShuffleExchangeExec => n += 1; case _ => }
    n
  }

  test("inverted index: shard grouping adds NO shuffle beyond the term one") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // expected exchanges: (1) the doc/term tf aggregation, (2) the term
    // window partitioning; the (term, shard, doc_freq) collect_list
    // grouping must reuse HashPartitioning(term) — a third exchange here
    // means the sharding broke the plan
    assert(countShuffles(graft.operators.Search.invertedIndex(docs)) == 2)
  }

  test("SCD2 intervals: windows + segment aggregate share ONE user_id shuffle") {
    // expected exchanges: (1) hashpartitioning(user_id) feeding the
    // lag/cumsum windows, REUSED by the (user_id, seg, type) aggregate
    // (partial/final adjacent — user_id alone determines the partition)
    // and the closing lead window; (2) the final ORDER BY. A third
    // exchange means the segment aggregate stopped reusing the window
    // partitioning.
    val q = graft.queries.Advanced.queries("q104_scd2_intervals")(
      spark, "/root/testdata/sf0.001")
    assert(countShuffles(q) == 2)
  }

  test("export manifest: ONE shard exchange plus the final sort") {
    val q = graft.queries.Curation.queries("q93_export_manifest")(
      spark, "/root/testdata/sf0.001")
    assert(countShuffles(q) == 2)
  }

  test("persisted LSH band index: a delta probe costs one delta-side shuffle only") {
    import graft.operators.Dedup
    spark.sql("DROP TABLE IF EXISTS band_idx")
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def bandsOf(d: org.apache.spark.sql.DataFrame) =
      Dedup.bandKeys(
        Dedup.minhashSignatures(Dedup.shingleSets(d)), 16, 4, sigLen = 64)
    // corpus band index persisted bucketed on the probe key — the 100 TB
    // layout the incremental-dedup scaladoc promises
    bandsOf(docs.filter($"doc_id" % 10 =!= 0))
      .write.bucketBy(8, "band", "bkey").sortBy("band", "bkey")
      .saveAsTable("band_idx")
    val idx = spark.table("band_idx")
    // localCheckpoint stands in for "the delta's band keys, computed":
    // only the probe's own exchanges should be counted
    val delta = bandsOf(docs.filter($"doc_id" % 10 === 0)).localCheckpoint()
      .repartition(8, col("band"), col("bkey"))
    val probe = delta.as("x").join(idx.as("y"),
      col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
      col("x.doc_id") =!= col("y.doc_id"))
    // the index side reads pre-bucketed — only the (small) delta shuffles
    assert(countShuffles(probe) == 1)
    assert(probe.count() > 0) // fixture has cross corpus/delta dups
    spark.sql("DROP TABLE IF EXISTS band_idx")
  }

  test("K6: joining two tables bucketed on the key needs zero shuffles") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val dir = "/root/testdata/sf0.001"
    Tables.load(spark, dir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.load(spark, dir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    // disable broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey").agg(count(lit(1)).as("n"))
      assert(countShuffles(j) == 0, "bucketed join+agg should be shuffle-free")
      // sanity: same join un-bucketed shuffles both sides
      val raw = Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      assert(countShuffles(raw) >= 2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join: identical result to the plain join, salt spreads a hot key") {
    val hot = (1 to 500).map(i => ("hot", i.toLong)) ++ Seq(("cold", 1L))
    val large = hot.toDF("k", "v")
    val small = Seq(("hot", "H"), ("cold", "C")).toDF("k", "tag")
    val plain = large.join(small, "k").groupBy("k", "tag").count()
    val salted = Joins.saltedJoin(large, small, "k", factor = 8, saltCols = Seq("v"))
      .groupBy("k", "tag").count()
    assert(plain.orderBy("k").collect().toSeq == salted.orderBy("k").collect().toSeq)
    // the salt column spreads the hot key across the factor space
    val saltSpread = large
      .withColumn("_salt", pmod(xxhash64($"v"), lit(8L)))
      .filter($"k" === "hot").select("_salt").distinct().count()
    assert(saltSpread == 8)
  }

  test("pushdown: filters and projections reach the parquet scan") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .filter($"l_quantity" > 30).select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(l_quantity,30.0"),
      s"missing pushed filter in: $scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"missing pruned schema in: $scan")
  }

  test("top-k per group plans WindowGroupLimit: only k rows per group survive each shuffle side") {
    // The q12 shape. Spark's rank-limit pushdown inserts a PARTIAL
    // WindowGroupLimit below the exchange (map-side k-per-group prune)
    // and a FINAL one above - at 100 TB the shuffle carries k rows per
    // group instead of every row, which is the difference between a
    // top-k that scales and one that moves the corpus.
    import org.apache.spark.sql.expressions.Window
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val w = Window.partitionBy($"l_orderkey").orderBy($"l_extendedprice".desc)
    val topk = li.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    topk.write.format("noop").mode("overwrite").save()
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"expected map-side WindowGroupLimit in:\n${plan.take(1500)}")
  }

  test("selective join injects a runtime bloom filter into the probe-side scan") {
    // Spark's runtime-filter optimization: a bloom built from the
    // filtered build side is pushed into the big side's scan, pruning
    // rows BEFORE the shuffle. Default size thresholds target real
    // scans (10GB probe side), so this only manifests at cluster scale;
    // the spec lowers the application-side threshold to prove the
    // mechanism fires on our plan shapes.
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      val ord = Tables.load(spark, "/root/testdata/sf0.001", "orders")
        .filter($"o_orderpriority" === "1-URGENT")
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey")).groupBy().count()
      j.collect()
      assert(j.queryExecution.executedPlan.toString.toLowerCase.contains("bloom"),
        "expected a runtime bloom filter in the probe-side scan")
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      prev.foreach(v => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
      if (prev.isEmpty) spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("AQE splits a runtime-skewed join partition (the unsalted safety net)") {
    // q111's salting handles KNOWN hot keys; for skew discovered only at
    // runtime the engine's own OptimizeSkewedJoin must carry the plan —
    // AQE replans the sort-merge join with the oversized partition split
    // across tasks. Default thresholds target 256 MB partitions; the
    // spec lowers them to prove the rewrite fires on our join shapes.
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    try {
      // one hot key carrying ~100× the rows of every other key; the
      // payload column rides through to the OUTPUT so the hot partition
      // is genuinely oversized in bytes (a k-only projection would prune
      // it to nothing), and no downstream operator requires the join's
      // hash partitioning (a keyed agg above the join would veto the
      // split, since split partitions no longer satisfy its
      // distribution)
      val skewed = spark.range(0, 20000)
        .select(when($"id" < 19000, lit(7L)).otherwise($"id").as("k"),
                concat(lit("payload-padding-"), $"id").as("v"))
      val dim = spark.range(0, 200).select($"id".as("k"), ($"id" * 2).as("w"))
      val j = skewed.join(dim, "k")
      // collect() executes THIS dataset's queryExecution — a .write would
      // plan a separate one, leaving this plan un-finalized by AQE
      j.collect()
      val finalPlan = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(finalPlan.toString.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the hot partition:\n$finalPlan")
    } finally {
      Seq("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes")
        .foreach(spark.conf.unset)
      prev.foreach(v => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
      if (prev.isEmpty) spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
