package graft

import org.apache.spark.sql.functions._

import graft.queries.Curation

/** Semantic invariants of the curation queries, beyond the DuckDB oracle
  * (which pins the exact answer — these pin the MEANING). */
class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q54: a verbatim copy of a benchmark doc is flagged contaminated") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    // doc_id 0 is in the benchmark split (0 % 20 == 0); plant a copy at a
    // corpus id.
    val benchText = docs.filter($"doc_id" === 0).select("text").head().getString(0)
    val planted = docs.select($"doc_id", $"text")
      .union(Seq((999983L, benchText)).toDF("doc_id", "text"))
    val sh = graft.operators.Dedup.explodedShingles(
      graft.operators.Dedup.shingleSets(planted))
    val bench = sh.filter($"doc_id" % 20 === 0).select("shingle").distinct()
    val flagged = sh.filter($"doc_id" % 20 =!= 0)
      .join(broadcast(bench), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
      .filter($"hits" >= Curation.ContaminationHits)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.contains(999983L))
  }

  test("q55: kept set is exactly the hash-mod subset (reproducible, per-stratum)") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val kept = Curation.queries("q55_stratified_sample")(spark, dir)
      .select("lang", "kept").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = docs
      .withColumn("rate", when($"lang" === "en", 50L).when($"lang" === "es", 25L).otherwise(10L))
      .filter(pmod($"doc_id", lit(100L)) < $"rate")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == expected)
    // determinism: second run identical (no rand() anywhere)
    val again = Curation.queries("q55_stratified_sample")(spark, dir)
      .select("lang", "kept").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("q56: exactly the top-3 deciles per source survive") {
    val out = Curation.queries("q56_quality_percentile")(spark, dir)
    val docs = Tables.load(spark, dir, "documents")
    val perSource = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.collect().foreach { r =>
      val (src, kept) = (r.getString(0), r.getLong(1))
      val n = perSource(src)
      // ntile: first (n mod 10) tiles get ceil(n/10), rest floor(n/10)
      val base = n / 10; val extra = math.min(3, n % 10)
      assert(kept == base * 3 + extra, s"source $src")
    }
  }

  test("q57: packing conserves docs/tokens; bins respect the greedy budget bound") {
    import spark.implicits._
    val out = Curation.queries("q57_sequence_pack")(spark, dir).collect()
    val docs = Tables.load(spark, dir, "documents")
      .select(size(graft.operators.TextAnalysis.wsTokens($"text")).cast("long").as("n"))
    val (totDocs, totToks) = (docs.count(), docs.agg(sum($"n")).head().getLong(0))
    assert(out.map(_.getLong(2)).sum == totDocs) // every doc packed once
    assert(out.map(_.getLong(3)).sum == totToks) // every token packed once
    val maxDoc = docs.agg(max($"n")).head().getLong(0)
    // greedy bound: a bin never exceeds budget + one overflowing doc
    out.foreach(r => assert(r.getLong(3) <= Curation.PackBudget + maxDoc))
  }
}
