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

  test("q65: chunk layout — full windows then one short tail per doc") {
    val out = Curation.queries("q65_chunk_docs")(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(graft.operators.TextAnalysis.wsTokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, n) =>
      val chunks = out(id)
      val m = chunks.length.toLong
      val expectM =
        if (n <= Curation.ChunkTokens) 1L
        else (n - Curation.ChunkTokens + Curation.ChunkStride - 1) / Curation.ChunkStride + 1
      assert(m == expectM, s"doc $id: $m chunks, expected $expectM")
      chunks.init.foreach(c => assert(c.getLong(2) == Curation.ChunkTokens))
      assert(chunks.last.getLong(2) == n - (m - 1) * Curation.ChunkStride)
    }
  }

  test("q66: scoring join preserves the token stream; ratios in range") {
    import spark.implicits._
    val out = Curation.queries("q66_unigram_quality")(spark, dir)
    val total = Tables.load(spark, dir, "documents")
      .select(size(graft.operators.TextAnalysis.wordTokens($"text")).cast("long").as("n"))
      .agg(sum($"n")).head().getLong(0)
    assert(out.agg(sum($"n_toks")).head().getLong(0) == total)
    assert(out.filter($"mean_cnt" < 1.0 || $"rare_ratio" < 0.0 || $"rare_ratio" > 1.0)
      .isEmpty)
  }

  test("q72: bigram scores in (0,1]; bigram totals conserved") {
    import spark.implicits._
    val out = Curation.queries("q72_bigram_quality")(spark, dir)
    assert(out.filter($"mean_p" <= 0.0 || $"mean_p" > 1.0).isEmpty)
    val total = Tables.load(spark, dir, "documents")
      .select(greatest(size(graft.operators.TextAnalysis.wordTokens($"text")) - 1,
                       lit(0)).cast("long").as("n"))
      .agg(sum($"n")).head().getLong(0)
    assert(out.agg(sum($"n_bigrams")).head().getLong(0) == total)
  }

  test("pii scrub: masks emails, urls, phones; leaves clean text alone") {
    import spark.implicits._
    val TA = graft.operators.TextAnalysis
    val out = Seq(
      "mail a.b+c@ex-site.org now",
      "see https://ex.org/p/1_2%3 and http://plain.io/x",
      "call +1 555-0123 or 44 555 9999",
      "nothing to hide here")
      .toDF("text").select(TA.scrubPii($"text").as("m")).as[String].collect()
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "see <URL> and <URL>")
    assert(out(2) == "call <PHONE> or <PHONE>")
    assert(out(3) == "nothing to hide here")
  }

  test("q90: approximate quantiles land within the sketch's rank-error bound") {
    import org.apache.spark.sql.functions._
    // uniform 0..99999: true pth percentile ≈ p * 100000; accuracy 10000
    // bounds rank error at n/10000 = 10 ranks → value error ≈ 10
    val df = spark.range(0, 100000).select(col("id").cast("double").as("v"))
    val qs = df.agg(percentile_approx(col("v"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("qs"))
      .head().getSeq[Double](0)
    Seq(0.25, 0.5, 0.75).zip(qs).foreach { case (p, est) =>
      assert(math.abs(est - p * 100000) <= 100.0,
        s"p$p: $est vs ${p * 100000}")
    }
  }
}
