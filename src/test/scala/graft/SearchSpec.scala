package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Search

class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("invertedIndex shards are bounded, contiguous, and reconstruct the full list") {
    val docs = Seq(
      (1L, "a b a c"), (2L, "a b"), (3L, "a x"), (4L, "a y"), (5L, "a")
    ).toDF("doc_id", "text")
    val idx = Search.invertedIndex(docs, maxPerShard = 2L).collect()

    // exact bound on every row
    idx.foreach { r =>
      assert(r.getAs[Long]("shard_size") <= 2L)
      assert(r.getAs[String]("postings").split(" ").length ==
             r.getAs[Long]("shard_size"))
    }

    // term 'a' spans 5 docs -> rank-contiguous shards 0,1,2 of sizes 2,2,1,
    // each row carrying the term's TOTAL doc_freq
    val a = idx.filter(_.getString(0) == "a").sortBy(_.getAs[Long]("shard"))
    assert(a.map(_.getAs[Long]("shard")).toSeq == Seq(0L, 1L, 2L))
    assert(a.map(_.getAs[Long]("shard_size")).toSeq == Seq(2L, 2L, 1L))
    assert(a.forall(_.getAs[Long]("doc_freq") == 5L))

    // scanning shards in order reconstructs the doc-id-ordered list
    assert(a.map(_.getAs[String]("postings")).mkString(" ") ==
           "1:2 2:1 3:1 4:1 5:1")
  }

  test("property: sharded index ≡ canonical posting lists for random corpora") {
    // raw ScalaCheck with fixed seeds, matching MergePropsSpec's pattern
    val word = Gen.oneOf("a", "b", "c", "dd", "eee")
    val doc = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word))
    val corpusGen: Gen[Seq[(Long, String)]] =
      Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, doc))
        .map(_.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) })
    val corpora = (1 to 6).flatMap(i =>
      corpusGen.apply(Gen.Parameters.default, Seed(7L + i)))
    corpora.foreach { rows =>
      val docs = rows.toDF("doc_id", "text")
      val maxPer = 3L
      val idx = Search.invertedIndex(docs, maxPerShard = maxPer).collect()
      // reference: canonical per-term (doc:tf ordered by doc) from termFreqs
      val canon = Search.termFreqs(docs).collect()
        .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
        .groupBy(_._1)
        .view.mapValues(_.sortBy(_._2).map(t => s"${t._2}:${t._3}").toSeq)
        .toMap
      val byTerm = idx.groupBy(_.getString(0))
      assert(byTerm.keySet == canon.keySet)
      byTerm.foreach { case (term, shardRows) =>
        val sorted = shardRows.sortBy(_.getAs[Long]("shard"))
        // contiguous shard ids, exact bound, df consistent
        assert(sorted.map(_.getAs[Long]("shard")).toSeq ==
               sorted.indices.map(_.toLong))
        assert(sorted.forall(_.getAs[Long]("shard_size") <= maxPer))
        assert(sorted.forall(_.getAs[Long]("doc_freq") == canon(term).size))
        // reconstruction equals the canonical list
        assert(sorted.flatMap(_.getAs[String]("postings").split(" ")).toSeq ==
               canon(term), s"term $term diverged for corpus $rows")
      }
    }
  }
}
