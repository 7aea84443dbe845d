package graft

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
}
