package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** PQ-ADC sanity beyond the q61 oracle (which pins the exact construction):
  * the approximation must actually approximate — recall against the exact
  * brute-force top-k. */
class PqSpec extends SparkSpec {

  test("PQ recall on clustered corpus: planted near-neighbors are found") {
    // 40 seeded base directions, 4 noisy copies each (the structure real
    // embedding corpora have; on pure-noise data NO 8×-compressing
    // quantizer can rank near-ties — recall there is meaningless).
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val rows = (0 until 40).flatMap { b =>
      val base = vec()
      (0 until 5).map { c =>
        val v = if (c == 0) base
                else base.zip(vec()).map { case (x, n) => x + 0.15f * n }
        (b * 10L + c, b, v)
      }
    }
    val corpus = rows.toDF("vec_id", "label", "embedding")
    val queries = corpus.filter($"vec_id" % 10 === 0) // the 40 bases
    val exact = Similarity.bruteForceTopK(corpus, queries, 4)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(corpus, queries, 4)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(s"PQ recall@4 (clustered) = $recall")
    assert(recall >= 0.85, s"recall $recall")
  }

  test("persisted artifacts: a fresh probe from disk equals the in-session build") {
    import graft.operators.AnnIndex
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") % 50 === 0)
    val work = java.nio.file.Files.createTempDirectory("graft_annidx_spec_")
    val pqPath = work.resolve("pq").toString
    val ivfPath = work.resolve("ivf").toString
    val v1 = AnnIndex.buildPq(e, pqPath)
    AnnIndex.buildIvf(e, ivfPath)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // probe purely from disk — nothing of the build's lineage survives
    val fromDisk = AnnIndex.pqTopK(spark, pqPath, q, k = 5)
    val inSession = Similarity.pqTopK(e, q, k = 5)
    assert(rows(fromDisk) == rows(inSession) && fromDisk.count() > 0)
    val assignDisk = AnnIndex.ivfAssign(spark, ivfPath, e)
    val units = Similarity.unitVectors(e, Seq("vec_id" -> "id", "label" -> "cell"))
    val assignMem = Similarity.assignCells(units,
      Similarity.kmeansRefineExact(units, Similarity.exactCentroids(units), 1))
    assert(rows(assignDisk) == rows(assignMem))
    // params travel with the artifact
    assert(AnnIndex.pqParams(spark, pqPath) == AnnIndex.PqParams(4, 16, 16))
    // republish: readers pin the NEW version, old one pruned to one
    val v2 = AnnIndex.buildPq(e, pqPath)
    assert(v2 == v1 + 1)
    assert(rows(AnnIndex.pqTopK(spark, pqPath, q, k = 5)) == rows(inSession))
    // a PQ probe against an IVF artifact fails loudly, not garbage
    val err = intercept[IllegalArgumentException] {
      AnnIndex.pqParams(spark, ivfPath)
    }
    assert(err.getMessage.contains("not a PQ index"))
  }

  test("PQ codes are drawn from the codebook and cover every (vector, subspace)") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cu = Similarity.unitVectors(e, Seq("vec_id" -> "id"))
    val books = Similarity.pqTrain(cu, m = 4, subLen = 16, k = 16)
    assert(books.count() == 4 * 16) // full codebook per subspace
    val codes = Similarity.pqEncode(cu, books, m = 4, subLen = 16)
    val n = e.count()
    assert(codes.count() == n * 4) // one code per (vector, subspace)
    val used = codes.select("code").distinct().collect().map(_.getInt(0)).toSet
    assert(used.subsetOf((0 until 16).toSet))
  }
}
