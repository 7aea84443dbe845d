package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f, 0.0f), 0),
    (3L, Array(0.0f, 1.0f, 0.0f), 1),
    (4L, Array(0.0f, 0.95f, 0.05f), 1),
    (5L, Array(-1.0f, 0.0f, 0.0f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("brute-force top-k ranks by cosine with id tie-break") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1L), k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("cand_id")).toSeq == Seq(2L, 3L))
    val top = out.head.getAs[Double]("sim")
    assert(math.abs(top - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-6) // float32 inputs
  }

  test("cell top-k only searches the query's cell") {
    val out = Similarity.cellTopK(vecs, vecs.filter($"vec_id" === 1L), k = 3)
      .collect()
    val cands = out.map(_.getAs[Long]("cand_id")).toSet
    assert(cands == Set(2L, 5L)) // label-0 cell only, self excluded
  }

  test("cell dup pairs finds within-cell near-dups above threshold") {
    val pairs = Similarity.cellDupPairs(vecs, 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("native graft_dot is bit-identical to the ordered HOF fold") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(2000)
      .select(Similarity.dot(col("a.v"), col("b.v")).as("native"),
              Similarity.foldDot(col("a.v"), col("b.v")).as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() == 0)
  }

  test("unit vectors have norm 1 (fold math sanity)") {
    val u = Similarity.unitVectors(vecs, Seq("vec_id" -> "id"))
    val norms = u.select(Similarity.norm(col("unit")).as("n")).collect().map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-12))
  }
}
