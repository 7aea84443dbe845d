package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, VectorAggregates}

class VectorAggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("vector_mean: element-wise mean, partition-invariant") {
    val df = Seq(
      (0, Array(1.0, 2.0, 3.0)),
      (0, Array(3.0, 2.0, 1.0)),
      (1, Array(10.0, 0.0, 0.0))
    ).toDF("cell", "v")
    val out = df.groupBy("cell")
      .agg(VectorAggregates.vectorMean(col("v")).as("m"))
      .orderBy("cell").collect()
    assert(out(0).getSeq[Double](1) == Seq(2.0, 2.0, 2.0))
    assert(out(1).getSeq[Double](1) == Seq(10.0, 0.0, 0.0))
    // same result under different partitioning (merge path exercised)
    val out8 = df.repartition(8).groupBy("cell")
      .agg(VectorAggregates.vectorMean(col("v")).as("m"))
      .orderBy("cell").collect()
    assert(out.map(_.getSeq[Double](1)).toSeq == out8.map(_.getSeq[Double](1)).toSeq)
  }

  test("k-means refine improves (or preserves) the clustering objective") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val units = Similarity.unitVectors(e, Seq("vec_id" -> "id", "label" -> "label"))
      .persist()
    val init = VectorAggregates.centroids(units, "label", "unit")
      .withColumnRenamed("cell", "cell0").withColumnRenamed("centroid", "c0")
      .select(col("cell0").as("cell"), col("c0").as("centroid"))
    val before = Similarity.clusteringObjective(units, init)
    val refined = Similarity.kmeansRefine(units, init, iters = 2)
    val after = Similarity.clusteringObjective(units, refined)
    assert(refined.count() <= 10 && refined.count() > 0)
    assert(after >= before - 1e-9, s"objective degraded: $before -> $after")
  }

  test("IVF build: per-cell centroids over real embeddings") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val units = Similarity.unitVectors(e, Seq("vec_id" -> "id", "label" -> "label"))
    val cents = VectorAggregates.centroids(units, "label", "unit")
    assert(cents.count() == e.select("label").distinct().count())
    val dims = cents.select(size(col("centroid"))).distinct().collect()
    assert(dims.map(_.getInt(0)).toSeq == Seq(64))
    // centroid of unit vectors has norm <= 1 (strictly < 1 unless collinear)
    val norms = cents.select(Similarity.norm(col("centroid")).as("n"))
      .collect().map(_.getDouble(0))
    norms.foreach(n => assert(n > 0.0 && n <= 1.0 + 1e-12))
  }
}
