package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("driver union-find == distributed propagation on adversarial graphs") {
    // chains (diameter > 2), a ring, stars, singleton pairs, reversed ids
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),          // chain
      (10L, 11L), (11L, 12L), (12L, 10L),              // ring
      (20L, 21L), (20L, 22L), (20L, 23L),              // star
      (31L, 30L),                                      // reversed pair
      (40L, 41L)                                       // singleton pair
    ).toDF("a_id", "b_id")
    val fast = labelsOf(Dedup.clusters(edges))
    val dist = labelsOf(Dedup.clusters(edges, driverEdgeThreshold = 0))
    assert(fast == dist)
    assert(fast(5L) == 1L && fast(12L) == 10L && fast(23L) == 20L &&
           fast(30L) == 30L && fast(31L) == 30L && fast(41L) == 40L)
  }

  test("threshold boundary: over-threshold edge sets take the distributed path") {
    // short chain: exercises the fallback branch without paying ~50
    // propagation rounds of a long chain
    val edges = (1L to 12L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val fast = labelsOf(Dedup.clusters(edges))
    val forced = labelsOf(Dedup.clusters(edges, driverEdgeThreshold = 5))
    assert(fast == forced)
    assert(forced.values.toSet == Set(1L)) // one 13-node chain component
  }

  test("non-long ids keep the distributed path and its schema contract") {
    import org.apache.spark.sql.functions.col
    val edges = Seq(("d2", "d1"), ("d2", "d3")).toDF("a_id", "b_id")
    val out = Dedup.clusters(edges) // must NOT take the long fast path
    assert(out.schema("cluster_id").dataType ==
           org.apache.spark.sql.types.StringType)
    val labels = out.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels == Map("d1" -> "d1", "d2" -> "d1", "d3" -> "d1"))
  }

  test("random graphs: both paths agree") {
    val rnd = new scala.util.Random(48)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("a_id", "b_id")
    assert(labelsOf(Dedup.clusters(edges)) ==
           labelsOf(Dedup.clusters(edges, driverEdgeThreshold = 0)))
  }
}
