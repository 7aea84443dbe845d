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
    val edges = (1L to 50L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    // threshold smaller than the edge count → distributed; results equal
    val fast = labelsOf(Dedup.clusters(edges))
    val forced = labelsOf(Dedup.clusters(edges, driverEdgeThreshold = 10))
    assert(fast == forced)
    assert(forced.values.toSet == Set(1L)) // one 51-node chain component
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
