package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("systematic PPS: uniform weights pick every tot/k-th row") {
    val df = (1L to 10L).map(i => ("a", i, 1L)).toDF("s", "id", "w")
    val picks = Sampling.systematicPps(df, "s", "id", "w", k = 5)
      .orderBy("id").collect().map(_.getLong(1))
    // cum = id; a pick lands wherever (id*5) div 10 increments: even ids
    assert(picks.toSeq == Seq(2L, 4L, 6L, 8L, 10L))
  }

  test("systematic PPS: a heavy row absorbs multiple steps but is picked once") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 100L), ("a", 3L, 1L),
                 ("a", 4L, 1L), ("a", 5L, 1L)).toDF("s", "id", "w")
    val out = Sampling.systematicPps(df, "s", "id", "w", k = 4).collect()
    val ids = out.map(_.getLong(1)).toSet
    assert(ids.contains(2L))      // the heavy row is in every sample
    assert(out.length < 4)        // ...and absorbs steps: fewer picks than k
  }

  test("two-level prefix decomposition equals the single-window form") {
    // deterministic pseudo-random weights, 2 strata, ids sparse enough
    // that bucketSize=8 splits each stratum into many buckets
    val rows = (0L until 400L).map { i =>
      (if (i % 3 == 0) "x" else "y", i, 1L + (i * 2654435761L % 97L))
    }
    val df = rows.toDF("s", "id", "w")
    val multi = Sampling.systematicPps(df, "s", "id", "w", k = 7, bucketSize = 8L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    // bucketSize beyond the id range -> one bucket per stratum: the
    // two-level machinery degenerates to the plain prefix sum
    val single = Sampling.systematicPps(df, "s", "id", "w", k = 7, bucketSize = 1L << 40)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(multi.nonEmpty && multi == single)
    // per-stratum pick count never exceeds k
    val perStratum = multi.groupBy(_._1).view.mapValues(_.size)
    assert(perStratum.values.forall(_ <= 7))
  }

  test("global rank: distributed two-level rank equals the naive global window") {
    val df = (0L until 500L)
      .map(i => (i, (i * 7919L) % 211L))  // shuffled weights with ties
      .toDF("id", "w")
    val dist = Sampling.globalRankByWeight(df, "id", "w", partitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val naive = df.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"w".desc, $"id".asc)))
      .collect().map(r => (r.getLong(0), r.getInt(2).toLong)).toMap
    assert(dist.size == 500 && dist == naive)
    // a degenerate single partition also agrees (offset path = 0)
    val one = Sampling.globalRankByWeight(df, "id", "w", partitions = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(one == naive)
  }

  test("systematic PPS rejects non-positive k and bucketSize") {
    val df = Seq(("a", 1L, 1L)).toDF("s", "id", "w")
    intercept[IllegalArgumentException] {
      Sampling.systematicPps(df, "s", "id", "w", k = 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.systematicPps(df, "s", "id", "w", k = 1, bucketSize = 0L)
    }
  }

  test("non-integral id or weight fails loudly instead of sampling nothing") {
    // a string id would null the bucket key (silent empty join); a
    // fractional weight would truncate to 0 (silent empty sample)
    val strId = Seq(("a", "url-1", 1L)).toDF("s", "id", "w")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.systematicPps(strId, "s", "id", "w", k = 1)
    }
    assert(e1.getMessage.contains("integral"))
    val fracW = Seq(("a", 1L, 0.3)).toDF("s", "id", "w")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.systematicPps(fracW, "s", "id", "w", k = 1)
    }
    assert(e2.getMessage.contains("integral"))
    val e3 = intercept[IllegalArgumentException] {
      Sampling.globalRankByWeight(fracW, "id", "w")
    }
    assert(e3.getMessage.contains("integral"))
  }
}
