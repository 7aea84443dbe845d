package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed custom aggregate (SURVEY §2.10 EXT): element-wise vector mean —
  * the centroid computation an IVF index build needs. Implemented as an
  * `Aggregator[IN, BUF, OUT]` exposed through `udaf(...)`: partial
  * aggregation (reduce) runs map-side, merge combines partition buffers —
  * the same two-phase shape Catalyst gives built-in aggregates, so at
  * 100 TB the shuffle carries one (sum, count) buffer per group, never
  * the vectors.
  */
object VectorAggregates {

  case class VecBuffer(sums: Array[Double], count: Long)

  /** Element-wise mean of ARRAY<DOUBLE> vectors (null-safe, empty → null). */
  object VectorMean extends Aggregator[Array[Double], VecBuffer, Array[Double]] {
    override def zero: VecBuffer = VecBuffer(Array.empty, 0L)

    override def reduce(b: VecBuffer, v: Array[Double]): VecBuffer = {
      if (v == null) b
      else if (b.count == 0L) VecBuffer(v.clone(), 1L)
      else {
        var i = 0
        val n = math.min(b.sums.length, v.length)
        while (i < n) { b.sums(i) += v(i); i += 1 }
        VecBuffer(b.sums, b.count + 1)
      }
    }

    override def merge(a: VecBuffer, b: VecBuffer): VecBuffer = {
      if (a.count == 0L) b
      else if (b.count == 0L) a
      else {
        var i = 0
        val n = math.min(a.sums.length, b.sums.length)
        while (i < n) { a.sums(i) += b.sums(i); i += 1 }
        VecBuffer(a.sums, a.count + b.count)
      }
    }

    override def finish(r: VecBuffer): Array[Double] =
      if (r.count == 0L) null else r.sums.map(_ / r.count)

    override def bufferEncoder: Encoder[VecBuffer] = Encoders.product[VecBuffer]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Column form: vector_mean(vecCol). */
  def vectorMean(vec: Column): Column = udaf(VectorMean).apply(vec)

  /** IVF cell build: per-cell centroids of (already unit-normalized)
    * vectors. */
  def centroids(vectors: DataFrame, cellCol: String = "label",
                vecCol: String = "unit"): DataFrame =
    vectors.groupBy(col(cellCol).as("cell"))
      .agg(vectorMean(col(vecCol)).as("centroid"))
}
