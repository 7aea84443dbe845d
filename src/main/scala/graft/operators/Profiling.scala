package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality scan a pipeline runs before
  * trusting an ingest (null rates, cardinalities, ranges). ONE pass over
  * the data computes every metric for every column (a single wide
  * aggregate), then the one-row result pivots into a (col_name, metrics)
  * row per column — the driver never touches more than `cols.size` rows.
  *
  * Scale notes: the exact distinct counts use Spark's multi-distinct
  * Expand (rows × #distinct-aggs map-side) — fine into the billions; at
  * 100 TB-with-many-columns you'd swap `countDistinct` for
  * `approx_count_distinct` (HLL, one pass, no Expand) and keep the same
  * shape. Min/max are kept in both numeric (DOUBLE) and string forms so
  * heterogeneous columns profile into one uniform schema without
  * engine-specific number formatting.
  */
object Profiling {

  /** Per-column profile: (col_name, n_rows, nonnull, nulls, n_distinct,
    * min_num, max_num, min_str, max_str). `numeric` marks columns whose
    * range should be reported numerically; others report string ranges. */
  def profile(df: DataFrame, cols: Seq[String], numeric: Set[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    def metrics(c: String): Seq[Column] = Seq(
      count(col(c)).as(s"${c}__nonnull"),
      countDistinct(col(c)).as(s"${c}__distinct"),
      (if (numeric(c)) min(col(c)).cast("double") else lit(null).cast("double"))
        .as(s"${c}__min_num"),
      (if (numeric(c)) max(col(c)).cast("double") else lit(null).cast("double"))
        .as(s"${c}__max_num"),
      (if (numeric(c)) lit(null).cast("string") else min(col(c)).cast("string"))
        .as(s"${c}__min_str"),
      (if (numeric(c)) lit(null).cast("string") else max(col(c)).cast("string"))
        .as(s"${c}__max_str"))
    val aggCols = count(lit(1)).as("__rows") +: cols.flatMap(metrics)
    val row = df.agg(aggCols.head, aggCols.tail: _*)
    // pivot the single row into one row per column
    row.select(explode(array(cols.map { c =>
        struct(
          lit(c).as("col_name"),
          col("__rows").as("n_rows"),
          col(s"${c}__nonnull").as("nonnull"),
          (col("__rows") - col(s"${c}__nonnull")).as("nulls"),
          col(s"${c}__distinct").as("n_distinct"),
          col(s"${c}__min_num").as("min_num"),
          col(s"${c}__max_num").as("max_num"),
          col(s"${c}__min_str").as("min_str"),
          col(s"${c}__max_str").as("max_str"))
      }: _*)).as("p"))
      .select("p.*")
  }
}
