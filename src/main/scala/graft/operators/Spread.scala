package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for compute-heavy per-row pipelines
  * (guide §2: derive partitioning from the input, never a constant tuned
  * for local mode or the cluster).
  *
  * Why it exists: Spark fuses the map work that FOLLOWS a scan (tokenize
  * → shingle → 64 minhash updates; normalize → m×k dot products) into
  * the scan stage, and a parquet table with few row groups scans as that
  * few tasks — the sf0.1 fixtures are ONE row group each, so the most
  * expensive per-row stages in the engine were measured running on one
  * core of 32 (Profile --jobs: wall ≈ taskTime on the shingle stage).
  * The same shape hits any production table whose row-group count is
  * below the cluster's cores (a freshly compacted small dimension, a
  * single-file delta drop).
  *
  * The floor is the INPUT-DERIVED fix: repartition to
  * `defaultParallelism` only when the relation's planned partition count
  * is below it — at real scale inputs carry ≥ cores splits and this is
  * the identity, so nothing is tuned to local[32]. Round-robin
  * repartition keeps retries deterministic (sortBeforeRepartition is on
  * by default, SPARK-23207), and every consumer behind these entry
  * points is an order-independent aggregate/join, so answers are
  * bit-identical — the shuffle moves the raw rows once, before the
  * expensive map stage instead of after it.
  */
object Spread {
  def ensureParallel(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (want > 1 && df.rdd.getNumPartitions < want) df.repartition(want)
    else df
  }
}
