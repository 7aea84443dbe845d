package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for scale pathologies AQE alone doesn't cover.
  */
object Joins {

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * deterministic salt in [0, factor); the small side is exploded
    * `factor`× so every (key, salt) bucket finds its match. One hot key
    * then spreads over `factor` reducers instead of one.
    *
    * Use when a key's row count ≫ everything else and AQE's skew-join
    * splitting can't help (e.g. the skew is in a shuffle-hash build side
    * or an aggregation input). Deterministic: salt is a hash of stable
    * columns, not rand(), so retries and re-runs produce identical
    * partitioning.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 factor: Int, saltCols: Seq[String]): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val saltSrc = if (saltCols.nonEmpty) saltCols.map(col) else Seq(col(key))
    val l = large.withColumn("_salt", pmod(xxhash64(saltSrc: _*), lit(factor.toLong)))
    val s = small.withColumn("_salt", explode(sequence(lit(0L), lit(factor - 1L))))
    l.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
