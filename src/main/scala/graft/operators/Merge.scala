package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** THE core operator (SURVEY.md K1/J1): the reference's per-record
  * `UpdateOne({id}, {$set: rec, $setOnInsert: created_at}, upsert=True)`
  * re-expressed as a set operation: one full-outer join on the key +
  * per-column "delta wins" coalesce, then a snapshot rewrite.
  *
  * Scale shape: the join shuffles both sides on `id` (or broadcasts the
  * delta when small — KEV is ~1k rows; AQE decides). The snapshot rewrite
  * is what an ACID table format would do behind MERGE INTO; without one
  * offline we rewrite the parquet snapshot, which at 100 TB you'd bound by
  * partitioning the snapshot on a stable key range and rewriting only
  * partitions containing delta keys — implemented as
  * [[PartitionedSnapshot.mergeDelta]].
  *
  * Semantics (fidelity to handlers/mongodb_handler.py:141-191):
  *  - column present in delta row → overwrites snapshot value ($set);
  *  - column absent/null in delta row → snapshot value survives;
  *  - unmatched delta key → new row (upsert=True), created_at = now;
  *  - matched row → created_at preserved ($setOnInsert), updated_at = now;
  *  - untouched row → both stamps preserved.
  */
object Merge {
  val CreatedAt = "created_at"
  val UpdatedAt = "updated_at"

  /** Stamp a fresh snapshot with bookkeeping columns (K2 insert path,
    * handlers/mongodb_handler.py:181-188). */
  def init(df: DataFrame, now: Column = current_timestamp()): DataFrame =
    df.withColumn(CreatedAt, now).withColumn(UpdatedAt, now)

  /** Full-outer upsert of `delta` into `snapshot` on `key`.
    * `snapshot` must carry created_at/updated_at (see [[init]]);
    * `delta` must not. */
  def upsert(snapshot: DataFrame, delta: DataFrame, key: String = "id",
             now: Column = current_timestamp()): DataFrame = {
    require(snapshot.columns.contains(CreatedAt) && snapshot.columns.contains(UpdatedAt),
      s"snapshot must be Merge.init'ed (missing $CreatedAt/$UpdatedAt)")
    require(!delta.columns.contains(CreatedAt) && !delta.columns.contains(UpdatedAt),
      "delta must not carry bookkeeping columns")
    val snapCols = snapshot.columns.toSet -- Set(key, CreatedAt, UpdatedAt)
    val deltaCols = delta.columns.toSet - key
    val s = snapshot.as("s")
    // Non-null marker survives the outer join to flag "delta side present".
    val d = delta.withColumn("_delta", lit(true)).as("d")
    val joined = s.join(d, col(s"s.$key") === col(s"d.$key"), "full_outer")
    val outCols =
      coalesce(col(s"s.$key"), col(s"d.$key")).as(key) +:
      (snapCols ++ deltaCols).toSeq.sorted.map { c =>
        if (snapCols(c) && deltaCols(c)) coalesce(col(s"d.$c"), col(s"s.$c")).as(c)
        else if (deltaCols(c)) col(s"d.$c").as(c)
        else col(s"s.$c").as(c)
      } :+
      coalesce(col(s"s.$CreatedAt"), now).as(CreatedAt) :+
      when(col("d._delta"), now).otherwise(col(s"s.$UpdatedAt")).as(UpdatedAt)
    joined.select(outCols: _*)
  }

  /** J2 fidelity mode: the reference's ordered bulk_write makes the LAST
    * record with a given key win. Deterministic tie-break on `ord` desc. */
  def lastWriterWins(delta: DataFrame, key: String, ord: Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(ord.desc)
    delta.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** J2 lossless mode: collapse multi-row sources to one array column per
    * key (sorted for determinism) — no data loss, single shuffle.
    * collect_list order is shuffle-dependent, so we impose a total order;
    * structs containing maps aren't natively orderable, hence a JSON sort
    * key — computed ONCE per element before collection, not inside the
    * comparator (which runs O(n log n) times per group). */
  def lossless(delta: DataFrame, key: String, valueCol: String): DataFrame = {
    val keyed = delta.select(col(key),
      struct(to_json(struct(col(valueCol))).as("k"), col(valueCol).as("v")).as("_kv"))
    val cmp = (l: Column, r: Column) =>
      when(l("k") < r("k"), lit(-1)).when(l("k") > r("k"), lit(1)).otherwise(lit(0))
    keyed.groupBy(col(key))
      .agg(transform(array_sort(collect_list(col("_kv")), cmp),
        e => e("v")).as(valueCol))
  }
}
