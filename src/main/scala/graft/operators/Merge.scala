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

  /** N-way upsert in ONE shuffle: semantically identical to
    * `deltas.foldLeft(snapshot)(upsert(_, _, key, now))` but executed as
    * union-all + a single per-key aggregation instead of N chained
    * full-outer joins.
    *
    * Why: a full-outer join's output key is `coalesce(left, right)`, which
    * invalidates the join's partitioning — so the fold re-shuffles the
    * (growing) intermediate before EVERY join: N sources cost ~2N
    * exchanges of snapshot-sized data. Here each source is tagged with its
    * arrival index, conformed to the union schema, unioned (no shuffle),
    * and collapsed with one hash aggregation on the key: per column the
    * latest-arriving non-null value wins — exactly the fold's "delta
    * wins" coalesce — via a coalesce over `first(value where idx = j,
    * ignoreNulls)` for the frames owning the column, in reverse arrival
    * order. `first` here is deterministic, not order-dependent: (key,
    * idx) is unique since each source carries one row per key, so each
    * branch has at most one candidate; and unlike max(struct(idx, value))
    * it needs no orderability, so map-bearing struct columns work.
    * Bookkeeping follows upsert:
    * created_at survives from the snapshot (else now), updated_at is now
    * iff any delta touched the key. Shuffle volume: one exchange of the
    * union, partial-aggregated map-side.
    */
  def upsertMany(snapshot: DataFrame, deltas: Seq[DataFrame],
                 key: String = "id", now: Column = current_timestamp()): DataFrame = {
    require(snapshot.columns.contains(CreatedAt) && snapshot.columns.contains(UpdatedAt),
      s"snapshot must be Merge.init'ed (missing $CreatedAt/$UpdatedAt)")
    deltas.foreach(d => require(
      !d.columns.contains(CreatedAt) && !d.columns.contains(UpdatedAt),
      "delta must not carry bookkeeping columns"))
    val frames = snapshot +: deltas
    // Union schema: every non-key data column, typed from the first frame
    // that carries it (fold-upsert likewise assumes shared names share
    // types — it coalesces them into one column), plus which frames own it.
    val dataCols: Seq[(String, org.apache.spark.sql.types.DataType, Seq[Int])] = {
      val seen = scala.collection.mutable.LinkedHashMap
        .empty[String, (org.apache.spark.sql.types.DataType, List[Int])]
      frames.zipWithIndex.foreach { case (df, idx) =>
        df.schema.fields.foreach { f =>
          if (f.name != key && f.name != CreatedAt && f.name != UpdatedAt) {
            val (tpe, owners) = seen.getOrElse(f.name, (f.dataType, Nil))
            seen += f.name -> (tpe, owners :+ idx)
          }
        }
      }
      seen.toSeq.map { case (c, (tpe, owners)) => (c, tpe, owners) }
    }
    val tagged = frames.zipWithIndex.map { case (df, idx) =>
      val cols = col(key) +: lit(idx).as("_idx") +:
        dataCols.map { case (c, tpe, _) =>
          if (df.columns.contains(c)) col(c).as(c) else lit(null).cast(tpe).as(c)
        } :+
        (if (idx == 0) col(CreatedAt) else lit(null).cast("timestamp")).as(CreatedAt) :+
        (if (idx == 0) col(UpdatedAt) else lit(null).cast("timestamp")).as(UpdatedAt)
      df.select(cols: _*)
    }
    val unioned = tagged.reduce(_.unionByName(_))
    val aggs =
      dataCols.map { case (c, _, owners) =>
        coalesce(owners.sorted.reverse.map(j =>
          first(when(col("_idx") === j, col(c)), ignoreNulls = true)): _*).as(c)
      } :+
      coalesce(first(when(col("_idx") === 0, col(CreatedAt)), ignoreNulls = true), now)
        .as(CreatedAt) :+
      when(max(col("_idx")) > 0, now)
        .otherwise(first(when(col("_idx") === 0, col(UpdatedAt)), ignoreNulls = true))
        .as(UpdatedAt)
    unioned.groupBy(col(key))
      .agg(aggs.head, aggs.tail: _*)
      // fold-upsert column order: key, sorted data cols, stamps
      .select(col(key) +: dataCols.map(_._1).sorted.map(col) :+
              col(CreatedAt) :+ col(UpdatedAt): _*)
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

  /** Snapshot diff (CDC between two corpus versions): keyed full-outer
    * compare of content digests -> one row per key that changed, labeled
    * added / removed / changed - the "what moved between yesterday's and
    * today's curated set" report a dataset-versioning pipeline publishes
    * with each release. The digest is md5 over an INJECTIVE canonical
    * encoding: each field length-prefixed ("v<len>:<chars>", null = "n")
    * and concatenated - a prefix code, so no field content (separators,
    * markers, anything) can make two different row values collide - and
    * never engine-native struct/JSON rendering, which formats doubles
    * and nulls differently across engines. One shuffle per side on the
    * key; unchanged rows (the overwhelming majority at 100 TB) are
    * filtered before the result materializes. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    def enc(c: String): Column = {
      val v = col(c).cast("string")
      when(v.isNull, lit("n"))
        .otherwise(concat(lit("v"), length(v).cast("string"), lit(":"), v))
    }
    def digest(df: DataFrame) = df.select(
      col(keyCol), md5(concat(compareCols.map(enc): _*)).as("digest"))
    digest(prev).as("p")
      .join(digest(cur).as("c"), Seq(keyCol), "full_outer")
      .withColumn("change",
        when(col("p.digest").isNull, lit("added"))
          .when(col("c.digest").isNull, lit("removed"))
          .when(col("p.digest") =!= col("c.digest"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col(keyCol), col("change"))
  }
}
