package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Scale-rehearsal data generator: replicates a driver-provided sf
  * directory K× with referential integrity preserved, so the bench can
  * run above the largest driver-generated scale factor (VERDICT r5 #4 —
  * turn "the plan is O(groups)" from argument into measurement).
  *
  * NOT a benchmark trick: each replica is key-shifted so joins keep their
  * exact per-key fanout, and the similarity corpora are perturbed so
  * CROSS-replica rows are never near-duplicates — otherwise 10× data
  * would mean 100× duplicate pairs and the "scaling ratio" would measure
  * a workload no real corpus has. Concretely:
  *
  *  - fact/dim keys get per-replica offsets of (max key + 1): orders'
  *    and lineitem's shared orderkey space shifts together, ditto
  *    part/supp/cust — join cardinality scales exactly linearly;
  *  - region/nation are fixed dimensions (TPC-H semantics) — copied once;
  *  - events shift event_id/user_id AND the time axis by one full span
  *    per replica: 10× data = 10× windows/sessions of the same density,
  *    which is how an event stream actually grows;
  *  - documents suffix every 3rd token with a replica tag: every word
  *    3-shingle contains a tagged token, so cross-replica Jaccard is 0
  *    while within-replica token counts, length distributions and
  *    EXACT-dup structure are preserved (ScaleDataSpec). Known
  *    conservative bias: positional tagging shifts across a token
  *    insertion/deletion, so a near-dup pair differing by an insertion
  *    loses some shingle overlap in replicas 1..K-1 — replica corpora
  *    slightly UNDER-load the near-dup verify stages relative to
  *    replica 0 (never over-load, which is the direction that would
  *    flatter the ratios);
  *  - embeddings cyclic-rotate the vector by a replica-dependent offset:
  *    the corpus is centered (verified mean ≈ 0), so a rotated copy is
  *    as orthogonal as a random pair (sampled max cosine 0.36, far
  *    below the dup threshold), while norms, within-replica geometry
  *    and the label→cell structure are untouched.
  *
  * Usage: runMain graft.tools.ScaleData <inDir> <outDir> <K>
  */
object ScaleData {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleData <inDir> <outDir> <K>")
    val Array(inDir, outDir, kStr) = args
    val k = kStr.toInt
    require(k >= 1, s"K must be >= 1, got $k")
    val spark = GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    scaleAll(spark, inDir, outDir, k)
    spark.stop()
  }

  /** Raw read — events.ts stays a nano long (nanosAsLong), written back
    * as a long column; Tables.load normalizes either form on read. */
  private def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def maxOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c).cast("long"))).head().getLong(0)

  /** K key-shifted replicas unioned; replica 0 is the verbatim input. */
  private def replicas(df: DataFrame, k: Int)(f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until k).map(i => f(df, i)).reduce(_.unionByName(_))

  def scaleAll(spark: SparkSession, inDir: String, outDir: String, k: Int): Unit = {
    val customer = raw(spark, inDir, "customer")
    val supplier = raw(spark, inDir, "supplier")
    val part = raw(spark, inDir, "part")
    val orders = raw(spark, inDir, "orders")
    val lineitem = raw(spark, inDir, "lineitem")
    val events = raw(spark, inDir, "events")
    val documents = raw(spark, inDir, "documents")
    val embeddings = raw(spark, inDir, "embeddings")

    // strides: one past the key space's max, shared by every FK user
    val custS = maxOf(customer, "c_custkey") + 1
    val suppS = maxOf(supplier, "s_suppkey") + 1
    val partS = maxOf(part, "p_partkey") + 1
    val ordS = maxOf(orders, "o_orderkey") + 1
    val docS = maxOf(documents, "doc_id") + 1
    val vecS = maxOf(embeddings, "vec_id") + 1
    val evtS = maxOf(events, "event_id") + 1
    val userS = maxOf(events, "user_id") + 1
    // one full time span (+1h guard) per replica, in the ts column's own
    // unit (nano long or timestamp)
    val (tsMin, tsMax) = {
      val r = events.agg(min(col("ts").cast("long")), max(col("ts").cast("long"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val tsIsLong = events.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    val spanUnits = (tsMax - tsMin) + (if (tsIsLong) 3600L * 1000 * 1000 * 1000 else 3600L)

    def shift(c: String, stride: Long, i: Int): Column =
      col(c) + lit(stride * i)

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    // fixed dims: exactly once
    write(raw(spark, inDir, "region"), "region")
    write(raw(spark, inDir, "nation"), "nation")

    write(replicas(customer, k)((d, i) =>
      d.withColumn("c_custkey", shift("c_custkey", custS, i))), "customer")
    write(replicas(supplier, k)((d, i) =>
      d.withColumn("s_suppkey", shift("s_suppkey", suppS, i))), "supplier")
    write(replicas(part, k)((d, i) =>
      d.withColumn("p_partkey", shift("p_partkey", partS, i))), "part")
    write(replicas(orders, k)((d, i) =>
      d.withColumn("o_orderkey", shift("o_orderkey", ordS, i))
        .withColumn("o_custkey", shift("o_custkey", custS, i))), "orders")
    write(replicas(lineitem, k)((d, i) =>
      d.withColumn("l_orderkey", shift("l_orderkey", ordS, i))
        .withColumn("l_partkey", shift("l_partkey", partS, i))
        .withColumn("l_suppkey", shift("l_suppkey", suppS, i))), "lineitem")

    write(replicas(events, k) { (d, i) =>
      val shifted =
        if (tsIsLong) col("ts") + lit(spanUnits * i)
        else col("ts") + expr(s"INTERVAL ${spanUnits * i} SECOND")
      d.withColumn("event_id", shift("event_id", evtS, i))
        .withColumn("user_id", shift("user_id", userS, i))
        .withColumn("ts", shifted)
    }, "events")

    write(replicas(documents, k) { (d, i) =>
      if (i == 0) d
      else {
        // tag token positions 0,3,6,… — every 3-shingle holds one tag
        val tagged = array_join(
          zip_with(
            split(col("text"), " "),
            sequence(lit(0), size(split(col("text"), " ")) - 1),
            (w, p) => when(p % 3 === 0, concat(w, lit(s"_r$i"))).otherwise(w)),
          " ")
        d.withColumn("doc_id", shift("doc_id", docS, i))
          .withColumn("text", tagged)
          .withColumn("n_chars", length(col("text")))
      }
    }, "documents")

    write(replicas(embeddings, k) { (d, i) =>
      val dim = size(col("embedding"))
      if (i == 0) d
      else {
        // rotation offset never 0 mod dim for i > 0 (dim ≥ 2)
        val r = lit(1 + (i * 5)) % (dim - 1) + 1
        d.withColumn("vec_id", shift("vec_id", vecS, i))
          .withColumn("embedding",
            concat(slice(col("embedding"), r + 1, dim - r),
                   slice(col("embedding"), lit(1), r)))
      }
    }, "embeddings")
  }
}
