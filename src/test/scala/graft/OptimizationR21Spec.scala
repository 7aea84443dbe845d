package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, Spread}

/** Pins for the round-21 optimization internals: each changed operator
  * shape must be VALUE-equal to the reference form it replaced. */
class OptimizationR21Spec extends SparkSpec {

  test("pqEncode aggregation form == window row_number reference, ties included") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val units = Similarity.unitVectors(e, Seq("vec_id" -> "id"))
    val books = Similarity.pqTrain(units, m = 4, subLen = 16, k = 16, iters = 1)
      .localCheckpoint()
    // the window form pqEncode used before r21 — the literal reference
    val w = Window.partitionBy(col("id"), col("sub"))
      .orderBy(col("s").desc, col("code").asc)
    val subs = units.select(col("id"), explode(array((0 until 4).map(s =>
        struct(lit(s).as("sub"),
               slice(col("unit"), s * 16 + 1, 16).as("sv"))): _*)).as("x"))
      .select(col("id"), col("x.sub").as("sub"), col("x.sv").as("sv"))
    val windowForm = subs.join(broadcast(books), "sub")
      .select(col("id"), col("sub"), col("code"),
              Similarity.dot(col("sv"), col("code_vec")).as("s"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("sub"), col("code"))
    val aggForm = Similarity.pqEncode(units, books, 4, 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    val (aRows, wRows) = (rows(aggForm), rows(windowForm))
    assert(aRows == wRows && aRows.nonEmpty)
    // and the plan genuinely lost the sort: no Window node in the agg form
    assert(!aggForm.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("Spread.ensureParallel: floors low-partition scans, identity otherwise, values unchanged") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val want = spark.sparkContext.defaultParallelism
    assume(want > 1)
    val spreadable = Spread.ensureParallel(docs)
    assert(spreadable.rdd.getNumPartitions >= math.min(want, docs.count().toInt max 1))
    // identity on an already-parallel relation (object-equal: no new node)
    val wide = docs.repartition(want + 3)
    assert(Spread.ensureParallel(wide) eq wide)
    // values bit-identical through the floor (order-normalized compare)
    assert(spreadable.orderBy("doc_id").collect().toSeq ==
           docs.orderBy("doc_id").collect().toSeq)
  }

  test("shingle pipeline answers survive the parallelism floor (minhash pairs unchanged)") {
    // the floor repartitions BEFORE the tokenizer; every consumer is an
    // order-independent aggregate, so the verified pair set is identical
    // to a single-partition run (coalesce(1) forces the unfloored shape
    // through the same code — ensureParallel of a 1-partition frame
    // repartitions, so compare against a narrow fixed-partition run via
    // the raw pair functions on a pre-exploded relation)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val viaFloor = Dedup.minhashDupPairs(docs, 0.8)
      .orderBy("a_id", "b_id").collect().toSeq
    val sh1 = Dedup.explodedShingles(
      Dedup.shingleSets(docs).coalesce(1)).localCheckpoint()
    val narrow = Dedup.minhashPairsFrom(sh1, 0.8)
      .orderBy("a_id", "b_id").collect().toSeq
    assert(viaFloor == narrow && viaFloor.nonEmpty)
  }
}
