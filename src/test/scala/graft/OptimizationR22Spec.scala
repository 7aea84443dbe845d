package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Spread}

/** Pins for the round-22 optimization internals: each changed operator
  * shape must keep the behavior of the form it replaced. */
class OptimizationR22Spec extends SparkSpec {

  test("parseMaxControlRows: valid override, malformed fallback, absent default") {
    val dflt = 4L * 1000 * 1000
    assert(Similarity.parseMaxControlRows(None) == dflt)
    assert(Similarity.parseMaxControlRows(Some("123")) == 123L)
    assert(Similarity.parseMaxControlRows(Some(" 42 ")) == 42L)
    // malformed values fall back LOUDLY to the default instead of
    // surfacing as an ExceptionInInitializerError for the whole object
    assert(Similarity.parseMaxControlRows(Some("not-a-long")) == dflt)
    assert(Similarity.parseMaxControlRows(Some("")) == dflt)
    assert(Similarity.parseMaxControlRows(Some("1e6")) == dflt)
  }

  test("Spread.ensureParallel: streaming frames pass through unchanged") {
    // ADVICE r21: the r21 form called df.rdd, which THROWS on a streaming
    // DataFrame — the module contract says the entry points run in batch
    // and streaming alike
    val stream = spark.readStream.format("rate").load()
    assert(stream.isStreaming)
    assert(Spread.ensureParallel(stream) eq stream)
  }

  test("Spread.ensureParallel: floors a broadcast-anti-join delta, values unchanged") {
    // the tick shape `delta ANTI JOIN removals`: the join output keeps
    // the scan's (single) split under a broadcast build, so the floor
    // must see through the join to the left scan
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val rem = spark.range(3).select(col("id").as("doc_id"))
    val live = docs.join(rem, Seq("doc_id"), "left_anti")
    val floored = Spread.ensureParallel(live)
    val want = spark.sparkContext.defaultParallelism
    assume(want > 1)
    assert(floored.rdd.getNumPartitions >= math.min(want.toLong, live.count()).toInt)
    assert(floored.orderBy("doc_id").collect().toSeq ==
           live.orderBy("doc_id").collect().toSeq)
  }

  test("Spread.ensureParallel: identity on exchange-producing plans") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // aggregate / window / repartition plans carry shuffle partitioning
    // already — the floor must not stack another exchange on top
    val agg = docs.groupBy("lang").count()
    assert(Spread.ensureParallel(agg) eq agg)
    val rep = docs.repartition(spark.sparkContext.defaultParallelism + 3)
    assert(Spread.ensureParallel(rep) eq rep)
  }

  test("Bloom.mightContainOffPlan == literal mightContain, no false negatives") {
    import graft.operators.Bloom
    val keys = spark.range(0, 3000).select((col("id") * 37 + 11).as("k"))
    val bits = Bloom.build(keys, "k")
    // truth-table equality on a superset (members + non-members)
    val probe = spark.range(0, 120000).select(col("id").as("k"))
    val viaLit = probe.filter(Bloom.mightContain(bits, col("k")))
      .collect().map(_.getLong(0)).toSet
    val viaOff = probe.filter(Bloom.mightContainOffPlan(bits, col("k")))
      .collect().map(_.getLong(0)).toSet
    assert(viaLit == viaOff)
    // the load-bearing contract: every inserted key tests positive
    val members = keys.collect().map(_.getLong(0)).toSet
    assert(members.subsetOf(viaOff))
  }

  test("Par: all failures preserved — first thrown, rest suppressed") {
    val e = intercept[RuntimeException] {
      Par(
        () => throw new RuntimeException("side A"),
        () => { Thread.sleep(50); throw new IllegalStateException("side B") })
    }
    val all = (e.getMessage +: e.getSuppressed.toSeq.map(_.getMessage)).toSet
    assert(all == Set("side A", "side B"))
  }
}
