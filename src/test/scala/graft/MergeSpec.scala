package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = lit("2025-01-01 00:00:00").cast("timestamp")
  private val t1 = lit("2025-02-01 00:00:00").cast("timestamp")
  private val t2 = lit("2025-03-01 00:00:00").cast("timestamp")

  private def snap0 = Merge.init(
    Seq(("CVE-1", "nvd-a"), ("CVE-2", "nvd-b")).toDF("id", "nvd"), t0)

  test("K1: new key inserted, created_at = merge time") {
    val delta = Seq(("CVE-3", 0.9)).toDF("id", "epss")
    val out = Merge.upsert(snap0, delta, "id", t1)
    assert(out.count() == 3)
    val r = out.filter($"id" === "CVE-3").select("created_at", "updated_at", "epss").head()
    assert(r.getTimestamp(0) == r.getTimestamp(1))
    assert(r.getTimestamp(0).toString.startsWith("2025-02-01"))
    assert(r.getDouble(2) == 0.9)
  }

  test("K1: matched key — delta column wins, created_at preserved, updated_at bumped") {
    val delta = Seq(("CVE-1", 0.5)).toDF("id", "epss")
    val out = Merge.upsert(snap0, delta, "id", t1)
    val hit = out.filter($"id" === "CVE-1").head()
    assert(hit.getAs[java.sql.Timestamp]("created_at").toString.startsWith("2025-01-01"))
    assert(hit.getAs[java.sql.Timestamp]("updated_at").toString.startsWith("2025-02-01"))
    assert(hit.getAs[String]("nvd") == "nvd-a") // untouched column survives
    val miss = out.filter($"id" === "CVE-2").head()
    assert(miss.getAs[java.sql.Timestamp]("updated_at").toString.startsWith("2025-01-01"))
    assert(miss.isNullAt(miss.fieldIndex("epss")))
  }

  test("K1: shared column — non-null delta overwrites, null delta preserves ($set)") {
    val delta = Seq(("CVE-1", "nvd-a2"), ("CVE-2", null.asInstanceOf[String]))
      .toDF("id", "nvd")
    val out = Merge.upsert(snap0, delta, "id", t1)
    assert(out.filter($"id" === "CVE-1").select("nvd").head().getString(0) == "nvd-a2")
    assert(out.filter($"id" === "CVE-2").select("nvd").head().getString(0) == "nvd-b")
  }

  test("T4: re-applying the same delta is idempotent up to updated_at") {
    val delta = Seq(("CVE-1", 0.5), ("CVE-9", 0.1)).toDF("id", "epss")
    val once = Merge.upsert(snap0, delta, "id", t1)
    val twice = Merge.upsert(once, delta, "id", t2)
    val a = once.drop("updated_at").orderBy("id").collect().toSeq
    val b = twice.drop("updated_at").orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("merge commutes across disjoint sources (same keys, different columns)") {
    val dEpss = Seq(("CVE-1", 0.5)).toDF("id", "epss")
    val dKev = Seq(("CVE-1", "ransomware")).toDF("id", "kev")
    val ab = Merge.upsert(Merge.upsert(snap0, dEpss, "id", t1), dKev, "id", t1)
    val ba = Merge.upsert(Merge.upsert(snap0, dKev, "id", t1), dEpss, "id", t1)
    val ca = ab.select("id", "epss", "kev", "nvd").orderBy("id").collect().toSeq
    val cb = ba.select("id", "epss", "kev", "nvd").orderBy("id").collect().toSeq
    assert(ca == cb)
  }

  test("J2 fidelity: last writer wins on intra-batch collisions") {
    val delta = Seq(("CVE-1", "first", 1L), ("CVE-1", "second", 2L), ("CVE-2", "only", 3L))
      .toDF("id", "payload", "pos")
    val out = Merge.lastWriterWins(delta, "id", col("pos"))
    assert(out.count() == 2)
    assert(out.filter($"id" === "CVE-1").select("payload").head().getString(0) == "second")
  }

  test("J2 lossless: collisions collapse to a sorted array, nothing lost") {
    val delta = Seq(("CVE-1", "b"), ("CVE-1", "a"), ("CVE-2", "c"))
      .toDF("id", "payload")
    val out = Merge.lossless(delta, "id", "payload")
    assert(out.count() == 2)
    assert(out.filter($"id" === "CVE-1").select("payload").head()
      .getSeq[String](0) == Seq("a", "b"))
  }

  test("guards: snapshot must be init'ed; delta must not carry stamps") {
    val bare = Seq(("CVE-1", "x")).toDF("id", "nvd")
    intercept[IllegalArgumentException] {
      Merge.upsert(bare, Seq(("CVE-1", 0.5)).toDF("id", "epss"))
    }
    intercept[IllegalArgumentException] {
      Merge.upsert(snap0, Merge.init(Seq(("CVE-1", 0.5)).toDF("id", "epss"), t1))
    }
  }

  test("snapshotDiff labels added/removed/changed; null and empty encode distinctly") {
    val prev = Seq(
      (1L, Option("a"), 10L),   // unchanged
      (2L, Option("b"), 20L),   // value change
      (3L, Option("c"), 30L),   // removed
      (5L, None: Option[String], 50L),       // null -> "" must read as CHANGED
      (6L, Option(""), 60L)     // "" stays "" -> unchanged
    ).toDF("id", "name", "v")
    val cur = Seq(
      (1L, Option("a"), 10L),
      (2L, Option("b"), 21L),
      (4L, Option("d"), 40L),   // added
      (5L, Option(""), 50L),
      (6L, Option(""), 60L)
    ).toDF("id", "name", "v")
    val out = graft.operators.Merge
      .snapshotDiff(prev, cur, "id", Seq("name", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed",
                      4L -> "added", 5L -> "changed"))
  }

  test("snapshotDiff encoding is injective: separator-looking content cannot collide") {
    // ("x\u0001y","z") vs ("x","y\u0001z") collide under naive
    // separator-joined encodings; the length-prefix code must not
    val prev = Seq((1L, "x\u0001y", "z"), (2L, "\u0002", "q")).toDF("id", "a", "b")
    val cur = Seq((1L, "x", "y\u0001z"),
                  (2L, null.asInstanceOf[String], "q")).toDF("id", "a", "b")
    val out = graft.operators.Merge.snapshotDiff(prev, cur, "id", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "changed", 2L -> "changed"))
  }
}
