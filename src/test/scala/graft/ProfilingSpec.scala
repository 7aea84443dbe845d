package graft

import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, cardinality and ranges per column in one pass") {
    val df = Seq(
      (Some(3L), Some("b")),
      (Some(1L), None),
      (None, Some("a")),
      (Some(3L), Some("a"))
    ).toDF("num", "str")
    val p = Profiling.profile(df, Seq("num", "str"), numeric = Set("num"))
      .collect().map(r => r.getString(0) -> r).toMap

    val num = p("num")
    assert(num.getLong(1) == 4 && num.getLong(2) == 3 && num.getLong(3) == 1)
    assert(num.getLong(4) == 2) // distinct excludes null: {1, 3}
    assert(num.getDouble(5) == 1.0 && num.getDouble(6) == 3.0)
    assert(num.isNullAt(7) && num.isNullAt(8))

    val str = p("str")
    assert(str.getLong(2) == 3 && str.getLong(3) == 1)
    assert(str.getLong(4) == 2)
    assert(str.isNullAt(5) && str.isNullAt(6))
    assert(str.getString(7) == "a" && str.getString(8) == "b")
  }

  test("profileApprox: same shape, HLL cardinality within the error bound") {
    val df = spark.range(0, 5000).selectExpr(
      "id AS k", "CAST(id % 137 AS STRING) AS s", "CAST(id % 7 AS DOUBLE) AS d")
    val cols = Seq("k", "s", "d")
    val exact = Profiling.profile(df, cols, numeric = Set("k", "d"))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val approx = Profiling.profileApprox(df, cols, numeric = Set("k", "d"),
        rsd = 0.05)
      .collect().map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      val a = approx(c).getLong(4).toDouble
      val x = exact(c).toDouble
      // HLL++ rsd 5%: allow 3 sigma
      assert(math.abs(a - x) / x <= 0.15,
        s"$c: approx $a vs exact $x out of bound")
    }
    // every non-cardinality metric is identical to the exact profile
    val exactRows = Profiling.profile(df, cols, numeric = Set("k", "d"))
      .drop("n_distinct").collect().map(_.toSeq).toSet
    val approxRows = Profiling.profileApprox(df, cols, numeric = Set("k", "d"))
      .drop("n_distinct").collect().map(_.toSeq).toSet
    assert(exactRows == approxRows)
  }
}
