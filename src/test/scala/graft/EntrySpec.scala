package graft

import org.apache.spark.sql.functions._

/** Driver-contract smoke: entry() must return rows on sf0.001, and every
  * catalog query must at least produce a schema (analysis) without
  * touching data. */
class EntrySpec extends SparkSpec {

  test("entry() returns a non-empty merged+prioritized frame") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("priority"))
    assert(df.filter(col("priority").between(1, 4)).count() == df.count())
  }

  test("every query analyzes against sf0.001 (schema resolution)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, "/root/testdata/sf0.001").schema
      assert(schema.nonEmpty, s"$name produced an empty schema")
    }
  }

  test("every oracle key has a matching query key") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }
}
