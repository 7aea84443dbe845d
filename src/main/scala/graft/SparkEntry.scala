package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-area catalogs; every entry with a
  * SQL-expressible semantics also has a DuckDB oracle in `oracleSql`
  * (column names aliased identically on both sides — the driver's compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's whole job in one plan (SURVEY.md §3): a full-outer
    * enrichment merge (K1/J1) of a snapshot with a delta source, followed
    * by the prioritizer's coalesce + when-ladder (F16-F18).
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val snapshot = Tables.load(spark, dir, "customer")
      .select($"c_custkey".as("id"), $"c_name".as("name"), $"c_acctbal".as("acctbal"))
    val delta = Tables.load(spark, dir, "orders")
      .groupBy($"o_custkey".as("id"))
      .agg(sum($"o_totalprice").as("spend"), count(lit(1)).as("order_cnt"),
           max($"o_orderpriority").as("top_priority"))
    snapshot.join(delta, Seq("id"), "full_outer")
      .withColumn("priority",
        when($"top_priority" === "1-URGENT" && $"spend" >= 500000.0, 1)
          .when($"spend" >= 500000.0, 2)
          .when($"top_priority" === "1-URGENT", 3)
          .otherwise(4))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.Ext.queries ++
    graft.queries.Advanced.queries ++
    graft.queries.Domain.queries ++
    graft.queries.Curation.queries ++
    graft.queries.SearchQ.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
    graft.queries.Ext.oracle ++
    graft.queries.Advanced.oracle ++
    graft.queries.Domain.oracle ++
    graft.queries.Curation.oracle ++
    graft.queries.SearchQ.oracle
}
