package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * $SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is fully materialized through the `noop` sink — `count()`
  * would let Catalyst prune projections and undercount real work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen once on the smallest table so the first timed
    // query doesn't pay one-time init costs.
    Tables.load(spark, sfDir, "region").write.format("noop").mode("overwrite").save()

    // Optional args = query-name prefixes, for iterating on a subset
    // locally (the driver passes none and benches everything).
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => args.exists(k.startsWith) }
    val (results, failed) = run(spark, sfDir, selected)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fl,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Materialize every query through the noop sink, timing each. A dead
    * query lands in the returned `failed` list so it is visible in the
    * emitted JSON, not just on stderr — otherwise it would report a
    * (tiny) wall time and the round would look green. */
  def run(spark: SparkSession, sfDir: String,
          queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame])
      : (Seq[(String, Double)], Seq[String]) = {
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    (results, failed.toSeq)
  }
}
