package graft.tools

import graft.SparkEntry

/** Dump `.explain("formatted")` for a list of queries to files.
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <query...> */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val suffix = args(1)
    // --executed: materialize through the noop sink first and dump the
    // FINAL adaptive plan (AQEShuffleRead coalescing, runtime join
    // switches) instead of the initial one — what actually ran.
    val executed = args.contains("--executed")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    args.drop(2).filterNot(_.startsWith("--")).foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (executed) df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
