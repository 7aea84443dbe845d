package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Micro-profiler: time one query (optionally print its formatted plan).
  * Usage: runMain graft.tools.Profile <queryName> [sfDir] [--explain] [--iters N]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.drop(1).find(!_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("--explain")
    val iters = args.sliding(2).collectFirst {
      case Array("--iters", n) => n.toInt }.getOrElse(1)
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (explain) fn(spark, sfDir).explain("formatted")
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
