package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Micro-profiler: time one query (optionally print its formatted plan
  * and/or a per-Spark-job time breakdown).
  * Usage: runMain graft.tools.Profile <queryName> [sfDir] [--explain] [--iters N] [--jobs]
  *
  * `--jobs` registers a SparkListener and, after each iteration, prints
  * every Spark job the iteration ran — id, wall duration, description
  * (see guide §1.5: label your jobs) — plus stage task-time totals, so
  * "where does this 20 s query spend its time" is answered by data
  * instead of guesses (guide §1.1: measure first).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.drop(1).find(!_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("--explain")
    val jobs = args.contains("--jobs")
    val iters = args.sliding(2).collectFirst {
      case Array("--iters", n) => n.toInt }.getOrElse(1)
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (explain) fn(spark, sfDir).explain("formatted")
    val listener = if (jobs) Some(new JobTimeListener) else None
    listener.foreach(spark.sparkContext.addSparkListener)
    (1 to iters).foreach { i =>
      listener.foreach(_.reset())
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      listener.foreach(_.report())
    }
    spark.stop()
  }

  /** Collects per-job wall time + description and per-stage executor task
    * time; `report()` prints jobs in submission order with a >=50ms floor
    * so the output stays readable. */
  final class JobTimeListener extends org.apache.spark.scheduler.SparkListener {
    import org.apache.spark.scheduler._
    private case class J(id: Int, desc: String, var start: Long = 0L,
                         var end: Long = 0L, var taskTimeMs: Long = 0L,
                         var stages: Int = 0)
    private val byJob = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    private val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    private val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()

    def reset(): Unit = { byJob.clear(); stageToJob.clear(); order.clear() }

    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      val j = J(e.jobId, desc, start = e.time)
      byJob.put(e.jobId, j); order.add(e.jobId)
      e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      Option(byJob.get(e.jobId)).foreach(_.end = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val sid = e.stageInfo.stageId
      Option(stageToJob.get(sid)).flatMap(j => Option(byJob.get(j))).foreach { j =>
        j.taskTimeMs += e.stageInfo.taskMetrics.executorRunTime
        j.stages += 1
      }
    }
    def report(): Unit = {
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.flatMap(id => Option(byJob.get(id)))
      val total = js.map(j => j.end - j.start).sum
      println(f"[profile] jobs=${js.size} wall-sum=${total / 1000.0}%.2f s (overlaps possible)")
      js.foreach { j =>
        val wall = j.end - j.start
        if (wall >= 50)
          println(f"[profile]   job ${j.id}%4d ${wall / 1000.0}%7.2f s  taskTime=${j.taskTimeMs / 1000.0}%7.2f s stages=${j.stages}%3d  ${j.desc.take(110)}")
      }
    }
  }
}
