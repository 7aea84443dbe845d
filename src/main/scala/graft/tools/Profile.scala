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
    val sampler = if (args.contains("--driver")) Some(new MainSampler) else None
    (1 to iters).foreach { i =>
      listener.foreach(_.reset())
      sampler.foreach(_.reset())
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      listener.foreach(_.report())
      sampler.foreach(_.report())
    }
    sampler.foreach(_.stop())
    spark.stop()
  }

  /** `--driver`: sample the MAIN thread's stack every 20 ms from a
    * daemon thread and report where driver time goes — the guide §7.3
    * thread-dump loop automated, for the lifecycle queries whose wall
    * time is mostly OUTSIDE any Spark job (per-action planning, FS
    * round-trips, commit protocol). Attribution = topmost frame from a
    * fixed interest list, else the topmost non-JDK frame. */
  final class MainSampler {
    private val main = Thread.currentThread()
    private val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile private var running = true
    private def bucket(st: Array[StackTraceElement]): String = {
      val s = st.map(e => e.getClassName + "." + e.getMethodName)
      def has(p: String) = s.exists(_.contains(p))
      if (s.isEmpty) "(no stack)"
      else if (has("DAGScheduler.runJob") || has("SparkPlan.executeCollect") ||
               has("runJob")) "waiting on Spark job"
      else if (has("QueryExecution") || has("RuleExecutor") || has("Analyzer") ||
               has("Optimizer")) {
        // attribute to the specific rule/phase on the stack
        val rule = s.find(f =>
          (f.contains("catalyst.analysis.") || f.contains("catalyst.optimizer.") ||
           f.contains("execution.adaptive.") || f.contains("sql.execution.")) &&
          f.contains("$.apply") && !f.contains("RuleExecutor"))
          .map(_.split('.').dropRight(1).last)
        val phase =
          if (has("Analyzer")) "analyze" else if (has("Optimizer")) "optimize"
          else if (has("preparations") || has("prepareForExecution") ||
                   has("QueryPlanner") || has("SparkStrategies")) "physical-plan"
          else "plan"
        s"catalyst $phase: ${rule.getOrElse(s.take(18).findLast(f => !f.startsWith("org.apache.spark.sql.catalyst.trees") && !f.startsWith("scala.") && !f.startsWith("java.")).getOrElse("?"))}"
      }
      else if (has("CodeGenerator") || has("janino")) "codegen compile"
      else if (has("ParquetFileFormat") || has("ParquetUtils") ||
               has("readParquetFootersInParallel") || has("FileSourceStrategy") ||
               has("InMemoryFileIndex") || has("listLeafFiles") ||
               has("DataSource")) "file listing / parquet footers"
      else if (has("FileFormatWriter") || has("commitJob") ||
               has("HadoopMapReduceCommitProtocol")) "write commit protocol"
      else if (has("RawLocalFileSystem") || has("ChecksumFileSystem") ||
               has("FileSystem")) "hadoop FS call"
      else if (has("ClosureCleaner") || has("SparkContext.clean")) "closure cleaning"
      else if (has("broadcast")) "broadcast build"
      else s.find(f => !f.startsWith("java.") && !f.startsWith("jdk.") &&
                       !f.startsWith("scala.") && !f.startsWith("sun."))
             .getOrElse(s.head)
    }
    private val dump = sys.env.get("SPARK_GRAFT_STACK_DUMP").map(p =>
      new java.io.PrintWriter(new java.io.FileWriter(p, true)))
    // Spark 4 runs command/query execution on separate pool threads (the
    // main thread parks on a future) — sample EVERY runnable non-executor
    // thread, so driver-side planning is attributed wherever it runs;
    // executor task threads roll up into one "executor compute" bucket.
    private val t = new Thread(() => {
      while (running) {
        import scala.jdk.CollectionConverters._
        val all = Thread.getAllStackTraces.asScala
        all.foreach { case (th, st) =>
          val name = th.getName
          if (th.getState == Thread.State.RUNNABLE && st.nonEmpty &&
              name != "graft-driver-sampler") {
            val b =
              if (name.startsWith("Executor task launch")) "executor compute"
              else bucket(st)
            counts.merge(b, 1, (a, c) => a + c)
            if (!name.startsWith("Executor task launch"))
              dump.foreach { w =>
                w.println(name + "\t" + st.map(e =>
                  e.getClassName + "." + e.getMethodName).mkString("\t"))
              }
          }
        }
        dump.foreach(_.flush())
        Thread.sleep(20)
      }
    }, "graft-driver-sampler")
    t.setDaemon(true); t.start()
    def reset(): Unit = counts.clear()
    def stop(): Unit = running = false
    def report(): Unit = {
      import scala.jdk.CollectionConverters._
      val total = counts.values.asScala.map(_.toInt).sum.max(1)
      println(f"[profile] driver samples=$total (~${total * 0.02}%.1f s)")
      counts.asScala.toSeq.sortBy(-_._2).take(15).foreach { case (k, n) =>
        println(f"[profile]   ${n * 100.0 / total}%5.1f%% (~${n * 0.02}%5.1f s)  $k")
      }
    }
  }

  /** Collects per-job wall time + description and per-stage executor task
    * time; `report()` prints jobs in submission order with a >=50ms floor
    * so the output stays readable. */
  final class JobTimeListener extends org.apache.spark.scheduler.SparkListener {
    import org.apache.spark.scheduler._
    private case class J(id: Int, desc: String, var start: Long = 0L,
                         var end: Long = 0L, var taskTimeMs: Long = 0L,
                         var stages: Int = 0, var tasks: Int = 0,
                         var names: List[String] = Nil)
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
        j.tasks += e.stageInfo.numTasks
        j.names ::= e.stageInfo.name.takeWhile(_ != '\n')
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
          println(f"[profile]   job ${j.id}%4d ${wall / 1000.0}%7.2f s  taskTime=${j.taskTimeMs / 1000.0}%7.2f s stages=${j.stages}%3d tasks=${j.tasks}%4d  ${j.desc.take(80)}  [${j.names.headOption.getOrElse("").take(60)}]")
      }
    }
  }
}
