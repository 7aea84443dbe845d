package graft

import org.apache.spark.sql.SparkSession

/** Job labelling for profiling (guide §1.5 "label your jobs"): every
  * Spark job submitted inside `apply`'s thunk carries `desc` in its
  * `spark.job.description` property, which the Spark UI and the Profile
  * `--jobs` listener surface. Descriptions are thread-local on the
  * driver; the previous value is restored on exit so nested steps
  * compose ("tick 2 > dedup > verify"). Zero effect on what any query
  * computes. */
object JobLabel {
  def apply[T](spark: SparkSession, desc: String)(f: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    val full = Option(prev).filter(_.nonEmpty).map(p => s"$p > $desc").getOrElse(desc)
    sc.setJobDescription(full)
    try f finally sc.setJobDescription(prev)
  }
}

/** Run INDEPENDENT Spark actions concurrently from the driver (guide
  * §2.6 — Spark's scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because driver code calls
  * them sequentially). Used for step pairs that touch DISJOINT stores
  * (e.g. a tick's band-layer append vs its shingle-store append): each
  * is idempotent on its own store under the tick's crash model, so
  * overlapping them changes wall-clock only, never any answer or the
  * crash-convergence argument. Every thunk is awaited; the first failure
  * is rethrown after all have settled so no thunk is left running when
  * the caller unwinds. Spark's job-description local property is
  * inheritable-thread-local, so labels set by the spawning step carry
  * into the threads. */
object Par {
  def apply(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_.apply()); return }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = thunks.zipWithIndex.map { case (f, i) =>
      val t = new Thread(() => try f() catch { case e: Throwable => errs.add(e); () },
        s"graft-par-$i")
      t.start(); t
    }
    threads.foreach(_.join())
    if (!errs.isEmpty) {
      // every failure is preserved: the first is thrown, the rest ride
      // as suppressed (ADVICE r21 — dropping them hid a second side's
      // root cause). No sibling interrupt: each side is independently
      // idempotent under the tick's crash model, the threads share one
      // SparkContext (a blind interrupt can wedge an in-flight commit),
      // and both sides are bounded Spark actions, not open-ended loops.
      val it = errs.iterator()
      val first = it.next()
      while (it.hasNext) first.addSuppressed(it.next())
      throw first
    }
  }
}
