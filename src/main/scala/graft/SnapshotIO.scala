package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory swap shared by every snapshot-rewrite site
  * (CveJob.runTick, Watermarks.upsert, EventsStream.mergeSink).
  *
  * The naive delete(dst) + rename(tmp, dst) has a window where a crash
  * destroys the snapshot; because init-vs-update mode is inferred from the
  * snapshot's existence, the next tick would then silently rebuild from
  * scratch and lose created_at history. Here the old snapshot is renamed
  * to a backup first and deleted only after the new data is in place, and
  * [[recover]] restores the backup if a crash is detected between the two
  * renames. At 100 TB this whole pattern is a table-format commit
  * (Iceberg/Delta MERGE); on a plain filesystem this is the closest
  * equivalent.
  */
object SnapshotIO {

  private def bakPath(dst: String) = new Path(dst + "_bak")

  /** Replace the directory at `dst` with the one at `tmp`.
    * Sequence: delete stale backup → dst → backup → tmp → dst → delete
    * backup. A crash at any point leaves either the old snapshot (at dst
    * or at the backup) or the fully-written new one — never nothing. */
  def swap(conf: Configuration, tmp: String, dst: String): Unit = {
    val fs = FileSystem.get(conf)
    val d = new Path(dst)
    val bak = bakPath(dst)
    // Self-enforcing: if a previous swap crashed between its renames, the
    // backup holds the only copy — restore it BEFORE deleting anything,
    // so crash-safety doesn't depend on every caller remembering a
    // recover() preamble.
    recover(conf, dst)
    fs.delete(bak, true)
    if (fs.exists(d)) {
      if (!fs.rename(d, bak))
        throw new java.io.IOException(s"backup rename failed: $dst -> $bak")
    }
    if (!fs.rename(new Path(tmp), d))
      throw new java.io.IOException(s"swap rename failed: $tmp -> $dst")
    fs.delete(bak, true)
  }

  /** Heal a crash between the two renames of [[swap]]: if `dst` is gone
    * but its backup survives, restore the backup. Call before any
    * existence probe that gates init-vs-update behavior. Returns true if
    * a restore happened. */
  def recover(conf: Configuration, dst: String): Boolean = {
    val fs = FileSystem.get(conf)
    val d = new Path(dst)
    val bak = bakPath(dst)
    if (!fs.exists(d) && fs.exists(bak)) fs.rename(bak, d) else false
  }

  /** Heal every child of `parent` left in the crashed state (some
    * `X_bak` whose `X` is gone) — the per-partition analog of [[recover]]
    * for layouts that swap many directories (PartitionedSnapshot). */
  def recoverAll(conf: Configuration, parent: String): Int = {
    val fs = FileSystem.get(conf)
    val p = new Path(parent)
    if (!fs.exists(p)) return 0
    fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith("_bak"))
      .count(name => recover(conf, new Path(p, name.stripSuffix("_bak")).toString))
  }

  /** Existence probe through the SAME FileSystem as swap/recover — a
    * java.io.File check silently disagrees with a non-local
    * fs.defaultFS and would flip callers into from-scratch rebuild
    * paths. Non-empty = exists with at least one child. */
  def nonEmpty(conf: Configuration, dir: String): Boolean = {
    val fs = FileSystem.get(conf)
    val p = new Path(dir)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
