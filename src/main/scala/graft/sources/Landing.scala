package graft.sources

import java.io.{BufferedOutputStream, File, FileInputStream, FileOutputStream}
import java.util.zip.ZipInputStream

import org.apache.spark.sql.Dataset

/** Landing-directory utilities (SURVEY S11): the reference's transparent
  * decompress step (handlers/utils.py:56-141). Gzip needs nothing here —
  * Hadoop codecs decompress `.gz` on read (covered by the epss .csv.gz
  * spec); zip is not a Hadoop codec, so archives are extracted into the
  * landing dir before the Spark scan. Driver-side control plane: archives
  * arrive one per source per tick, never through executors.
  */
object Landing {

  /** Recursive local delete that never follows a symlink — File.listFiles
    * descends THROUGH directory links, so a naive recursive delete of a
    * work dir containing links into a source table would delete the
    * table's contents (found the hard way in round 6). Shared by every
    * shutdown-hook cleanup. */
  def deleteNoFollow(f: File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles).foreach(_.foreach(deleteNoFollow))
    f.delete(); ()
  }

  /** Land fetched pages as one file per page, written by the EXECUTORS
    * straight to the landing filesystem — the step between the S1/S2
    * distributed fetch ([[Fetch.fetchPages]]) and the declared-schema scan
    * ([[Readers.nvd]]), closing the reference's fetch→parse loop
    * (datasources/nvd_handler.py:90-120) without funnelling page bodies
    * through the driver. Filenames are deterministic in the page number
    * and the write overwrites, so a retried task re-lands identical
    * files — the landing dir is idempotent under Spark's task retry the
    * same way the K1 merge is idempotent under tick replay. The dir is
    * WIPED (driver-side) before the fetch runs: re-landing a smaller
    * fetch into a previously used dir must not leave the earlier tick's
    * higher-numbered page files for the declared-schema scan to silently
    * include — idempotence has to hold per LANDING, not just per page.
    * Returns the number of pages landed (the action that runs the
    * fetch).
    *
    * `wipe = false` APPENDS to an existing landing — the sequential-
    * window-group path, where one tick's chunked pull lands as several
    * consecutive actions (page numbers already disjoint) and only the
    * FIRST may wipe: a later group wiping would silently drop the
    * earlier groups' pages from the scan. */
  def landPages(pages: Dataset[FetchedPage], dir: String,
                wipe: Boolean = true): Long =
    landFiles(pages, dir, wipe)(p => f"page-${p.page}%05d.json", _.body)

  /** Land a KEY-addressed fetch as `<name>.json` files written by the
    * EXECUTORS ([[landPages]]' shape and idempotence contract: wiped
    * dir, deterministic names, overwriting writes — a retried task or
    * a re-landed tick converges to identical files). This is the
    * cve.org per-CVE fan-out's landing half: the extracted-tree reader
    * (`Readers.cveOrg`) derives each record's id from its FILENAME, so
    * the name must be the CVE id. Names are sanitized against path
    * separators — a landing name never escapes its dir. Returns files
    * landed. */
  def landKeyed(files: Dataset[FetchedFile], dir: String): Long =
    landFiles(files, dir)({ f =>
      require(!f.name.contains("/") && !f.name.contains("\\") &&
        f.name.nonEmpty && f.name != "." && f.name != "..",
        s"illegal landing name '${f.name}'")
      s"${f.name}.json"
    }, _.body)

  /** The shared landing scaffold both namers above sit on — ONE place
    * owns the contract so the paginated and keyed landings cannot
    * silently diverge:
    *  - ship the DRIVER's Hadoop config to the tasks (spark.hadoop.*
    *    keys, fs credentials, defaultFS) — a bare executor-side
    *    Configuration would drop them and resolve the landing FS
    *    differently from a parquet write;
    *  - wipe + recreate the dir driver-side before any task writes
    *    (unless the caller is appending a later window group of the
    *    SAME landing — landPages' `wipe = false`): re-landing a smaller
    *    fetch must not leave the earlier landing's extra files for the
    *    declared-schema scan to silently include — idempotence holds
    *    per LANDING, not just per file. (Hadoop's delete removes a
    *    symlink itself rather than descending through it — no round-6
    *    follow-the-link hazard);
    *  - executors write one deterministically-named, overwriting file
    *    per row, so a retried task re-lands identical bytes.
    * Returns files landed (the action that runs the fetch). */
  private def landFiles[T](rows: Dataset[T], dir: String,
                           wipe: Boolean = true)
                          (fileName: T => String, body: T => String): Long = {
    import rows.sparkSession.implicits._
    val hconf = rows.sparkSession.sparkContext.hadoopConfiguration
    val conf = new org.apache.spark.util.SerializableConfiguration(hconf)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dirFs = dirPath.getFileSystem(hconf)
    if (wipe && dirFs.exists(dirPath)) dirFs.delete(dirPath, true)
    dirFs.mkdirs(dirPath)
    rows.mapPartitions { it =>
      val path = new org.apache.hadoop.fs.Path(dir)
      val fs = path.getFileSystem(conf.value)
      fs.mkdirs(path)
      var landed = 0L
      it.foreach { r =>
        val out = fs.create(new org.apache.hadoop.fs.Path(path, fileName(r)), true)
        try out.write(body(r).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        landed += 1
      }
      Iterator.single(landed)
    }.toDF("n")
      .agg(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum("n"),
        org.apache.spark.sql.functions.lit(0L)))
      .head().getLong(0)
  }

  /** Extract a zip archive into `destDir`, returning extracted paths in
    * archive order. Zip-slip safe. */
  def extractZip(zipPath: String, destDir: String): Seq[String] = {
    val dest = new File(destDir)
    dest.mkdirs()
    val destCanonical = dest.getCanonicalPath
    val in = new ZipInputStream(new FileInputStream(zipPath))
    val out = Seq.newBuilder[String]
    try {
      var entry = in.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory) {
          val target = new File(dest, entry.getName)
          require(target.getCanonicalPath.startsWith(destCanonical + File.separator),
            s"zip entry escapes destination: ${entry.getName}")
          target.getParentFile.mkdirs()
          val os = new BufferedOutputStream(new FileOutputStream(target))
          try in.transferTo(os) finally os.close()
          out += target.getPath
        }
        entry = in.getNextEntry
      }
    } finally in.close()
    out.result()
  }

  /** Batch size [[extractZipBatched]] rolls its line files at — sized
    * so a cvelistV5-scale clone (~500k members, ~a few KB each) lands
    * as a few dozen parquet-friendly files instead of half a million
    * small ones. */
  val ZipBatchBytes: Long = 64L * 1024 * 1024

  /** Age bound past which a `.repack-*` temp dir is reclaimed even when
    * its pid reads alive — the liveness probe's backstop against pid
    * recycling (see the cleanup in [[extractZipBatched]]). Staleness is
    * keyed on the NEWEST mtime among the dir and its entries, not the
    * dir mtime alone (ADVICE r18): the directory's own mtime only moves
    * on entry create/rename — once per 64 MiB batch roll — while the
    * currently-open batch FILE's mtime moves with every buffered write,
    * so a live extraction streaming one huge batch for longer than the
    * bound keeps its newest-entry clock fresh and cannot be reclaimed
    * out from under the running process. 24 h without a single write
    * anywhere in the dir is far past any real extraction. */
  val StaleRepackMs: Long = 24L * 60 * 60 * 1000

  /** Newest mtime among `d` and its direct entries — the staleness
    * clock for [[StaleRepackMs]] (batch files land directly in the
    * repack dir, so one level suffices; the `retired/` subdir counts
    * as an entry via its own rename-updated mtime). */
  private def newestTouchMs(d: File): Long =
    (d.lastModified() +: Option(d.listFiles()).getOrElse(Array.empty)
      .map(_.lastModified()).toSeq).max

  /** Minimal JSON string escaping for [[extractZipBatched]]'s envelope
    * lines — quote, backslash, and control chars; everything else is
    * passed through (the JSON spec requires nothing more). */
  private def jsonEscape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  /** Extract a zip archive into `destDir` as BATCHED JSONL envelopes —
    * `batch-%05d.jsonl` files of `{"name": <member basename>, "body":
    * <raw member text>}` lines, rolled at ~`maxBatchBytes` — instead of
    * one file per member. This is the day-zero cvelistV5 clone's
    * landing shape: the real archive holds ~500k members, and a
    * file-per-member extraction is 500k driver-side FS creates followed
    * forever after by 500k-file scans; the batched landing is ONE
    * streaming pass over the archive (no JSON parsing on the driver —
    * bodies are re-packed verbatim, only string-escaped) and the
    * expensive work, parsing half a million CVE records, happens
    * DISTRIBUTED in `Readers.cveOrg`'s from_json over the batch scan.
    * Directory members are skipped; member PATHS are flattened to
    * basenames (the reader keys records by basename, as it does for
    * the tree layout). Returns members landed. */
  def extractZipBatched(zipPath: String, destDir: String,
                        maxBatchBytes: Long = ZipBatchBytes): Long = {
    val dest = new File(destDir)
    dest.mkdirs()
    // Repack into a DOT-PREFIXED temp sibling and swap on success. The
    // r15 fix wiped stale batches up front (a smaller re-run zip must
    // not leave old higher-numbered batch files next to the new ones —
    // the reader scans batch-*.jsonl wholesale), but wiping BEFORE the
    // archive is even opened destroys a complete previous landing when
    // the re-download turns out corrupt (ADVICE r16). Now a bad archive
    // throws with the old landing intact: the vulnerable window shrinks
    // from the WHOLE extraction (minutes for a 500k-member clone) to
    // the two metadata-only rename loops below — and a crash inside
    // even that window is recovered one level up, because the landing
    // was never marked `_LANDED`, so the re-run re-fetches and
    // re-extracts from scratch. Hadoop/Spark listings skip
    // dot-entries, so a reader racing the repack never sees temp files.
    // Temp dirs from CRASHED runs (dead pids) are cleared here — a
    // crashed 500k-member repack otherwise leaks gigabytes that no
    // future run (with its own pid-named dir) would touch. Liveness is
    // backstopped by AGE (ADVICE r17): if the OS recycled a crashed
    // run's pid onto an unrelated long-lived process, the pid check
    // alone would shield the orphaned multi-GB dir forever — any
    // .repack-* older than StaleRepackMs is reclaimed regardless (a
    // LIVE repack touches its dir continuously, so its mtime never
    // ages anywhere near the bound).
    val now = System.currentTimeMillis()
    Option(dest.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(".repack-"))
      .foreach { d =>
        val alive = scala.util.Try(
            d.getName.stripPrefix(".repack-").toLong).toOption
          .exists { p =>
            val h = ProcessHandle.of(p)
            h.isPresent && h.get.isAlive
          }
        if (!alive || now - newestTouchMs(d) > StaleRepackMs) deleteNoFollow(d)
      }
    val tmp = new File(dest, s".repack-${ProcessHandle.current().pid()}")
    deleteNoFollow(tmp)
    require(tmp.mkdirs(), s"could not create repack dir ${tmp.getPath}")
    val in = new ZipInputStream(new FileInputStream(zipPath))
    var members = 0L
    var batch = 0
    var batchBytes = 0L
    var os: java.io.Writer = null
    def roll(): Unit = {
      if (os != null) os.close()
      os = new java.io.OutputStreamWriter(
        new BufferedOutputStream(new FileOutputStream(
          new File(tmp, f"batch-$batch%05d.jsonl"))),
        java.nio.charset.StandardCharsets.UTF_8)
      batch += 1; batchBytes = 0L
    }
    try {
      roll()
      var entry = in.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory) {
          val base = entry.getName.substring(
            entry.getName.lastIndexOf('/') + 1)
          val body = new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          val line = "{\"name\":\"" + jsonEscape(base) + "\",\"body\":\"" +
            jsonEscape(body) + "\"}\n"
          if (batchBytes > 0 && batchBytes + line.length > maxBatchBytes) roll()
          os.write(line)
          batchBytes += line.length
          members += 1
        }
        entry = in.getNextEntry
      }
    } catch {
      case t: Throwable =>
        // leave the PREVIOUS landing untouched; only the temp is torn down
        try { in.close(); if (os != null) os.close() }
        catch { case _: Throwable => () }
        deleteNoFollow(tmp)
        throw t
    } finally {
      in.close(); if (os != null) os.close()
    }
    // success: now (and only now) swap — INVERTED order (ADVICE r17):
    // the old batches are first MOVED (renamed, not deleted) into a
    // `retired/` corner of the dot-prefixed temp, then the fresh ones
    // renamed into place, then the temp (old batches included) dropped.
    // The previous landing therefore stays recoverable ON DISK until
    // the new one is fully in place: a crash or failed rename anywhere
    // inside the window leaves either the retired copies or the new
    // files (the landing was never `_LANDED`-marked, so the re-run
    // re-extracts either way) — the prior order DELETED the old batches
    // first, so a crash between the two loops destroyed both
    // generations at once. Readers racing the swap may still observe an
    // empty prefix for the two metadata-rename loops, as before; they
    // cannot observe a mix of generations under a dot-ignored temp.
    val retired = new File(tmp, "retired")
    require(retired.mkdirs(), s"could not create ${retired.getPath}")
    Option(dest.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("batch-") &&
                   f.getName.endsWith(".jsonl"))
      .foreach { f =>
        require(f.renameTo(new File(retired, f.getName)),
          s"could not retire stale batch ${f.getPath}")
      }
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile)
      .foreach { f =>
        val target = new File(dest, f.getName)
        require(f.renameTo(target), s"could not move ${f.getPath} into place")
      }
    deleteNoFollow(tmp)
    members
  }

  /** The reference's single-member invariant (handlers/utils.py:113-118):
    * a "file.zip" source must contain exactly one member; returns its
    * extracted path. */
  def extractSingleMemberZip(zipPath: String, destDir: String): String = {
    val files = extractZip(zipPath, destDir)
    require(files.size == 1,
      s"expected exactly one zip member in $zipPath, found ${files.size}")
    files.head
  }
}
