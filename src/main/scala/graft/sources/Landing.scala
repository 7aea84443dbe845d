package graft.sources

import java.io.{BufferedOutputStream, File, FileInputStream, FileOutputStream}
import java.util.zip.ZipInputStream

/** Landing-directory utilities (SURVEY S11): the reference's transparent
  * decompress step (handlers/utils.py:56-141). Gzip needs nothing here —
  * Hadoop codecs decompress `.gz` on read (covered by the epss .csv.gz
  * spec); zip is not a Hadoop codec, so archives are extracted into the
  * landing dir before the Spark scan. Driver-side control plane: archives
  * arrive one per source per tick, never through executors.
  */
object Landing {

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
