package graft.sources

import java.io.{File, FileOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.ZipInputStream

/** Bronze-layer staging utilities (SURVEY.md §2.1 S2/S3): the
  * reference fetches its dataset over HTTP via the Kaggle API and
  * unzips the download before the pipeline proper starts
  * (`/root/reference/etl_pipeline/extract_api.py:38-94`,
  * `elt/extract_load_API.ipynb:cell2`). Both steps are PRE-ENGINE
  * ingestion — single-machine, driver-side, no DataFrame involved —
  * so they live here as thin JDK utilities, deliberately OUTSIDE the
  * Spark query surface (SURVEY §2.1 scopes them out of the engine;
  * at 100 TB real feeds land via a distributed bus, not a driver
  * download). `java.net` URL streams cover http(s)://, and — what the
  * zero-egress sandbox tests exercise — file:// fixtures.
  *
  * Once staged, the bronze files enter the engine through the normal
  * scan surface (`spark.read.csv` — SourcesSpec S1).
  */
object Staging {

  /** Download `url` into `bronzeDir` (created if absent). The file
    * name defaults to the URL's last path segment; an existing file
    * is replaced (staging is an idempotent full refresh, matching
    * the reference's re-download semantics). Returns the local file. */
  def fetchToBronze(url: String, bronzeDir: String,
      fileName: String = null): File = {
    val dir = Files.createDirectories(Paths.get(bronzeDir))
    val name = Option(fileName).getOrElse(
      url.split('/').lastOption.filter(_.nonEmpty).getOrElse("download"))
    val dest = dir.resolve(name)
    val in = java.net.URI.create(url).toURL.openStream()
    try Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    dest.toFile
  }

  /** Extract a zip archive into `destDir`, returning the extracted
    * files. Entry paths are validated against zip-slip: an entry
    * whose normalized path escapes `destDir` (e.g. `../../etc/x`)
    * fails the whole extraction loudly rather than writing outside
    * the bronze layer. Directory entries are created, not returned. */
  def unzip(zipFile: File, destDir: String): Seq[File] = {
    val dest = Files.createDirectories(Paths.get(destDir))
      .toAbsolutePath.normalize()
    val zin = new ZipInputStream(Files.newInputStream(zipFile.toPath))
    val out = Seq.newBuilder[File]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val target = dest.resolve(e.getName).normalize()
        require(target.startsWith(dest),
          s"zip entry escapes staging dir (zip-slip): ${e.getName}")
        if (e.isDirectory) { Files.createDirectories(target); () }
        else {
          Files.createDirectories(target.getParent)
          val fos = new FileOutputStream(target.toFile)
          try {
            val buf = new Array[Byte](65536)
            var n = zin.read(buf)
            while (n >= 0) { fos.write(buf, 0, n); n = zin.read(buf) }
          } finally fos.close()
          out += target.toFile
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Fetch + extract in one step — the reference's
    * `download → unzip → read CSV` staging sequence. Non-zip
    * downloads are returned as-is. */
  def stage(url: String, bronzeDir: String): Seq[File] = {
    val f = fetchToBronze(url, bronzeDir)
    if (f.getName.toLowerCase.endsWith(".zip")) unzip(f, bronzeDir)
    else Seq(f)
  }
}
