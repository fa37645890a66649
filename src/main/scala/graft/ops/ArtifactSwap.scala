package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe replace of a directory-shaped artifact (a parquet table
  * on a filesystem). A plain delete-then-move has a window where the
  * artifact simply does not exist — and worse, a caller that treats
  * "missing" as "fresh" silently re-initializes state from one batch
  * (the failure the round-11 review caught in the count-artifact
  * merge). The protocol here is rename-aside with roll-forward
  * recovery:
  *
  *  1. the replacement is FULLY written to `<live>.next`;
  *  2. `<live>` renames to `<live>.old` (atomic);
  *  3. `<live>.next` renames to `<live>` (atomic);
  *  4. `<live>.old` is deleted.
  *
  * [[recover]] closes every crash window at the next access:
  * `.next` complete + live missing → roll FORWARD (finish step 3);
  * live missing + `.old` present → roll BACK (undo step 2); stale
  * `.next`/`.old` beside a healthy live → delete. Callers must
  * invoke [[recover]] before reading liveness state (a marker file,
  * table existence) and use [[writeAndSwap]] for the replace.
  *
  * ATOMIC-RENAME CONTRACT (round-14 verdict #5): steps 2 and 3 are
  * crash-windows-free ONLY where a directory rename is a single
  * atomic metadata operation — true on local/posix filesystems and
  * HDFS, FALSE on S3A (a "rename" is a per-object copy+delete: a
  * crash mid-rename leaves BOTH half-directories, which [[recover]]
  * cannot distinguish from a completed state). Paths resolve through
  * the Hadoop FileSystem API, and [[writeAndSwap]]/[[recover]]
  * REFUSE schemes outside [[AtomicRenameSchemes]] rather than run a
  * silently unsafe swap. An object-store deployment commits through
  * its native atomic primitive instead — [[PointerSwap]] (versioned
  * dirs + a one-file commit pointer, in this repo) or a table-format
  * snapshot — or extends the whitelist explicitly
  * via the Hadoop conf key [[AssumeAtomicKey]] after verifying its
  * store's rename semantics (e.g. HDFS-compatible stores like
  * Azure ABFS with hierarchical namespaces).
  */
object ArtifactSwap {

  /** Schemes whose directory rename is a single atomic metadata op.
    * A null/absent scheme is a plain local path. */
  val AtomicRenameSchemes: Set[String] = Set("file", "hdfs", "viewfs")

  /** Hadoop conf escape hatch: set to "true" to extend the whitelist
    * to a store whose rename atomicity the deployment has verified. */
  val AssumeAtomicKey = "graft.artifactswap.assume.atomic.rename"

  // the shared ops-layer FileSystem resolution (one definition)
  private def fsOf(dir: String): (FileSystem, Path) = StoreFiles.fsOf(dir)

  /** Refuse to swap on a filesystem whose rename is not atomic —
    * loud and early, never a silent crash window (spec-asserted). */
  private[graft] def requireAtomicRename(fs: FileSystem): Unit = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    require(AtomicRenameSchemes(scheme) ||
        fs.getConf.getBoolean(AssumeAtomicKey, false),
      s"ArtifactSwap requires ATOMIC directory rename and filesystem " +
        s"scheme '$scheme' does not guarantee it (an S3A rename is a " +
        s"copy+delete with a crash window recover() cannot close). " +
        s"Commit through PointerSwap (versioned dirs + one-file " +
        s"pointer) or the store's native snapshot primitive, or set " +
        s"$AssumeAtomicKey=true after verifying the store's rename " +
        s"semantics.")
  }

  private def rename(fs: FileSystem, src: Path, dst: Path): Unit =
    require(fs.rename(src, dst), s"rename failed: $src -> $dst")

  /** `.next` is complete iff its parquet write finished: Spark writes
    * `_SUCCESS` last. */
  private def complete(fs: FileSystem, dir: Path): Boolean =
    fs.exists(dir) && fs.getFileStatus(dir).isDirectory &&
      fs.exists(new Path(dir, "_SUCCESS"))

  /** Close any crash window left by a previous [[writeAndSwap]]. */
  def recover(live: String): Unit = {
    val (fs, liveP) = fsOf(live)
    requireAtomicRename(fs)
    val next = new Path(live + ".next")
    val old = new Path(live + ".old")
    if (!fs.exists(liveP) && complete(fs, next)) {
      // crashed between steps 2 and 3: finish the swap
      rename(fs, next, liveP)
      if (fs.exists(old)) fs.delete(old, true)
    } else if (!fs.exists(liveP) && fs.exists(old)) {
      // crashed with an incomplete .next: restore the previous state
      rename(fs, old, liveP)
      if (fs.exists(next)) fs.delete(next, true)
    } else {
      // healthy live: anything else is debris from a completed or
      // abandoned swap
      if (fs.exists(next)) fs.delete(next, true)
      if (fs.exists(old)) fs.delete(old, true)
    }
    ()
  }

  /** Write the replacement via `body` (given the staging path), then
    * swap it in. `body` must fully materialize the artifact — the
    * swap only begins after it returns. */
  def writeAndSwap(live: String)(body: String => Unit): Unit = {
    recover(live)
    val (fs, liveP) = fsOf(live)
    val next = new Path(live + ".next")
    if (fs.exists(next)) fs.delete(next, true)
    body(live + ".next")
    if (fs.exists(liveP))
      rename(fs, liveP, new Path(live + ".old"))
    rename(fs, next, liveP)
    fs.delete(new Path(live + ".old"), true)
    ()
  }
}
