package graft.ops

import java.io.File
import java.nio.file.{Files, Paths}

/** Crash-safe replace of a directory-shaped artifact (a parquet table
  * on local disk). POSIX `rename` cannot atomically replace a
  * NON-EMPTY directory, so a plain delete-then-move has a window
  * where the artifact simply does not exist — and worse, a caller
  * that treats "missing" as "fresh" silently re-initializes state
  * from one batch (the failure the round-11 review caught in the
  * count-artifact merge). The protocol here is rename-aside with
  * roll-forward recovery:
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
  * Scope: local/posix paths (the test and single-node lakehouse
  * layout). An object-store deployment swaps via its native
  * atomic-commit (table-format snapshot or conditional PUT) instead.
  */
object ArtifactSwap {

  private def rmTree(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(); ()
  }

  /** `.next` is complete iff its parquet write finished: Spark writes
    * `_SUCCESS` last. */
  private def complete(dir: File): Boolean =
    dir.isDirectory && new File(dir, "_SUCCESS").exists()

  /** Close any crash window left by a previous [[writeAndSwap]]. */
  def recover(live: String): Unit = {
    val liveF = new File(live)
    val next = new File(live + ".next")
    val old = new File(live + ".old")
    if (!liveF.exists() && complete(next)) {
      // crashed between steps 2 and 3: finish the swap
      Files.move(next.toPath, liveF.toPath)
      if (old.exists()) rmTree(old)
    } else if (!liveF.exists() && old.exists()) {
      // crashed with an incomplete .next: restore the previous state
      Files.move(old.toPath, liveF.toPath)
      if (next.exists()) rmTree(next)
    } else {
      // healthy live: anything else is debris from a completed or
      // abandoned swap
      if (next.exists()) rmTree(next)
      if (old.exists()) rmTree(old)
    }
  }

  /** Write the replacement via `body` (given the staging path), then
    * swap it in. `body` must fully materialize the artifact — the
    * swap only begins after it returns. */
  def writeAndSwap(live: String)(body: String => Unit): Unit = {
    recover(live)
    val next = live + ".next"
    rmTree(new File(next))
    body(next)
    val liveF = new File(live)
    if (liveF.exists())
      Files.move(liveF.toPath, Paths.get(live + ".old"))
    Files.move(Paths.get(next), liveF.toPath)
    rmTree(new File(live + ".old"))
  }
}
