package graft.ops

/** Commit-protocol selector for directory-shaped artifact stores —
  * the round-15 verdict's top task: every corpus-sized streaming
  * store (postings, semantic cells, PQ codes, dedup index, z-order
  * store) committed through [[ArtifactSwap]], whose rename-aside
  * REQUIRES atomic directory rename and so refuses S3-class object
  * storage. This trait is the one seam the sinks, compactions, and
  * serve paths thread a commit mode through:
  *
  *  - [[SwapCommit]] (default, unchanged behavior): the store root IS
  *    the live directory; whole-store replaces ride the
  *    [[ArtifactSwap]] rename-aside. Correct on local/posix/HDFS.
  *  - [[PointerCommit]]: the store root holds versioned dirs plus the
  *    [[PointerSwap]] one-file commit pointer. Reads resolve the
  *    committed version; appends write INTO it (new objects only —
  *    their replay safety is the sinks' watermark/marker protocol,
  *    which never needed rename atomicity); whole-store replaces
  *    stage the next version and flip the pointer — one small-object
  *    PUT, atomic on S3. Marker/watermark scalars live at the ROOT
  *    (single-object PUT/DELETE, atomic on any store), so they
  *    survive version flips — a content-preserving compaction keeps
  *    the replay watermark valid, unlike the swap mode where the
  *    whole-dir rename clears in-store markers and the next batch
  *    pays a one-off anti-join fallback. Both behaviors are correct;
  *    pointer mode just skips the fallback.
  *
  * What pointer mode does NOT cover: the per-object writes INSIDE a
  * version dir still go through Spark's FileOutputCommitter, whose
  * task-file renames on S3A want the S3A committers (magic/staging) —
  * a Spark deployment setting, orthogonal to this layer's crash
  * protocol (every window here is closed by _SUCCESS-gated
  * completeness probes plus the watermark/marker replay guards, none
  * of which assume a rename is atomic).
  */
sealed trait StoreCommit {

  /** Close every crash window of this protocol at `root`. */
  def recover(root: String): Unit

  /** The committed live directory for READS and existence probes.
    * Swap mode: the root itself. Pointer mode: the resolved committed
    * version, or a never-existing placeholder when nothing is
    * committed yet (so `parquetFileCount`/`markerExists` probes read
    * empty/absent, the unseeded answer). */
  def readDir(root: String): String

  /** The live directory APPENDS write into. Pointer mode commits an
    * empty first version when none exists, so the append target is
    * always a committed dir readers can resolve. */
  def writeDir(root: String): String

  /** Replace the whole store content atomically: `body` fully writes
    * the replacement into the staging path it is given; the commit
    * point is the swap/pointer-flip after it returns. */
  def replace(root: String)(body: String => Unit): Unit
}

/** [[ArtifactSwap]] rename-aside commits — atomic-rename filesystems
  * only (local/posix/HDFS); the store root is the live dir. */
case object SwapCommit extends StoreCommit {
  def recover(root: String): Unit = ArtifactSwap.recover(root)
  def readDir(root: String): String = root
  def writeDir(root: String): String = root
  def replace(root: String)(body: String => Unit): Unit =
    ArtifactSwap.writeAndSwap(root)(body)
}

/** [[PointerSwap]] versioned-dir commits — object-store-safe (the
  * commit point is one small-object pointer replace). */
case object PointerCommit extends StoreCommit {
  def recover(root: String): Unit = PointerSwap.recover(root)
  def readDir(root: String): String =
    // v_00000000 can never exist (versions start at 1): a stable
    // absent path, so every existence probe reads the unseeded answer
    PointerSwap.resolve(root).getOrElse(s"$root/v_00000000")
  def writeDir(root: String): String =
    PointerSwap.resolve(root).getOrElse {
      PointerSwap.writeAndCommit(root)(_ => ())
      PointerSwap.resolve(root).getOrElse(
        sys.error(s"PointerCommit: empty seed commit failed at $root"))
    }
  def replace(root: String)(body: String => Unit): Unit =
    PointerSwap.writeAndCommit(root)(body)
}
