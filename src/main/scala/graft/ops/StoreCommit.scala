package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *  - [[ManifestCommit]]: pointer mode plus a committed FILE LIST
  *    ([[Manifest]]) per version — readers trust neither directory
  *    listings nor the FileOutputCommitter's task-file renames, which
  *    closes the one window pointer mode left open: per-object writes
  *    INSIDE a version dir go through Spark's job committer, whose
  *    task-file renames are non-atomic on S3-class stores, so a torn
  *    job commit can strand a partial set of renamed files that any
  *    listing-trusting reader would adopt. Manifest readers read
  *    exactly the committed list; the committer's renames become a
  *    performance detail (tune with the S3A committers), never a
  *    correctness dependency.
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

  /** Run `body` as an APPEND into the committed live dir. Swap and
    * pointer modes: a plain write into [[writeDir]] (replay safety is
    * the sinks' watermark/marker protocol). Manifest mode overrides
    * this to extend the committed file list afterwards — the append's
    * commit point. */
  def append(root: String)(body: String => Unit): Unit =
    body(writeDir(root))

  /** Read the committed store content. Swap and pointer modes read
    * the live directory (trusting its listing); manifest mode reads
    * exactly the committed file list, so objects stranded by a torn
    * job commit are invisible. `basePath` is pinned to the live dir
    * either way, preserving partition-column discovery and pruning. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val live = readDir(root)
    spark.read.option("basePath", live).parquet(live)
  }

  /** Number of committed data objects under root — the seeded-store
    * probe ([[StoreFiles.parquetFileCount]] in listing modes, the
    * manifest length in manifest mode). */
  def fileCount(root: String): Int =
    StoreFiles.parquetFileCount(readDir(root))

  /** Read one SUBCOMPONENT of the committed version — the shape of
    * the multi-component artifact stores (the dedup index's
    * `fingerprints`/`bands`/`shingles`/`tombstones`, the OPQ store's
    * `rotation`/`codebooks`/`codes`). Listing modes read the
    * subdirectory; manifest mode reads exactly the committed list's
    * `sub/` entries, so objects a torn job commit strands inside the
    * component are invisible. `basePath` pins to the component dir
    * either way, preserving partition-column discovery (`band_idx=`,
    * `cell=`) and pruning. */
  def readSub(spark: SparkSession, root: String, sub: String): DataFrame = {
    val d = s"${readDir(root)}/$sub"
    spark.read.option("basePath", d).parquet(d)
  }

  /** Committed data-object count under one subcomponent — the
    * seeded/fragmentation probe for multi-component stores (the
    * per-component face of [[fileCount]]). */
  def subFileCount(root: String, sub: String): Int =
    StoreFiles.parquetFileCount(s"${readDir(root)}/$sub")

  /** Whether root-level state OUTSIDE the committed content (guard
    * markers, the permanent `_removed` id log) survives a
    * [[replace]]. Swap mode replaces the root itself — callers that
    * keep root-adjacent state must carry it INSIDE the replace body
    * (atomically, into the staging dir). Pointer/manifest modes
    * replace only version dirs under the root, so root state
    * survives untouched and must NOT be duplicated by a carry. */
  def rootSurvivesReplace: Boolean
}

/** [[ArtifactSwap]] rename-aside commits — atomic-rename filesystems
  * only (local/posix/HDFS); the store root is the live dir. */
case object SwapCommit extends StoreCommit {
  def recover(root: String): Unit = ArtifactSwap.recover(root)
  def readDir(root: String): String = root
  def writeDir(root: String): String = root
  def replace(root: String)(body: String => Unit): Unit =
    ArtifactSwap.writeAndSwap(root)(body)
  def rootSurvivesReplace: Boolean = false
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
  def rootSurvivesReplace: Boolean = true
}

/** [[PointerSwap]] versioned dirs PLUS a committed file list
  * ([[Manifest]]) per version — the rename-free end of the protocol
  * (round-16 verdict #2): the pointer flip commits the VERSION, the
  * manifest commits its FILE SET, and manifest readers trust neither
  * directory listings nor the FileOutputCommitter's task-file renames
  * — an object a torn job commit strands in the version dir is
  * simply never read. Appends extend the manifest by the writer's own
  * before/after listing delta (single-writer, so the delta is exactly
  * the append's objects; pre-existing junk can never be adopted), and
  * the manifest replace — one small-object PUT — is the append's
  * commit point: a crash before it leaves the new objects invisible
  * and the sink's replay guard re-runs the batch. */
case object ManifestCommit extends StoreCommit {
  def recover(root: String): Unit = PointerSwap.recover(root)
  def rootSurvivesReplace: Boolean = true
  def readDir(root: String): String = PointerCommit.readDir(root)
  def writeDir(root: String): String =
    PointerSwap.resolve(root).getOrElse {
      // seed an empty first version WITH its (empty) manifest, so
      // manifest readers of a just-seeded store see a committed list
      replace(root)(_ => ())
      PointerSwap.resolve(root).getOrElse(
        sys.error(s"ManifestCommit: empty seed commit failed at $root"))
    }
  def replace(root: String)(body: String => Unit): Unit =
    PointerSwap.writeAndCommit(root) { next =>
      body(next)
      // the writer's own post-write listing is authoritative: every
      // rename the job will do has happened by the time the write
      // call returns, and nothing else writes here (single-writer)
      Manifest.stamp(next)
    }
  override def append(root: String)(body: String => Unit): Unit = {
    val live = writeDir(root)
    val before = Manifest.dataFiles(live)
    body(live)
    val added = Manifest.dataFiles(live).filterNot(before.toSet)
    // a MISSING manifest (the torn single-file-replace window, or an
    // adopted pre-manifest store) must fall back to the BEFORE
    // listing — the same pointer-mode semantics the read path uses.
    // Falling back to empty would commit a manifest naming only this
    // append's objects and silently hide the whole store.
    val committed = Manifest.read(live).getOrElse(before)
    Manifest.write(live, (committed ++ added).distinct)
  }
  override def read(spark: SparkSession, root: String): DataFrame = {
    val live = readDir(root)
    Manifest.read(live) match {
      case Some(files) if files.nonEmpty =>
        spark.read.option("basePath", live)
          .parquet(files.map(f => s"$live/$f"): _*)
      case _ =>
        // no/empty manifest: fall back to the listing — pointer-mode
        // behavior, covered by the sinks' committed-log guards (and
        // the empty case only arises on a just-seeded store, which
        // callers gate on fileCount > 0 before reading)
        spark.read.option("basePath", live).parquet(live)
    }
  }
  override def fileCount(root: String): Int = {
    val live = readDir(root)
    Manifest.read(live).map(_.size)
      .getOrElse(StoreFiles.parquetFileCount(live))
  }
  override def readSub(spark: SparkSession, root: String,
      sub: String): DataFrame = {
    val live = readDir(root)
    Manifest.read(live) match {
      case Some(files) =>
        val hits = files.filter(_.startsWith(s"$sub/"))
        if (hits.isEmpty)
          // empty component of a committed store — same contract as a
          // listing mode reading an empty dir (callers gate on
          // subFileCount first, exactly as they gate on fileCount)
          spark.read.option("basePath", s"$live/$sub")
            .parquet(s"$live/$sub")
        else spark.read.option("basePath", s"$live/$sub")
          .parquet(hits.map(f => s"$live/$f"): _*)
      case None => super.readSub(spark, root, sub)
    }
  }
  override def subFileCount(root: String, sub: String): Int = {
    val live = readDir(root)
    Manifest.read(live).map(_.count(_.startsWith(s"$sub/")))
      .getOrElse(StoreFiles.parquetFileCount(s"$live/$sub"))
  }
}
