package graft.ops

/** In-session memo for deterministic, bounded TRAINING artifacts
  * (quantizer centroids, rotations — K·d doubles of metadata, never
  * data). One registry-wide gate sweep re-trains the same frozen
  * quantizer for every query in a family — coarse k-means alone is
  * re-trained by ~50 registered queries — and every training is a
  * deterministic pure function of its source files (min-vec_id init,
  * fixed rounds, integer-quantized means: KMeans scaladoc), so the
  * recomputation is pure waste. This extends the per-corpus-dir memo
  * the OPQ rotation already uses (ProductQuant.learnedRotations) into
  * a shared seam, with the staleness guard GoldLayout's bucketed
  * layouts use: keys carry a SOURCE-FILE fingerprint
  * (name:length:mtime per file), so a rewritten corpus — a test
  * re-seeding a temp dir, a new scale factor — can never serve stale
  * centroids.
  *
  * Scope guard: this memoizes TRAINING PARAMETERS inside one JVM
  * session only — nothing is persisted, nothing is keyed on query
  * results, and a fresh process always recomputes from the parquet
  * inputs. The bench's headline queries touch none of these trainers,
  * so the gated fresh-plan timings are unaffected; the win is the
  * oracle/verify sweep and any long-lived serving session, where
  * "train once on a sample, serve everything" is exactly the
  * production contract the quantizer scaladocs promise. */
object TrainMemo {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Fingerprint of a table's source files (mirrors
    * GoldLayout.fingerprint): changes whenever the source parquet is
    * rewritten, so layouts for different dirs AND different source
    * versions never collide. */
  def sourceFingerprint(path: String): String = {
    val src = new java.io.File(path)
    val files =
      if (src.isDirectory)
        Option(src.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
      else Array(src)
    path + "|" + files.map(f =>
      s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
  }

  /** Memoized compute. Plain get-then-putIfAbsent (NOT
    * computeIfAbsent): trainers nest — a composed trainer memoized
    * here may call another memoized trainer inside its compute — and
    * ConcurrentHashMap.computeIfAbsent forbids reentrant updates. A
    * racing duplicate compute is harmless: every memoized training is
    * deterministic, so both racers produce the identical value. */
  def of[T <: AnyRef](key: String)(compute: => T): T = {
    val hit = memo.get(key)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val v = compute
      val prev = memo.putIfAbsent(key, v)
      (if (prev != null) prev else v).asInstanceOf[T]
    }
  }
}
