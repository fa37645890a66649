package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Plan/DataFrame reuse for the dashboard serving path.
  *
  * The reference memoizes its dashboard load with `@st.cache_data`
  * (`/root/reference/dashboard/app.py:36`): every widget interaction
  * after the first reuses the loaded frame. The Spark analog has two
  * distinct levels, both provided here:
  *
  *  1. **Plan reuse** ([[of]]/[[apply]]): return the SAME `DataFrame`
  *     instance for the same (session, key). `QueryExecution` computes
  *     its analyzed/optimized/physical plans in lazy vals, so every
  *     `collect()` after the first skips Catalyst entirely — the
  *     OverheadProbe measured HALF of a sub-second query's wall as
  *     planning (q7: 0.12 s plan vs 0.12 s execute), so this alone
  *     roughly halves steady-state dashboard latency. Execution still
  *     re-reads the (OS-page-cached) parquet, so results stay fresh
  *     w.r.t. nothing — plans are immutable — but cost no re-planning.
  *  2. **Data pinning** ([[pinned]]): plan reuse + `persist()`, the
  *     full `@st.cache_data` equivalent — repeat reads serve from the
  *     block manager and skip execution too. Use for the filtered
  *     frame a user is slicing interactively; `invalidate` unpersists.
  *
  * Scope and bounds: each `SparkSession` owns its own LRU
  * (`MaxEntries` per session) held under a weak session key, so a
  * restarted session never sees another session's (dead) plans, a
  * stopped session's entries are swept on the next access instead of
  * lingering, and one session's filter churn cannot evict another
  * session's pins. Eviction unpersists non-blocking: a thread
  * mid-collect on an evicted frame completes rather than stalling.
  * The BENCH fresh tier deliberately does NOT use this layer — it
  * measures fresh-plan latency by design (the cold-cache case the
  * regression gate compares across rounds); since round 9 Bench ALSO
  * records a separate `serving` section (memo + pinned per headline
  * query, after the gated loop) so the steady-state claim is a
  * recorded artifact rather than probe prose.
  *
  * Reference: C6 dashboard surface, `/root/reference/dashboard/app.py:36`.
  */
object QueryMemo {

  /** PER-SESSION LRU capacity; 128 distinct (query, filters) combos
    * is far beyond a dashboard session's working set while bounding
    * driver heap. Capacity is per session, not global, so one
    * session's filter churn can never evict another session's pins. */
  val MaxEntries = 128

  private type Lru = java.util.LinkedHashMap[String, DataFrame]

  /** Session → its own LRU. NOTE the weak keys are inert here: each
    * cached DataFrame strongly references its own SparkSession, so a
    * map value keeps its key reachable (the value→key trap the
    * WeakHashMap javadoc warns about) and GC alone never clears an
    * entry. Dead-session cleanup is therefore the explicit
    * [[sweepStopped]] pass, run on EVERY public entry point
    * ([[apply]], [[invalidate]], [[size]]), not just on cache hits. */
  private val memo = new java.util.WeakHashMap[SparkSession, Lru]()

  /** Non-blocking: a dashboard thread mid-collect on an evicted frame
    * finishes against whatever blocks remain instead of stalling the
    * evictor; stragglers recompute at most their unread partitions. */
  private def drop(df: DataFrame): Unit =
    if (!df.sparkSession.sparkContext.isStopped)
      df.unpersist(blocking = false)

  private def sweepStopped(): Unit = {
    val it = memo.entrySet().iterator()
    // a stopped session's blocks died with its executors — just drop
    // the references (unpersist on a stopped context would throw)
    while (it.hasNext) if (it.next().getKey.sparkContext.isStopped) it.remove()
  }

  private def lruFor(spark: SparkSession): Lru = {
    val hit = memo.get(spark)
    if (hit != null) hit
    else {
      val lru = new Lru(32, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, DataFrame]): Boolean =
          if (this.size > MaxEntries) { drop(e.getValue); true } else false
      }
      memo.put(spark, lru)
      lru
    }
  }

  /** Memoize an arbitrary dashboard frame under a caller-chosen key
    * (e.g. the rendered filter state). The same key in the same
    * session returns the identical DataFrame instance — planned once. */
  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    memo.synchronized {
      sweepStopped()
      val lru = lruFor(spark)
      val hit = lru.get(key)
      if (hit != null) hit
      else { val df = build; lru.put(key, df); df }
    }

  /** Memoized registry query: the dashboard's named widgets. */
  def of(spark: SparkSession, name: String, sfDir: String): DataFrame =
    apply(spark, s"$name@$sfDir")(graft.SparkEntry.queries(name)(spark, sfDir))

  /** Memoized + persisted: repeat collects skip planning AND
    * execution (served from the block manager). MEMORY_AND_DISK so an
    * oversized interactive frame spills instead of evicting other
    * cached tables. */
  def pinned(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    apply(spark, key)(build.persist(StorageLevel.MEMORY_AND_DISK))

  /** Drop this session's entries (unpersisting any pinned data) —
    * call when the underlying lakehouse dir is rewritten. */
  def invalidate(spark: SparkSession): Unit = memo.synchronized {
    sweepStopped()
    val lru = memo.remove(spark)
    if (lru != null) lru.values().forEach(drop(_))
  }

  /** Entry count for this session (test/monitoring hook). */
  def size(spark: SparkSession): Int = memo.synchronized {
    sweepStopped()
    val lru = memo.get(spark)
    if (lru == null) 0 else lru.size()
  }
}
