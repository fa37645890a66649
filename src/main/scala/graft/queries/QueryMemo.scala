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
  * Scope and bounds: entries are keyed by the owning `SparkSession`
  * instance, so a restarted session never sees another session's
  * (dead) plans; the
  * map is a small synchronized LRU (`MaxEntries`) because dashboard
  * filter combinations are user-generated and unbounded. The BENCH
  * harness deliberately does NOT use this layer — it measures
  * fresh-plan latency by design (Bench.scala pins table data but
  * re-plans every query, the cold-cache serving case).
  *
  * Reference: C6 dashboard surface, `/root/reference/dashboard/app.py:36`.
  */
object QueryMemo {

  /** LRU capacity; 128 distinct (query, filters) combos is far beyond
    * a dashboard session's working set while bounding driver heap. */
  val MaxEntries = 128

  private val memo =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        if (this.size > MaxEntries) { e.getValue.unpersist(); true } else false
    }

  /** Memoize an arbitrary dashboard frame under a caller-chosen key
    * (e.g. the rendered filter state). The same key in the same
    * session returns the identical DataFrame instance — planned once. */
  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    memo.synchronized {
      val k = (spark, key)
      val hit = memo.get(k)
      if (hit != null) hit
      else { val df = build; memo.put(k, df); df }
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
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) { e.getValue.unpersist(); it.remove() }
    }
  }

  /** Entry count for this session (test/monitoring hook). */
  def size(spark: SparkSession): Int = memo.synchronized {
    var n = 0
    memo.keySet().forEach(k => if (k._1 eq spark) n += 1)
    n
  }
}
