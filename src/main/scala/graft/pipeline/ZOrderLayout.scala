package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.OracleForms

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * for file skipping, [[GoldLayout]]'s sibling for the OTHER gold
  * read regime: point/range lookups on TWO independent keys. A
  * single-key sort clusters min/max file statistics for that key
  * only; a query on the second key reads every file. Interleaving
  * the bits of both keys' grid coordinates gives a total order whose
  * prefixes are rectangles in key space, so EVERY file bounds BOTH
  * keys — the Delta/Hudi `OPTIMIZE ZORDER` idea, over plain parquet
  * min/max row-group stats.
  *
  * Scale shape — deliberately nothing rank-based: grid coordinates
  * are VALUE-quantized against the exact global min/max (one
  * map-side-combinable aggregate pulling 4 scalars to the driver;
  * an exact-rank ntile would be a single-partition global window,
  * the one plan shape this engine bans at 100 TB). The file group is
  * the z-value's PREFIX (top [[GroupBits]] bits) — group assignment
  * is per-row arithmetic, so the layout write is
  * `repartitionByRange(z).sortWithinPartitions(z)`: one range
  * exchange, perfectly parallel, and group populations stay near-even
  * exactly when the keys are near-uniform (TPC-H-ish keys are; a
  * skewed dimension wants quantile boundaries instead — the
  * documented variant, at the cost of the order-statistic pass).
  * Everything is int64 arithmetic — engine-exact, no tolerance.
  *
  * The gate compares the z-order grouping against the single-key
  * `linear` grouping under one shared chain: per file group, row
  * count and min/max of BOTH keys. The z-order rows bound both
  * dimensions tightly (each group spans ¼ of each key's range at
  * [[GroupBits]] = 4); the linear rows bound only the sort key — the
  * second key's min/max spans the whole domain in every group, the
  * no-skipping pathology made visible as data. ZOrderSpec quantifies
  * it end-to-end: files actually written by [[zorderWrite]] prune a
  * second-key box query that the linear layout cannot.
  *
  * Reference scope: the reference's lakehouse tier is a flat csv →
  * MySQL load (/root/reference/etl_pipeline/load.py); layout for
  * selective reads is extension depth for the 100 TB story.
  */
object ZOrderLayout {

  /** Grid resolution per dimension (2^Bits buckets). */
  val Bits = 4

  /** File-group count = 2^GroupBits (z-value prefix). */
  val GroupBits = 4

  /** Bit-interleave two [[Bits]]-bit grid coordinates: x in the even
    * z bits, y in the odd. */
  def interleave(xb: Column, yb: Column): Column =
    (0 until Bits).map { i =>
      (shiftleft(shiftright(xb, i).bitwiseAND(1), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yb, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Value-quantized grid coordinate: (v - lo) * 2^Bits div span, in
    * [0, 2^Bits) for v in [lo, hi]. floor-of-double-division equals
    * exact integer division while (v − lo)·2^Bits < 2^53 and the
    * quotient is small (both hold for any realistic key domain; the
    * scaled numerator would need a ~2^49 key span to break it). */
  def gridCoord(v: Column, lo: Long, hi: Long): Column =
    floor(((v - lit(lo)) * lit(1L << Bits)).cast("double") /
      lit((hi - lo + 1).toDouble)).cast("long")

  /** Exact min/max of both keys — the 4 driver scalars the layout is
    * parameterized by (combinable aggregate, bounded metadata). */
  private def bounds(df: DataFrame, x: String, y: String): (Long, Long, Long, Long) = {
    val r = df.agg(min(col(x)), max(col(x)), min(col(y)), max(col(y))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Source frame with grid coords, z-value, and both group ids. */
  def zFrame(df: DataFrame, x: String, y: String): DataFrame = {
    val (xlo, xhi, ylo, yhi) = bounds(df, x, y)
    val xb = gridCoord(col(x), xlo, xhi)
    val yb = gridCoord(col(y), ylo, yhi)
    val z = interleave(xb, yb)
    df.withColumn("zval", z)
      .withColumn("zgrp", shiftright(col("zval"), 2 * Bits - GroupBits))
      .withColumn("lingrp", shiftright(xb, Bits - GroupBits))
  }

  /** Write `df` z-ordered on `(x, y)` into ~2^GroupBits files: one
    * range exchange on the z-value, rows sorted within each file so
    * parquet row-group stats are tight on BOTH keys. */
  def zorderWrite(df: DataFrame, x: String, y: String, dir: String): Unit =
    zFrame(df, x, y)
      .repartitionByRange(1 << GroupBits, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval", "zgrp", "lingrp")
      .write.mode("overwrite").parquet(dir)

  /** Per-group stats under a grouping column: the min/max envelope a
    * reader's file-skipping sees. */
  private def groupStats(zf: DataFrame, grp: String, x: String, y: String): DataFrame =
    zf.groupBy(col(grp).as("grp"))
      .agg(count(lit(1)).as("n"),
        min(col(x)).as("x_min"), max(col(x)).as("x_max"),
        min(col(y)).as("y_min"), max(col(y)).as("y_max"))

  /** DRIVER-GATED: z-order vs linear group envelopes on
    * lineitem(l_partkey, l_suppkey), one shared chain. */
  def zorderStats(spark: SparkSession, dir: String): DataFrame = {
    val zf = zFrame(Tables.lineitem(spark, dir), "l_partkey", "l_suppkey")
      .localCheckpoint() // one source pass feeds both groupings
    OracleForms.union(
        "zorder" -> groupStats(zf, "zgrp", "l_partkey", "l_suppkey"),
        "linear" -> groupStats(zf, "lingrp", "l_partkey", "l_suppkey"))
      .select(col("form"), col("grp"), col("n"),
        col("x_min"), col("x_max"), col("y_min"), col("y_max"))
      .orderBy(col("form"), col("grp"))
  }

  /** Exact integer quantile boundaries over the DISTINCT-VALUE
    * histogram — the skewed-key alternative to [[gridCoord]]'s value
    * widths. Boundary j (1-based) = the smallest value whose
    * cumulative count satisfies cum·parts ≥ j·N (all-integer — no
    * float rank anywhere). The histogram is map-side-combinable and
    * DOMAIN-bounded (distinct key values, not corpus rows); the
    * cumulative pass runs on the driver over that bounded frame, the
    * [[graft.ext.TextOps]] heapsFit discipline. Guarded loudly when
    * the domain itself is huge — `approxQuantile` boundaries are the
    * documented sketch path there (the layout tolerates approximate
    * boundaries; only the GATE needs exact ones). */
  def quantileBoundaries(df: DataFrame, c: Column, parts: Int,
      maxDomain: Long = 1L << 20): Seq[Long] = {
    val hist = df.groupBy(c.as("v")).agg(count(lit(1)).as("cnt"))
    val nv = hist.count()
    require(nv <= maxDomain,
      s"quantileBoundaries: $nv distinct values exceed the exact " +
        s"driver-side limit $maxDomain; use approxQuantile boundaries")
    val rows = hist.orderBy(col("v")).collect()
    val n = rows.map(_.getLong(1)).sum
    var cum = 0L
    val cums = rows.map { r => cum += r.getLong(1); (r.getLong(0), cum) }
    (1 until parts).map(j => cums.find(_._2 * parts >= j.toLong * n).get._1)
  }

  /** Grid coordinate under quantile boundaries: the count of
    * boundaries ≤ v (a literal fold — map-only, codegen-friendly). */
  def quantileCoord(v: Column, bounds: Seq[Long]): Column =
    bounds.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(v >= lit(b), lit(1L)).otherwise(lit(0L))
    }

  /** DRIVER-GATED: the skewed-key regime [[zorderStats]]'s scaladoc
    * promises. The x key is l_partkey SQUARED — uniform in count,
    * quadratic in value, so [[gridCoord]]'s equal value widths put
    * ~half the rows in the lowest buckets while the quantile
    * boundaries re-even them. Both forms share one source pass; the
    * group envelopes make the pathology DATA (value form: population
    * ratio ~4× at sf0.01; quantile form: ~1×). */
  def zorderSkewStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select((col("l_partkey") * col("l_partkey")).as("xs"),
        col("l_suppkey").as("ys"))
      .localCheckpoint() // bounds agg + histogram + both stats passes
    val r = li.agg(min(col("xs")), max(col("xs")),
      min(col("ys")), max(col("ys"))).head()
    val (xlo, xhi, ylo, yhi) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val bounds = quantileBoundaries(li, col("xs"), 1 << Bits)
    val yb = gridCoord(col("ys"), ylo, yhi)
    def statsOf(xb: Column): DataFrame = li
      .withColumn("grp",
        shiftright(interleave(xb, yb), 2 * Bits - GroupBits))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        min(col("xs")).as("x_min"), max(col("xs")).as("x_max"),
        min(col("ys")).as("y_min"), max(col("ys")).as("y_max"))
    OracleForms.union(
        "value" -> statsOf(gridCoord(col("xs"), xlo, xhi)),
        "quantile" -> statsOf(quantileCoord(col("xs"), bounds)))
      .select(col("form"), col("grp"), col("n"),
        col("x_min"), col("x_max"), col("y_min"), col("y_max"))
      .orderBy(col("form"), col("grp"))
  }

  // ---- maintained z-ordered store (the OPTIMIZE analog) ----------
  //
  // Layout: store/base (z-ordered parquet), store/delta/batch=<maxId>
  // (raw row appends), store/_id_watermark. Appends land in a
  // batch-stamped subdir whose NAME is a pure function of the fresh
  // row set (its max monotone id), so a replayed batch OVERWRITES its
  // own subdir instead of duplicating — exactly-once without a
  // marker/repair pair. Compaction rewrites base := zorder(base ∪
  // delta) and drops delta through ONE whole-store
  // [[graft.ops.ArtifactSwap]] swap (watermark inside), so a crash
  // anywhere in the rewrite resolves to either the old store or the
  // new one, never a mix.

  /** Number of delta subdirs that triggers compaction. */
  val CompactAfter = 4

  // FileSystem API, not java.io.File: the store may live on any
  // Hadoop scheme the swap layer admits (a local-File listing would
  // silently see no deltas there — compaction never firing and
  // readStore dropping delta rows)
  private def deltaDirs(store: String): Seq[String] =
    graft.ops.StoreFiles.partitionDirs(s"$store/delta", "batch=")

  /** Pending delta-subdir count — the compaction trigger's input. */
  def deltaCount(store: String): Int = deltaDirs(store).size

  /** All live rows of the store: z-ordered base ∪ raw deltas. */
  def readStore(spark: SparkSession, store: String): DataFrame = {
    val base = s"$store/base"
    val parts =
      (if (graft.ops.StoreFiles.parquetFileCount(base) > 0) Seq(base)
       else Seq.empty) ++ deltaDirs(store).filter(
        graft.ops.StoreFiles.parquetFileCount(_) > 0)
    require(parts.nonEmpty, s"empty z-order store at $store")
    parts.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  /** The replay watermark, re-derived from store contents when the
    * scalar is torn/missing (the monotone-id contract makes max
    * sufficient — one column read, never a distinct set). */
  def storeWatermark(spark: SparkSession, store: String,
      idCol: String): Option[Long] =
    graft.ops.StoreFiles.readIdWatermark(store).orElse {
      val base = s"$store/base"
      val any = (if (graft.ops.StoreFiles.parquetFileCount(base) > 0)
        Seq(base) else Seq.empty) ++ deltaDirs(store).filter(
        graft.ops.StoreFiles.parquetFileCount(_) > 0)
      if (any.isEmpty) None
      else Some(any.map(spark.read.parquet(_)
        .agg(max(col(idCol))).head().getLong(0)).max)
    }

  /** Append a batch: batch-stamped delta subdir (idempotent under
    * replay — same fresh set, same dir, mode overwrite), then the
    * watermark scalar. A crash between the two leaves a stale scalar
    * that [[storeWatermark]]'s re-derivation or the subdir overwrite
    * both absorb. */
  def appendDelta(rows: DataFrame, store: String, idCol: String,
      batchMax: Long): Unit = {
    rows.write.mode("overwrite")
      .parquet(s"$store/delta/batch=$batchMax")
    graft.ops.StoreFiles.writeIdWatermark(store, batchMax)
  }

  /** Compact base ∪ delta into a fresh z-ordered base through one
    * whole-store swap. O(store) by design — layout maintenance IS a
    * rewrite; the trigger bounds how often it is paid. */
  def compactStore(spark: SparkSession, store: String,
      x: String, y: String, idCol: String): Unit = {
    val wm = storeWatermark(spark, store, idCol)
    val all = readStore(spark, store).localCheckpoint()
    graft.ops.ArtifactSwap.writeAndSwap(store) { next =>
      zorderWrite(all, x, y, s"$next/base")
      wm.foreach(graft.ops.StoreFiles.writeIdWatermark(next, _))
      graft.ops.StoreFiles.createMarker(next, "_SUCCESS")
    }
  }

  /** Z-order group envelopes of an arbitrary row set — the
    * [[zorderStats]] zorder half as a composable op (the store gate
    * feeds it both the source and the maintained store). */
  def zorderGroupStats(rows: DataFrame, x: String, y: String): DataFrame =
    groupStats(zFrame(rows, x, y), "zgrp", x, y)

  /** DRIVER-GATED: the maintained store serves the same rows — and
    * therefore the same z-order group envelopes — as its source,
    * through the full batch lifecycle (two delta appends + one
    * compaction through the whole-store swap). One scratch store per
    * corpus dir, memoized (the shared-scratch discipline). */
  def zorderStoreForms(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val store = storeDirs.computeIfAbsent(dir, _ => {
      val s = graft.ops.Scratch.dir("graft_zstore_gate") + "/store"
      val maxKey = li.agg(max(col("l_orderkey"))).head().getLong(0)
      val cut = maxKey / 2
      appendDelta(li.filter(col("l_orderkey") <= cut), s,
        "l_orderkey", cut)
      appendDelta(li.filter(col("l_orderkey") > cut), s,
        "l_orderkey", maxKey)
      compactStore(spark, s, "l_partkey", "l_suppkey", "l_orderkey")
      s
    })
    OracleForms.union(
        "source" -> zorderGroupStats(li, "l_partkey", "l_suppkey"),
        "store" -> zorderGroupStats(readStore(spark, store),
          "l_partkey", "l_suppkey"))
      .select(col("form"), col("grp"), col("n"),
        col("x_min"), col("x_max"), col("y_min"), col("y_max"))
      .orderBy(col("form"), col("grp"))
  }
  private val storeDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def interleaveSql(xb: String, yb: String): String =
    (0 until Bits).map { i =>
      s"((($xb >> $i) & 1) << ${2 * i}) | ((($yb >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")

  private val statsSql: String = {
    val grid = (v: String, lo: String, hi: String) =>
      s"(($v - $lo) * ${1L << Bits}) // ($hi - $lo + 1)"
    s"""WITH b AS (SELECT MIN(l_partkey) AS xlo, MAX(l_partkey) AS xhi, MIN(l_suppkey) AS ylo, MAX(l_suppkey) AS yhi FROM lineitem),
zf AS (SELECT ${interleaveSql("xb", "yb")} AS zval, xb, yb, l_partkey, l_suppkey FROM (SELECT ${grid("l_partkey", "b.xlo", "b.xhi")} AS xb, ${grid("l_suppkey", "b.ylo", "b.yhi")} AS yb, l_partkey, l_suppkey FROM lineitem, b)),
st AS (SELECT 'zorder' AS form, zval >> ${2 * Bits - GroupBits} AS grp, COUNT(*) AS n, MIN(l_partkey) AS x_min, MAX(l_partkey) AS x_max, MIN(l_suppkey) AS y_min, MAX(l_suppkey) AS y_max FROM zf GROUP BY 1, 2
UNION ALL SELECT 'linear' AS form, xb >> ${Bits - GroupBits} AS grp, COUNT(*) AS n, MIN(l_partkey) AS x_min, MAX(l_partkey) AS x_max, MIN(l_suppkey) AS y_min, MAX(l_suppkey) AS y_max FROM zf GROUP BY 1, 2)
SELECT form, grp, n, x_min, x_max, y_min, y_max FROM st ORDER BY form, grp"""
  }

  private val skewStatsSql: String = {
    val inter = (xb: String, yb: String) => (0 until Bits).map { i =>
      s"(((($xb) >> $i) & 1) << ${2 * i}) | (((($yb) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")
    s"""WITH li2 AS (SELECT l_partkey * l_partkey AS xs, l_suppkey AS ys FROM lineitem),
b AS (SELECT MIN(xs) AS xlo, MAX(xs) AS xhi, MIN(ys) AS ylo, MAX(ys) AS yhi, COUNT(*) AS n FROM li2),
hist AS (SELECT xs AS v, COUNT(*) AS cnt FROM li2 GROUP BY xs),
cum AS (SELECT v, SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM hist),
bx AS (SELECT j, MIN(v) AS bv FROM cum CROSS JOIN range(1, ${1 << Bits}) t(j) WHERE cum * ${1 << Bits} >= j * (SELECT n FROM b) GROUP BY j),
co AS (SELECT xs, ys, ((xs - b.xlo) * ${1 << Bits}) // (b.xhi - b.xlo + 1) AS xbv, (SELECT COUNT(*) FROM bx WHERE bv <= xs) AS xbq, ((ys - b.ylo) * ${1 << Bits}) // (b.yhi - b.ylo + 1) AS yb FROM li2, b),
zf AS (SELECT 'value' AS form, (${inter("xbv", "yb")}) >> ${2 * Bits - GroupBits} AS grp, xs, ys FROM co
UNION ALL SELECT 'quantile' AS form, (${inter("xbq", "yb")}) >> ${2 * Bits - GroupBits} AS grp, xs, ys FROM co)
SELECT form, grp, COUNT(*) AS n, MIN(xs) AS x_min, MAX(xs) AS x_max, MIN(ys) AS y_min, MAX(ys) AS y_max FROM zf GROUP BY form, grp ORDER BY form, grp"""
  }

  // one shared chain for the store-forms gate: the zorder grouping
  // alone (store content == source, so BOTH tags replay one chain)
  private val zGroupSql: String = {
    val grid = (v: String, lo: String, hi: String) =>
      s"(($v - $lo) * ${1L << Bits}) // ($hi - $lo + 1)"
    s"""WITH b AS (SELECT MIN(l_partkey) AS xlo, MAX(l_partkey) AS xhi, MIN(l_suppkey) AS ylo, MAX(l_suppkey) AS yhi FROM lineitem),
zf AS (SELECT ${interleaveSql("xb", "yb")} AS zval, l_partkey, l_suppkey FROM (SELECT ${grid("l_partkey", "b.xlo", "b.xhi")} AS xb, ${grid("l_suppkey", "b.ylo", "b.yhi")} AS yb, l_partkey, l_suppkey FROM lineitem, b))
SELECT zval >> ${2 * Bits - GroupBits} AS grp, COUNT(*) AS n, MIN(l_partkey) AS x_min, MAX(l_partkey) AS x_max, MIN(l_suppkey) AS y_min, MAX(l_suppkey) AS y_max FROM zf GROUP BY 1"""
  }

  val oracle: Map[String, String] = Map(
    "layout_zorder_stats" -> statsSql,
    "layout_zorder_skew_stats" -> skewStatsSql,
    "layout_zorder_store_forms" ->
      (graft.ext.OracleForms.sql(zGroupSql, Seq("source", "store")) +
        " ORDER BY form, grp"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder_stats" -> (zorderStats _),
    "layout_zorder_skew_stats" -> (zorderSkewStats _),
    "layout_zorder_store_forms" -> (zorderStoreForms _))
}
