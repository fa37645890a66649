package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure time-range join (no equi key) via bucketing — the standard
  * rewrite that turns what Spark would otherwise plan as a
  * BroadcastNestedLoopJoin (O(n·m) compares, driver-broadcast of a
  * whole side) into a plain shuffle equi-join.
  *
  * Each left row's window `[ts - before, ts]` is exploded into the
  * fixed-width time buckets it overlaps; each right row lands in
  * exactly ONE bucket, so a candidate (left, right) pair appears at
  * most once — no post-join dedup. The bucket equi-join shuffles both
  * sides by bucket id (time-locality partitioning), then the exact
  * range predicate filters candidates. Blow-up factor is bounded by
  * `window/bucketWidth + 1` ≈ 2 when the bucket width matches the
  * window — constant-factor work, arbitrarily scalable.
  *
  * When an equi key exists alongside the range (e.g. same user), just
  * equi-join on the key and filter the range — Catalyst already does
  * the right thing; this operator is for the keyless case.
  */
object RangeJoin {

  /** Epoch-microsecond bucket id of an (NTZ, UTC-session) timestamp. */
  private def bucketOf(ts: Column, widthSec: Long): Column =
    floor(unix_micros(ts.cast("timestamp")) / (widthSec * 1000000L))

  /** Pairs every left row with right rows whose `rightTs` lies in
    * `[leftTs - beforeSec, leftTs]`. Sides must be pre-projected with
    * non-colliding column names. Bucket width defaults to the window
    * length (≤ 2 buckets per left row). */
  def pointsWithin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, beforeSec: Long): DataFrame = {
    val width = beforeSec
    val lo = col(leftTs) - expr(s"INTERVAL '$beforeSec' SECOND")
    val lBuckets = left.withColumn("_rj_bucket",
      explode(sequence(bucketOf(lo, width), bucketOf(col(leftTs), width))))
    val rBuckets = right.withColumn("_rj_bucket",
      bucketOf(col(rightTs), width))
    lBuckets.join(rBuckets, Seq("_rj_bucket"))
      .filter(col(rightTs) >= lo && col(rightTs) <= col(leftTs))
      .drop("_rj_bucket")
  }
}
