package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator Spark lacks natively: for each
  * left row, attach the single right row with the greatest right
  * timestamp ≤ the left row's timestamp within the same key group
  * (the standard align-to-latest-observation join of time-series /
  * feature-store pipelines; DuckDB spells it `ASOF JOIN`).
  *
  * Implementation is the scalable merge formulation, composed from
  * built-ins per the preference order (compose > custom plan): tag
  * and union both sides, then ONE hash shuffle on the key and ONE
  * in-partition sort drive a running `last(ignoreNulls)` carry-forward
  * window; left-tagged rows read the carried right values. Cost is
  * O(n log n) per key group with a single exchange — no range
  * cross-product, no per-row subquery — exactly the plan shape that
  * survives a 1000-executor cluster. A naive theta-join formulation
  * would plan as BroadcastNestedLoop and explode at scale.
  *
  * Right rows sort before left rows at equal timestamps, so an exact
  * timestamp match is taken (≤ semantics, matching ASOF JOIN's
  * `l.ts >= r.ts`). If right timestamps can collide within a key,
  * append a unique tiebreaker to `rightTs` ordering upstream.
  */
object AsOfJoin {

  /** @param left     probe side; all its columns pass through
    * @param right    build side, pre-projected: `key`, `rightTs`, and
    *                 the value columns to carry (names must not
    *                 collide with `left`'s — rename upstream)
    * @param key      equi-join key column present on both sides
    * @param leftTs   left timestamp column name
    * @param rightTs  right timestamp column name */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val carried = right.columns.filterNot(_ == key).toSeq
    val overlap = carried.toSet intersect left.columns.toSet
    require(overlap.isEmpty, s"rename right columns colliding with left: $overlap")

    // The carried right columns travel as ONE struct so the matched
    // row is atomic: carrying columns independently with
    // last(ignoreNulls) would reach past a null field of the latest
    // matching row into an older row, fabricating a row that never
    // existed (ASOF semantics return the matched row's fields as-is,
    // nulls included).
    val lTagged = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_payload",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          right.schema.fields.filter(f => carried.contains(f.name)))))
    val rTagged = right
      .withColumn("_asof_ts", col(rightTs))
      .withColumn("_asof_side", lit(0))
      .withColumn("_asof_payload", struct(carried.map(col): _*))
      .drop(carried: _*)
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val carry = Window.partitionBy(col(key))
      .orderBy(col("_asof_ts"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned.withColumn("_asof_match",
      last(col("_asof_payload"), ignoreNulls = true).over(carry))
    carried.foldLeft(matched.filter(col("_asof_side") === 1)) { (df, c) =>
        df.withColumn(c, col(s"_asof_match.$c"))
      }
      .drop("_asof_ts", "_asof_side", "_asof_payload", "_asof_match")
  }
}
