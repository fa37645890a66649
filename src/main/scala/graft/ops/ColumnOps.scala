package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DecimalType}

/** Pure `Column` combinators — the engine's scalar-function layer.
  *
  * Re-expresses the reference's per-row transforms (cleaning,
  * derivation, bucketing — see SURVEY.md §2.8, reference
  * `etl_pipeline/transform.py:37-235`, `elt/transforms.ipynb:cell9-13`)
  * as Catalyst expressions. Everything here stays inside whole-stage
  * codegen: no UDFs, no closures, so the hot path is vectorizable and
  * pushdown-friendly at 100 TB.
  */
object ColumnOps {

  /** Decimal type used to make money aggregates order-independent.
    * Summing doubles is non-associative (parallel partial aggregation
    * changes the result in the low bits); summing decimals is exact,
    * so results are identical regardless of partitioning — a
    * correctness property that matters on a 1000-executor cluster,
    * not just for oracle matching.
    */
  val Money: DecimalType = DecimalType(18, 6)

  /** Exact, partition-order-independent sum of a double measure,
    * returned as double. Scale 6 recovers the true decimal value of
    * 2-decimal inputs and their pairwise products (4 decimals) without
    * ever rounding at a representable binary midpoint — so Spark
    * (HALF_UP) and any half-even engine agree exactly. */
  def sumMoney(c: Column): Column = sum(c.cast(Money)).cast("double")

  /** Deterministic average: exact decimal sum, then one double
    * division. avg(double) directly would be partial-agg-order
    * dependent. */
  def avgMoney(c: Column): Column =
    sum(c.cast(Money)).cast("double") / count(c)

  /** Like [[avgMoney]] but for small ratios (scale 9 keeps ~9
    * significant digits for values in [0, 1]). */
  def avgRatio(c: Column): Column =
    sum(c.cast(DecimalType(18, 9))).cast("double") / count(c)

  /** Column-name standardization (reference P2:
    * `etl_pipeline/transform.py:77-80`): trim, lower, spaces→underscores. */
  def normalizeName(name: String): String =
    name.trim.toLowerCase.replace(" ", "_")

  def standardizeColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeName).toIndexedSeq: _*)

  /** Fuzzy column resolution (reference P3: `dashboard/app.py:17-26`):
    * match case-insensitively ignoring spaces/underscores. */
  def resolveColumn(df: DataFrame, target: String): Option[String] = {
    def key(s: String) = s.toLowerCase.replace(" ", "").replace("_", "")
    df.columns.find(c => key(c) == key(target))
  }

  /** x / y with 0→null divisor guard (reference F9/F23:
    * `etl_pipeline/transform.py:215-228` replace(0, nan) then divide). */
  def safeDiv(num: Column, den: Column): Column =
    num / when(den === 0, lit(null)).otherwise(den)

  /** Null-on-failure numeric coercion (reference F22
    * `pd.to_numeric(errors="coerce")`). */
  def tryCastDouble(c: Column): Column = c.try_cast("double")

  def tryCast(c: Column, dt: DataType): Column = c.try_cast(dt.sql)

  /** Clip to [lo, hi] (reference F13 IQR capping,
    * `etl_pipeline/transform.py:37-58`). */
  def clip(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))

  /** Min-max normalization with constant-column guard (reference F14,
    * `etl_pipeline/transform.py:62-73`: max==min → 0.0). */
  def minMaxScale(c: Column, min: Double, max: Double): Column =
    if (max == min) lit(0.0) else (c - lit(min)) / lit(max - min)

  /** Margin bucket low/medium/high (reference F15,
    * `elt/transforms.ipynb:cell10`: <0.10 low, <=0.30 medium, else
    * high; null/zero-revenue → low). */
  def marginCategory(ratio: Column): Column =
    when(ratio.isNull || ratio < 0.10, "low")
      .when(ratio <= 0.30, "medium")
      .otherwise("high")

  /** Shipping-speed bucket (reference F16, `elt/transforms.ipynb:cell12`:
    * <=3 fast, <=7 normal, else slow). */
  def shippingSpeedCategory(days: Column): Column =
    when(days <= 3, "fast").when(days <= 7, "normal").otherwise("slow")

  /** Order-size bucket (reference F17, `elt/transforms.ipynb:cell13`:
    * <50 small, <=200 medium, else large). */
  def orderSizeCategory(units: Column): Column =
    when(units < 50, "small").when(units <= 200, "medium").otherwise("large")

  /** Outlier flag (reference F18, `elt/hold.ipynb:cell12`). */
  def outlierFlag(c: Column, upperBound: Double): Column =
    (c > lit(upperBound)).cast("int")

  /** COALESCE chain with literal default (reference F10/F19). */
  def fillDefault(c: Column, default: Any): Column = coalesce(c, lit(default))
}
