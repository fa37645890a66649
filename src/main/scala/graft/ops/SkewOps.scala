package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key aggregations and joins.
  *
  * AQE's skew-join handling covers sort-merge joins automatically;
  * these helpers cover the remaining case — a groupBy where one key
  * dominates — by salting: spread each key over `salts` sub-keys,
  * partially aggregate, then combine. Two shuffles, but each is
  * balanced; for an algebraic aggregate (sum/count/min/max) the
  * result is identical to the direct groupBy.
  */
object SkewOps {

  /** Exact top-k per group, salted two-phase — the scale-safe form of
    * `row_number().over(Window.partitionBy(grp).orderBy(ord)) <= k`
    * when `grp` is LOW-NDV (the round-3-verdict hot spot: a 5-value
    * key makes the rank window sort each group's entire row set in
    * one task). Stage 1 ranks within (grp, salt) — `salts` parallel
    * sub-sorts per group — and keeps each sub-group's top k; stage 2
    * ranks the ≤ groups·salts·k survivors exactly. A group's true
    * top-k rows are each top-k within their own sub-group, so the
    * result is IDENTICAL to the direct window (given a total order:
    * include a unique tiebreaker in `order`), but the stage-2 sort is
    * bounded by construction, not by data size. Choose `salts` ≈
    * rows-per-group / target-task-rows; the salt spreads by hash of a
    * unique column so placement never affects results. */
  def topKPerGroup(df: DataFrame, grp: Column, order: Seq[Column], k: Int,
      spreadBy: Column, salts: Int = 1024, rankCol: String = "rk"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("_salt", pmod(hash(spreadBy), lit(salts)))
    val w1 = Window.partitionBy(grp, col("_salt")).orderBy(order: _*)
    val survivors = salted.withColumn("_rn1", row_number().over(w1))
      .filter(col("_rn1") <= k).drop("_salt", "_rn1")
    val w2 = Window.partitionBy(grp).orderBy(order: _*)
    survivors.withColumn(rankCol, row_number().over(w2))
      .filter(col(rankCol) <= k)
  }

  /** Salted equivalent of
    * `df.groupBy(key).agg(sum(value), count(value))`.
    * The salt is a deterministic spread (hash of a unique column if
    * provided, else spark_partition_id) so results don't depend on
    * row placement. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      salts: Int, spreadBy: Option[Column] = None): DataFrame = {
    val salt = spreadBy
      .map(c => pmod(hash(c), lit(salts)))
      .getOrElse(pmod(spark_partition_id(), lit(salts)))
    df.select(key.as("k"), value.as("v"), salt.as("salt"))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v").cast(ColumnOps.Money)).as("ps"),
        count(col("v")).as("pc"))
      .groupBy(col("k"))
      .agg(sum(col("ps")).cast("double").as("total"),
        sum(col("pc")).as("n"))
  }
}
