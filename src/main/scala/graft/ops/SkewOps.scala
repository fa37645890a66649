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
