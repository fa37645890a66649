package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.ops.ColumnOps._

/** Analytic window functions over the daily revenue series — the
  * trend surface a dashboard adds on top of plain rollups (the
  * reference reaches these shapes with pandas post-processing; here
  * they are single-pass window plans).
  *
  * Exactness: window sums go through DECIMAL like every aggregate
  * (a moving average of doubles would depend on accumulation order);
  * counts and ranks are integer-exact by construction.
  *
  * Scale: all three run over the *daily aggregate* (one row per day),
  * so the window stage is tiny regardless of fact size; the heavy
  * lifting stays in the partial+final hash aggregation beneath it.
  * The unpartitioned window is deliberate — ~2400 distinct days fit
  * one partition; a per-key series would partition the window by key.
  */
object WindowAnalytics {

  private def dailyRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"))
      .agg(sumMoney(col("o_totalprice")).as("daily_revenue"))

  /** 7-day moving average + cumulative revenue over the daily series. */
  def movingAverage(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Window.orderBy(col("order_day"))
    val ma = byDay.rowsBetween(-6, Window.currentRow)
    val cum = byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def decSum(w: org.apache.spark.sql.expressions.WindowSpec) =
      sum(col("daily_revenue").cast(DecimalType(18, 6))).over(w).cast("double")
    dailyRevenue(spark, dir)
      .select(col("order_day"), col("daily_revenue"),
        (decSum(ma) / count(lit(1)).over(ma)).as("ma7"),
        decSum(cum).as("cumulative_revenue"))
      .orderBy(col("order_day"))
  }

  /** Rank + revenue share of each month within its year (the
    * "best month per year" dashboard widget). */
  def monthRankInYear(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"))
      .agg(sumMoney(col("o_totalprice")).as("revenue"))
    val inYear = Window.partitionBy(col("order_year"))
    monthly.select(col("order_year"), col("order_month"), col("revenue"),
        rank().over(inYear.orderBy(col("revenue").desc, col("order_month")))
          .as("rank_in_year"),
        (col("revenue") / sum(col("revenue").cast(DecimalType(18, 6)))
          .over(inYear).cast("double")).as("share_of_year"))
      .orderBy(col("order_year"), col("order_month"))
  }

  /** lead/lag month-over-month deltas on the monthly series. */
  def monthOverMonth(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(sumMoney(col("o_totalprice")).as("revenue"))
    val byMonth = Window.orderBy(col("order_month"))
    monthly.select(col("order_month"), col("revenue"),
        lag(col("revenue"), 1).over(byMonth).as("prev_revenue"),
        (col("revenue") - lag(col("revenue"), 1).over(byMonth)).as("mom_delta"))
      .orderBy(col("order_month"))
  }

  /** Top-k per group: top-3 orders by price within each region.
    * `region` is a 5-value key, so a direct rank window would sort
    * every region's full order set in ONE task (the round-3-verdict
    * hot-spot shape) — instead this runs
    * [[graft.ops.SkewOps.topKPerGroup]]'s salted two-phase rank:
    * stage 1 ranks within (region, hash-salt) in parallel, stage 2
    * ranks the ≤ 5·salts·3 survivors exactly. Identical rows to the
    * direct window (the DuckDB oracle runs the direct formulation,
    * cross-checking the decomposition), stage-2 sort bounded by
    * construction. */
  def top3OrdersPerRegion(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("r_name").as("region"), col("o_orderkey"),
        col("o_totalprice"))
    graft.ops.SkewOps.topKPerGroup(joined, col("region"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3,
        spreadBy = col("o_orderkey"))
      .orderBy(col("region"), col("rk"))
  }

  val oracle: Map[String, String] = Map(
    "window_moving_average" ->
      """WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_day, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS daily_revenue FROM orders GROUP BY 1) SELECT order_day, daily_revenue, CAST(SUM(CAST(daily_revenue AS DECIMAL(18,6))) OVER ma AS DOUBLE) / COUNT(*) OVER ma AS ma7, CAST(SUM(CAST(daily_revenue AS DECIMAL(18,6))) OVER cum AS DOUBLE) AS cumulative_revenue FROM d WINDOW ma AS (ORDER BY order_day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), cum AS (ORDER BY order_day ROWS UNBOUNDED PRECEDING) ORDER BY order_day""",
    "window_month_rank" ->
      """WITH m AS (SELECT year(o_orderdate) AS order_year, month(o_orderdate) AS order_month, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue FROM orders GROUP BY 1, 2) SELECT order_year, order_month, revenue, CAST(rank() OVER (PARTITION BY order_year ORDER BY revenue DESC, order_month) AS INTEGER) AS rank_in_year, revenue / CAST(SUM(CAST(revenue AS DECIMAL(18,6))) OVER (PARTITION BY order_year) AS DOUBLE) AS share_of_year FROM m ORDER BY order_year, order_month""",
    "window_month_over_month" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS order_month, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue FROM orders GROUP BY 1) SELECT order_month, revenue, lag(revenue) OVER w AS prev_revenue, revenue - lag(revenue) OVER w AS mom_delta FROM m WINDOW w AS (ORDER BY order_month) ORDER BY order_month""",
    "window_top3_per_region" ->
      """SELECT region, o_orderkey, o_totalprice, rk FROM (SELECT r_name AS region, o_orderkey, o_totalprice, CAST(row_number() OVER (PARTITION BY r_name ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey) WHERE rk <= 3 ORDER BY region, rk"""
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_moving_average" -> movingAverage _,
    "window_month_rank" -> monthRankInYear _,
    "window_month_over_month" -> monthOverMonth _,
    "window_top3_per_region" -> top3OrdersPerRegion _
  )
}
