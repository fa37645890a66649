package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.ColumnOps._

/** Wide↔long reshaping operators: pivot (long → wide, the dashboard
  * "matrix view" shape) and unpivot/melt (wide → long, the shape
  * feature pipelines want before per-measure aggregation).
  *
  * Scale notes: pivot is a single hash aggregation when the column
  * domain is supplied explicitly (no domain-discovery collect, no
  * extra shuffle vs a plain groupBy — each output column is one
  * conditional aggregate). Unpivot is Spark's native `unpivot`
  * (an Expand node: n_rows × n_measures emitted map-side, no shuffle
  * at all until the downstream agg).
  */
object Reshape {

  private val Years = 1992 to 1998

  /** Pivot: revenue matrix region × order-year. The year domain is
    * pinned (TPC-H order years) so the plan is collect-free and the
    * output schema is static — at 100 TB a dynamic pivot would need a
    * domain-discovery pass first. */
  def pivotRevenueByRegionYear(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("r_name").as("region"),
        year(col("o_orderdate")).as("order_year"), col("o_totalprice"))
      .groupBy(col("region"))
      .pivot("order_year", Years.map(Integer.valueOf))
      .agg(sumMoney(col("o_totalprice")))
      .toDF("region" +: Years.map(y => s"y$y"): _*)
      .orderBy(col("region"))
  }

  /** Unpivot/melt: lineitem measures to long form, then per-measure
    * profile (count / min / max / exact decimal sum). */
  def unpivotMeasureProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "measure",
        valueColumnName = "x")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), min(col("x")).as("min_val"),
        max(col("x")).as("max_val"), sumMoney(col("x")).as("total"))
      .orderBy(col("measure"))
  }

  private val pivotCols = Years.map(y =>
    s"CAST(SUM(CASE WHEN order_year = $y THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS y$y").mkString(", ")

  val oracle: Map[String, String] = Map(
    "reshape_pivot_region_year" ->
      s"""SELECT region, $pivotCols FROM (SELECT r_name AS region, year(o_orderdate) AS order_year, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey) GROUP BY region ORDER BY region""",
    "reshape_unpivot_profile" ->
      """WITH long AS (SELECT 'l_quantity' AS measure, l_quantity AS x FROM lineitem UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem UNION ALL SELECT 'l_discount', l_discount FROM lineitem UNION ALL SELECT 'l_tax', l_tax FROM lineitem) SELECT measure, COUNT(*) AS n, MIN(x) AS min_val, MAX(x) AS max_val, CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS total FROM long GROUP BY 1 ORDER BY 1"""
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "reshape_pivot_region_year" -> pivotRevenueByRegionYear _,
    "reshape_unpivot_profile" -> unpivotMeasureProfile _
  )
}
