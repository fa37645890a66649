package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.ColumnOps._

/** Join and grouping shapes beyond the reference's own inventory
  * (SURVEY.md §2.3/§2.4 flags them as cheap, valuable Spark add-ons):
  * semi/anti joins and ROLLUP/CUBE grouping sets. These round out the
  * engine's join/agg surface so a reference user gets the standard
  * warehouse idioms the reference's MySQL could have expressed.
  */
object JoinsExtra {

  /** Left-semi: customers that have at least one order (EXISTS). */
  def semiJoinCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti: customers with no orders (NOT EXISTS). */
  def antiJoinCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** ROLLUP over (region, year): subtotal + grand-total rows. */
  def rollupRegionYear(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("r_name").as("region"),
        year(col("o_orderdate")).as("order_year"), col("o_totalprice"))
      .rollup(col("region"), col("order_year"))
      .agg(sumMoney(col("o_totalprice")).as("total_revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("region").asc_nulls_first, col("order_year").asc_nulls_first)
  }

  /** CUBE over (status, priority): all grouping-set combinations. */
  def cubeStatusPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("total_revenue"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** Approximate distinct (HLL) checked against the exact count. The
    * sketch estimate itself is engine-specific (DuckDB cannot
    * reproduce Spark's HLL++), so the query emits the *semantic
    * contract* instead of the raw estimate: the exact count plus a
    * within-tolerance flag (rsd 0.02 sketch, 10% acceptance bound —
    * comfortably wide; HLL is deterministic per dataset, so the flag
    * is stable). The oracle asserts the exact count and that the
    * sketch met its error bound. */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double")
          / col("exact_users") <= 0.1).as("approx_within_10pct"))
      .orderBy(col("event_type"))
  }

  /** EXCEPT: customers active in 1995 but gone in 1996 (churn set).
    * Plans as a left-anti hash join after aggregation — no sort-based
    * set machinery needed. */
  def exceptChurned(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def buyers(y: Int) = o.filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()
    buyers(1995).except(buyers(1996))
      .select(col("o_custkey").as("churned_custkey"))
      .orderBy(col("churned_custkey"))
  }

  /** INTERSECT: customers active in both 1995 and 1996 (retained set). */
  def intersectRetained(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def buyers(y: Int) = o.filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()
    buyers(1995).intersect(buyers(1996))
      .select(col("o_custkey").as("retained_custkey"))
      .orderBy(col("retained_custkey"))
  }

  val oracle: Map[String, String] = Map(
    "join_semi_customers" ->
      """SELECT c_custkey, c_mktsegment FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""",
    "join_anti_customers" ->
      """SELECT c_custkey, c_mktsegment FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""",
    "agg_rollup_region_year" ->
      """SELECT region, order_year, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue, COUNT(*) AS n FROM (SELECT r_name AS region, year(o_orderdate) AS order_year, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey) GROUP BY ROLLUP(region, order_year) ORDER BY region NULLS FIRST, order_year NULLS FIRST""",
    "agg_cube_status_priority" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    // the oracle asserts the HLL sketch's error contract (flag TRUE)
    // alongside the exact count it was measured against
    "agg_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, TRUE AS approx_within_10pct FROM events GROUP BY event_type ORDER BY event_type""",
    "set_except_churned" ->
      """SELECT o_custkey AS churned_custkey FROM (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995 EXCEPT SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996) ORDER BY 1""",
    "set_intersect_retained" ->
      """SELECT o_custkey AS retained_custkey FROM (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995 INTERSECT SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996) ORDER BY 1"""
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_semi_customers" -> semiJoinCustomers _,
    "join_anti_customers" -> antiJoinCustomers _,
    "agg_rollup_region_year" -> rollupRegionYear _,
    "agg_cube_status_priority" -> cubeStatusPriority _,
    "agg_approx_distinct" -> approxDistinctUsers _,
    "set_except_churned" -> exceptChurned _,
    "set_intersect_retained" -> intersectRetained _
  )
}
