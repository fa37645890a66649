package graft

import org.apache.spark.sql.functions._

/** SQL-surface parity: the engine's tables register as temp views and
  * reference-shaped `spark.sql` text produces the same results as the
  * DataFrame DSL plans (both go through the same Catalyst
  * analyze→optimize→execute path — SURVEY.md §3.1). */
class SqlSurfaceSpec extends SparkSpec {

  private def registerViews(): Unit = Tables.registerAllViews(spark, sf)

  test("spark.sql text query equals the DSL plan (q2 shape)") {
    registerViews()
    val sqlRes = spark.sql(
      """SELECT year(o_orderdate) AS order_year,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    val dslRes = graft.queries.Analytics.q2RevenuePerYear(spark, sf)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(sqlRes.sameElements(dslRes))
  }

  test("spark.sql star join equals the DSL plan (q6 shape)") {
    registerViews()
    val sqlRes = spark.sql(
      """SELECT r_name AS region, year(o_orderdate) AS order_year,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val dslRes = graft.queries.Analytics.q6RevenuePerRegionYear(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(sqlRes.sameElements(dslRes))
  }

  test("catalog DDL surface: database + describe (S10/S11)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_gold")
    assert(spark.sql("SHOW DATABASES").collect()
      .map(_.getString(0)).contains("graft_gold"))
    registerViews()
    val cols = spark.sql("DESCRIBE orders").collect().map(_.getString(0))
    assert(cols.contains("o_orderkey") && cols.contains("o_totalprice"))
  }
}
