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

  test("every native kernel is SQL-callable and equals its column-API " +
      "form") {
    registerViews()
    graft.functions.GraftExtensions.register(spark)
    val rot = graft.ext.ScalarQuant.rotationMatrix(dim = 4, seed = 7L)
    val rotLit = rot.map(_.map(x => s"${x}d")
        .mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")
    val row = spark.sql(
      s"""SELECT
         |  cosine_similarity(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS cos,
         |  rolling_hash('abc') AS rh,
         |  vec_sub(array(3.0d, 5.0d), array(1.0d, 2.0d)) AS vs,
         |  sq8_bytes_dist(X'0105', array(1, 9)) AS bd,
         |  mat_vec(array(1.0d, 0.0d, 0.0d, 0.0d), $rotLit) AS mv
         |""".stripMargin).head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    // parity with the column-API construction of the same kernels
    import org.apache.spark.sql.functions._
    val api = spark.range(1).select(
      graft.functions.RollingHash(lit("abc")).as("rh"),
      graft.functions.VecSub(
        array(lit(3.0), lit(5.0)), array(lit(1.0), lit(2.0))).as("vs"),
      graft.functions.Sq8.bytesDist(
        lit(Array[Byte](1, 5)), Seq(1, 9)).as("bd"),
      graft.functions.MatVec(
        array(lit(1.0), lit(0.0), lit(0.0), lit(0.0)), rot).as("mv")
    ).head()
    assert(row.getLong(1) == api.getLong(0))
    assert(row.getSeq[Double](2) == api.getSeq[Double](1))
    assert(row.getLong(3) == api.getLong(2))
    assert(row.getSeq[Double](4) == api.getSeq[Double](3))
    // the known expected values, independently: (5-1)^2 + 0 = 16 for
    // codes X'0105' vs query [1, 9] -> (1-1)^2 + (5-9)^2
    assert(row.getLong(3) == 16L)
    assert(row.getSeq[Double](2) == Seq(2.0, 3.0))
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
