package graft

import org.apache.spark.sql.functions._
import graft.pipeline.GoldLayout

/** Bucketed gold layout: the fact-fact join must be exchange-free
  * on the bucketed tables, and the layout must not change answers. */
class GoldLayoutSpec extends SparkSpec {

  test("q8 over the bucketed layout equals the direct q8") {
    val direct = graft.queries.Analytics.q8AvgShippingDays(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val bucketed = GoldLayout.q8Bucketed(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(direct.sameElements(bucketed))
  }

  test("bucketed fact-fact join plans with no exchange and no sort " +
      "on either fact side") {
    GoldLayout.ensureBucketed(spark, sf)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // disable broadcast + AQE so the join would otherwise be a
      // both-sides shuffle SMJ — the 100x regime ScaleUp measured
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = spark.table(GoldLayout.lineitemTable(sf))
        .join(spark.table(GoldLayout.ordersTable(sf)),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_shipdate"), col("o_orderdate"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed fact-fact join must be exchange-free:\n$plan")
      // sortBy at write time also removes the merge-join sort
      assert(!plan.contains("Sort "),
        s"bucketed+sorted layout must not re-sort:\n$plan")
      assert(j.count() ===
        Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("any fact-fact pair can opt in: lineitem x part co-bucketed on " +
      "the part key joins exchange-free") {
    val lt = GoldLayout.ensureBucketedTable(spark, sf, "lineitem", "l_partkey")
    val pt = GoldLayout.ensureBucketedTable(spark, sf, "part", "p_partkey")
    // a second layout of the same table on a different key coexists
    // with the order-key layout under its own catalog name
    assert(lt != GoldLayout.lineitemTable(sf))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = spark.table(lt)
        .join(spark.table(pt), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("p_type"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed pair must join exchange-free:\n$plan")
      assert(!plan.contains("Sort "),
        s"bucketed+sorted layout must not re-sort:\n$plan")
      assert(j.count() === Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
