package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.Dashboard
import graft.queries.Dashboard.Filters

class DashboardSpec extends SparkSpec {

  test("no active filters reproduces the unfiltered KPI block") {
    val df = Dashboard.filteredOrders(spark, sf, Filters())
    val viaApi = Dashboard.kpis(df).head
    val direct = graft.queries.Analytics.dashKpis(spark, sf).head
    assert(viaApi.getDouble(0) == direct.getDouble(0))
    assert(viaApi.getLong(1) == direct.getLong(1))
  }

  test("filters compose conjunctively and widgets agree with each other") {
    val f = Filters(
      dateFrom = Some(Timestamp.valueOf("1994-01-01 00:00:00")),
      dateTo = Some(Timestamp.valueOf("1996-12-31 23:59:59")),
      regions = Seq("ASIA", "EUROPE"),
      priorities = Seq("1-URGENT", "2-HIGH"))
    val df = Dashboard.filteredOrders(spark, sf, f).cache()
    try {
      val total = df.count()
      assert(total > 0)
      // widget totals must reconcile with the filtered frame
      assert(Dashboard.kpis(df).head.getLong(1) == total)
      assert(Dashboard.channelRollup(df)
        .agg(sum(col("order_count"))).head.getLong(0) == total)
      assert(Dashboard.regionRollup(df)
        .agg(sum(col("order_count"))).head.getLong(0) == total)
      assert(Dashboard.histogram(df)
        .agg(sum(col("n"))).head.getLong(0) == total)
      // filters actually applied
      val regions = Dashboard.regionRollup(df)
        .select("region").collect().map(_.getString(0)).toSet
      assert(regions.subsetOf(Set("ASIA", "EUROPE")))
      val years = df.select(year(col("o_orderdate"))).distinct()
        .collect().map(_.getInt(0))
      assert(years.forall(y => y >= 1994 && y <= 1996))
      assert(Dashboard.sample(df, 10).count() <= 10)
    } finally { df.unpersist(); () }
  }

  test("QueryMemo reuses one plan per key and invalidates per session") {
    import graft.queries.QueryMemo
    QueryMemo.invalidate(spark)
    val a = QueryMemo.of(spark, "dash_kpis", sf)
    val b = QueryMemo.of(spark, "dash_kpis", sf)
    assert(a eq b, "same key must return the identical DataFrame instance")
    val other = QueryMemo.of(spark, "dash_channel_rollup", sf)
    assert(!(a eq other))
    assert(QueryMemo.size(spark) == 2)
    // memoized results match a fresh build
    val fresh = SparkEntry.queries("dash_kpis")(spark, sf).collect()
    assert(a.collect().sameElements(fresh))
    QueryMemo.invalidate(spark)
    assert(QueryMemo.size(spark) == 0)
    val c = QueryMemo.of(spark, "dash_kpis", sf)
    assert(!(a eq c), "invalidate must drop the old plan")
    QueryMemo.invalidate(spark)
  }

  test("QueryMemo LRU stays bounded and evicted entries are rebuilt") {
    import graft.queries.QueryMemo
    QueryMemo.invalidate(spark)
    val first = QueryMemo(spark, "evict-0")(spark.range(1).toDF())
    (1 to QueryMemo.MaxEntries).foreach(i =>
      QueryMemo(spark, s"evict-$i")(spark.range(1).toDF()))
    assert(QueryMemo.size(spark) == QueryMemo.MaxEntries,
      "map must cap at MaxEntries")
    val again = QueryMemo(spark, "evict-0")(spark.range(1).toDF())
    assert(!(again eq first), "the evicted eldest entry must rebuild")
    QueryMemo.invalidate(spark)
  }

  test("widgets agree between fresh and cached filtered frames") {
    import graft.queries.QueryMemo
    val f = Filters(regions = Seq("AFRICA"), statuses = Seq("O"))
    val cached = Dashboard.filteredOrdersCached(spark, sf, f)
    try {
      assert(cached eq Dashboard.filteredOrdersCached(spark, sf, f))
      assert(cached.storageLevel.useMemory)
      val fresh = Dashboard.filteredOrders(spark, sf, f)
      assert(Dashboard.kpis(cached).head == Dashboard.kpis(fresh).head)
    } finally QueryMemo.invalidate(spark)
  }

  test("QueryMemo.pinned persists the frame and invalidate unpersists it") {
    import graft.queries.QueryMemo
    val key = "dashboard-spec-pinned"
    val df = QueryMemo.pinned(spark, key)(
      Dashboard.filteredOrders(spark, sf, Filters(regions = Seq("ASIA"))))
    assert(df.storageLevel.useMemory, "pinned frame must be persisted")
    assert(df.count() > 0)
    assert(QueryMemo.pinned(spark, key)(fail("must not rebuild")) eq df)
    QueryMemo.invalidate(spark)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "invalidate must unpersist pinned frames")
  }
}
