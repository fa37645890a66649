package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class EventStreamsSpec extends SparkSpec {

  test("streaming hourly window agg equals the batch rollup") {
    val stream = EventStreams.eventsStream(spark, sf)
    val q = EventStreams.runToMemory(EventStreams.hourlyWindowed(stream),
      "hourly_out")
    try {
      val fmt = "yyyy-MM-dd HH:mm:ss"
      val streamed = spark.table("hourly_out")
        .select(date_format(col("hour"), fmt).as("hour"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy("hour", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getDouble(3)))
      val batch = graft.ext.EventOps.hourlyRollup(spark, sf)
        .select(date_format(col("hour"), fmt).as("hour"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy("hour", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getDouble(3)))
      assert(streamed.nonEmpty)
      assert(streamed.sameElements(batch),
        "streaming and batch hourly rollups diverge")
    } finally q.stop()
  }

  test("sliding windows produce overlapping coverage") {
    val stream = EventStreams.eventsStream(spark, sf)
    val q = EventStreams.runToMemory(EventStreams.slidingCounts(stream),
      "sliding_out")
    try {
      val n = spark.table("sliding_out").count()
      val hours = spark.table("sliding_out")
        .select(countDistinct(col("window_start"))).head.getLong(0)
      assert(n > 0 && hours > 1)
    } finally q.stop()
  }
}
