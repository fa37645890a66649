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

  test("stateful sessionization matches the batch per-user rollup") {
    val stream = EventStreams.eventsStream(spark, sf)
    val sess = EventStreams.sessionize(spark, stream)
    val q = EventStreams.runToMemory(sess, "sessions_out", "update")
    try {
      // update mode emits one row per user per trigger; last wins
      val streamed = spark.table("sessions_out")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events"))
        .orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val batch = graft.ext.EventOps.userActivity(spark, sf)
        .select(col("user_id"), col("n_events"))
        .orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(streamed.sameElements(batch))
    } finally q.stop()
  }

  test("checkpointed parquet sink persists windowed results durably") {
    val out = java.nio.file.Files.createTempDirectory("graft_stream_sink")
    val stream = EventStreams.eventsStream(spark, sf)
    // append mode requires the watermark to close windows; with a
    // bounded replay the final windows stay open, so sink the
    // raw enriched stream (stateless) — the durable-pipeline shape
    val q = stream
      .withColumn("hour", date_trunc("hour", col("ts")))
      .writeStream
      .format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/chk")
      .start()
    try {
      q.processAllAvailable()
      val written = spark.read.parquet(s"$out/data")
      assert(written.count() == Tables.events(spark, sf).count())
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/chk/offsets")))
    } finally q.stop()
  }

  test("checkpoint restart resumes exactly-once across new files") {
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory("graft_stream_restart")
    val srcDir = s"$base/src"; Files.createDirectories(Paths.get(srcDir))
    val all = Tables.events(spark, sf)

    def stageFile(filter: org.apache.spark.sql.Column, name: String): Long = {
      val tmp = Files.createTempDirectory("graft_batch")
      val part = all.filter(filter)
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(f.toPath, Paths.get(srcDir, name))
      part.count()
    }

    def runOnce(): Unit = {
      val q = spark.readStream.schema(all.schema).parquet(srcDir)
        .writeStream.format("parquet")
        .option("path", s"$base/data")
        .option("checkpointLocation", s"$base/chk")
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    val n1 = stageFile(col("event_id") % 2 === 0, "b1.parquet")
    runOnce()
    assert(spark.read.parquet(s"$base/data").count() == n1)

    // second file arrives while the query is down; the restart must
    // pick up ONLY the new file from the checkpointed offsets
    val n2 = stageFile(col("event_id") % 2 === 1, "b2.parquet")
    runOnce()
    val out = spark.read.parquet(s"$base/data")
    assert(out.count() == n1 + n2, "restart reprocessed or dropped rows")
    assert(out.select(countDistinct(col("event_id"))).head.getLong(0) == n1 + n2)
  }

  test("foreachBatch gold sink is idempotent on replayed keys") {
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory("graft_gold_sink")
    val srcDir = s"$base/src"; Files.createDirectories(Paths.get(srcDir))
    val all = Tables.events(spark, sf)

    def stageFile(filter: org.apache.spark.sql.Column, name: String): Long = {
      val tmp = Files.createTempDirectory("graft_gold_batch")
      val part = all.filter(filter)
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(f.toPath, Paths.get(srcDir, name))
      part.count()
    }

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(all.schema).parquet(srcDir)
      EventStreams.dedupAppendGold(stream, s"$base/gold", "event_id",
        s"$base/chk").stop()
    }

    val n1 = stageFile(col("event_id") % 3 === 0, "b1.parquet")
    runOnce()
    assert(spark.read.parquet(s"$base/gold").count() == n1)

    // the same keys arrive again in a new file: the anti-join backstop
    // must drop every row instead of appending duplicates
    stageFile(col("event_id") % 3 === 0, "b1_replay.parquet")
    runOnce()
    assert(spark.read.parquet(s"$base/gold").count() == n1)

    val n2 = stageFile(col("event_id") % 3 === 1, "b2.parquet")
    runOnce()
    val gold = spark.read.parquet(s"$base/gold")
    assert(gold.count() == n1 + n2)
    assert(gold.select(countDistinct(col("event_id"))).head.getLong(0) == n1 + n2)
  }

  test("stream-stream interval join matches the batch join") {
    val stream = EventStreams.eventsStream(spark, sf)
    val q = EventStreams.runToMemory(
      EventStreams.purchaseClickStreamJoin(stream), "ss_join_out", "append")
    try {
      val streamed = spark.table("ss_join_out").count()
      val e = Tables.events(spark, sf)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      val batch = p.join(c,
        col("p_user") === col("c_user")
          && col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES")
          && col("click_ts") <= col("purchase_ts")).count()
      assert(streamed === batch)
      assert(batch > 0)
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
