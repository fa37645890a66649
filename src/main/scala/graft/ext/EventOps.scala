package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.ColumnOps._

/** Event-stream operators over the `events` table (ts, user_id,
  * event_type, value, props JSON). Batch forms here; the same
  * aggregations run incrementally under Structured Streaming in
  * `graft.streaming.EventStreams` (watermark + window), validated
  * against these batch results in tests — the classic
  * batch/streaming-parity design.
  */
object EventOps {

  /** JSON extraction (`props` → typed column) + per-type rollup. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        avgMoney(col("value")).as("avg_value"))
      .orderBy(col("event_type"))
  }

  /** Tumbling 1-hour window aggregate (batch form of the streaming
    * windowed agg; reference has no streaming — SURVEY.md §2.9
    * extension). */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("total_value"),
        countDistinct(col("user_id")).as("unique_users"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Sessionization-lite: per-user event counts and value totals with
    * first/last timestamps (the stateful-shape aggregation). */
  def userActivity(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sumMoney(col("value")).as("total_value"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        countDistinct(col("event_type")).as("distinct_types"))
      .orderBy(col("user_id"))
  }

  val oracle: Map[String, String] = Map(
    "events_json_extract" ->
      """SELECT event_type, COUNT(*) AS n, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS avg_value FROM events GROUP BY 1 ORDER BY 1""",
    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value, COUNT(DISTINCT user_id) AS unique_users FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_user_activity" ->
      """SELECT user_id, COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value, MIN(ts) AS first_ts, MAX(ts) AS last_ts, COUNT(DISTINCT event_type) AS distinct_types FROM events GROUP BY 1 ORDER BY 1"""
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_json_extract" -> jsonExtract _,
    "events_hourly" -> hourlyRollup _,
    "events_user_activity" -> userActivity _
  )
}
