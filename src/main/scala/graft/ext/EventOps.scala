package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.ColumnOps._
import graft.ops.{AsOfJoin, RangeJoin}

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

  /** As-of join: each purchase aligned to the user's latest preceding
    * (or same-instant) click — the feature-store "latest observation"
    * join, via the merge-style [[AsOfJoin]] operator (one shuffle on
    * user_id + one window; no range product). Oracle is DuckDB's
    * native ASOF JOIN, so the operator is checked against the
    * canonical semantics, not against its own algorithm. */
  def asOfPurchaseClick(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    AsOfJoin.backward(purchases, clicks, "user_id", "purchase_ts", "click_ts")
      .orderBy(col("purchase_id"))
  }

  /** Gap-based batch sessionization: a >30-minute silence starts a new
    * session (lag + running sum of break flags — one shuffle on
    * user_id, two window passes over the same sort). The batch twin of
    * the stateful streaming sessionizer in EventStreams. */
  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(byUser)
    val brk = when(prevTs.isNull
      || col("ts") - prevTs > expr("INTERVAL '30' MINUTE"), 1).otherwise(0)
    e.select(col("user_id"), col("ts"), col("event_id"), col("value"),
        brk.as("brk"))
      .withColumn("session_id", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sumMoney(col("value")).as("total_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Exact grouped quantiles as lower order statistics (rank
    * floor(q·(n-1)) within each group) — the grouped form of
    * StatsOps.orderStat: one shuffle on the group key, one sort, all
    * three quantiles from the same ranked pass.
    *
    * Scale guard: `event_type` is LOW-NDV (~5 values), so the rank
    * window sorts each type's full row set in one task — guarded by
    * [[graft.ops.StatsOps.requireGroupsSortable]] (loud failure past
    * MaxRankGroupRows); [[groupedQuantilesApprox]] is the sketch
    * variant that replaces it at scale (deterministic projection
    * registered as `events_quantile_bounds`; sketch columns
    * tolerance-asserted in OpsSpec). */
  def groupedQuantiles(spark: SparkSession, dir: String,
      maxGroupRows: Long = graft.ops.StatsOps.MaxRankGroupRows): DataFrame = {
    // quantiles are over NON-NULL values (StatsOps.orderStat
    // convention); without the filter, Spark ranks nulls first while
    // DuckDB ranks them last, shifting every rank if a null appears
    val e = Tables.events(spark, dir).filter(col("value").isNotNull)
    graft.ops.StatsOps.requireGroupsSortable(
      e.select(col("event_type")), col("event_type"), maxGroupRows)
    val ranked = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val grp = Window.partitionBy(col("event_type"))
    def q(p: Double) =
      max(when(col("rn") === floor(lit(p) * (col("n") - 1)), col("value")))
    e.select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(ranked) - 1)
      .withColumn("n", count(lit(1)).over(grp))
      .groupBy(col("event_type"))
      .agg(q(0.25).as("p25"), q(0.5).as("p50"), q(0.9).as("p90"))
      .orderBy(col("event_type"))
  }

  /** The 100 TB form of [[groupedQuantiles]]: `percentile_approx`
    * (mergeable sketch, partial aggregation — no per-group sort, so
    * a hot event_type never lands on one task). Sketch accuracy
    * 10000 → ≤0.01% rank error, so sketch output cannot hash-match
    * an independent engine; OpsSpec holds the tolerance-vs-exact
    * assertion, and the deterministic slice is oracle-checked as
    * `events_quantile_bounds`. */
  def groupedQuantilesApprox(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("value").isNotNull)
    e.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
        array(lit(0.25), lit(0.5), lit(0.9)), lit(10000)).as("qq"))
      .select(col("event_type"), col("qq").getItem(0).as("p25"),
        col("qq").getItem(1).as("p50"), col("qq").getItem(2).as("p90"))
      .orderBy(col("event_type"))
  }

  /** The deterministic slice of the grouped quantiles at unbounded
    * scale: group key, count, min, max — pure partial aggregation,
    * so it runs at any group size and hash-matches a DuckDB replay.
    * Oracle-checkable companion of [[groupedQuantilesApprox]] (a GK
    * sketch quantile can never hash-match an independent engine);
    * the sketch columns stay under OpsSpec's tolerance-vs-exact
    * assertion. */
  def groupedQuantileBounds(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("value").isNotNull)
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_val"),
        max(col("value")).as("max_val"))
      .orderBy(col("event_type"))
  }

  /** Keyless time-range join via [[RangeJoin]] bucketing: clicks from
    * ANY user within the 5 minutes before each error event (burst
    * correlation). Equi-join on time bucket instead of a nested-loop
    * range scan. */
  def rangeErrorClicks(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("error_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
    RangeJoin.pointsWithin(errors, clicks, "error_ts", "click_ts", 300L)
      .groupBy(col("error_id"))
      .agg(count(lit(1)).as("n_clicks_5min"))
      .orderBy(col("error_id"))
  }

  /** Schema-enforced JSON parse (`from_json` with a declared struct,
    * vs [[jsonExtract]]'s path extraction): malformed documents
    * become null rows rather than runtime errors, and the parsed
    * struct carries typed fields through the rest of the plan.
    * (The DuckDB oracle replays the extraction assuming well-formed
    * props — true of this corpus; the malformed-row tolerance itself
    * is Spark-side behavior, not part of the hash check.) */
  def jsonTyped(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("parsed"),
        sum(col("k").isNull.cast("long")).as("unparsed"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        countDistinct(col("k")).as("distinct_k"))
      .orderBy(col("event_type"))
  }

  /** Native session windows (`session_window`, gap 30 min) — the
    * built-in operator form of [[sessionizeBatch]]; the same grouping
    * runs incrementally under Structured Streaming with a watermark.
    * Session-window semantics start a new session at gap ≥ 30 min
    * (each event extends the window to ts+gap, exclusive end), which
    * the oracle's lag formulation mirrors with `>=`. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sumMoney(col("value")).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Temporal-split boundaries as fractions of the observed time
    * RANGE: train ≤ 70%, validation ≤ 85%, test after. Time-based
    * (not count-based) on purpose — count-based cutoffs are exact
    * order statistics (a global-sort shape the quantile operators
    * guard), while range-based cutoffs come from one min/max
    * aggregate and keep the split map-only at any scale. */
  val TemporalTrainPct = 70
  val TemporalValPct = 85

  /** Leakage-safe temporal train/validation/test split: models train
    * on the PAST and validate on the FUTURE, so the assignment must
    * cut on event time, never on a row hash (a hash split leaks
    * future information into training — the standard failure of
    * applying `split_train_test`'s content-hash discipline to
    * time-series). Cutoffs are integer microsecond arithmetic on the
    * corpus min/max, so both engines compute identical boundaries.
    *
    * Shape at scale: one min/max aggregate (partial, bounded), then a
    * pure per-row CASE — no sort, no window, no shuffle beyond the
    * presentation ordering. */
  def temporalSplit(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val us = unix_micros(col("ts").cast("timestamp"))
    val b = e.agg(min(us).as("mn"), max(us).as("mx")).head()
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val cut1 = mn + (mx - mn) * TemporalTrainPct / 100
    val cut2 = mn + (mx - mn) * TemporalValPct / 100
    e.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        when(us <= cut1, "train")
          .when(us <= cut2, "validation")
          .otherwise("test").as("split"))
      .orderBy(col("event_id"))
  }

  /** Per-split audit over [[temporalSplit]]: row counts, the time
    * range each split actually covers, and distinct users — the
    * numbers a training run records next to the data card. */
  def temporalSplitSummary(spark: SparkSession, dir: String): DataFrame =
    temporalSplit(spark, dir)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("from_ts"),
        max(col("ts")).as("to_ts"),
        countDistinct(col("user_id")).as("unique_users"))
      .orderBy(col("split"))

  private val temporalCaseSql =
    s"""CASE WHEN epoch_us(ts) <= mn + (mx - mn) * $TemporalTrainPct // 100 THEN 'train' WHEN epoch_us(ts) <= mn + (mx - mn) * $TemporalValPct // 100 THEN 'validation' ELSE 'test' END"""

  val oracle: Map[String, String] = Map(
    "events_split_temporal" ->
      s"""WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events) SELECT event_id, ts, user_id, event_type, $temporalCaseSql AS split FROM events CROSS JOIN b ORDER BY event_id""",
    "events_split_temporal_summary" ->
      s"""WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events), s AS (SELECT ts, user_id, $temporalCaseSql AS split FROM events CROSS JOIN b) SELECT split, COUNT(*) AS n_events, MIN(ts) AS from_ts, MAX(ts) AS to_ts, COUNT(DISTINCT user_id) AS unique_users FROM s GROUP BY 1 ORDER BY 1""",
    "events_json_extract" ->
      """SELECT event_type, COUNT(*) AS n, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS avg_value FROM events GROUP BY 1 ORDER BY 1""",
    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value, COUNT(DISTINCT user_id) AS unique_users FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_user_activity" ->
      """SELECT user_id, COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value, MIN(ts) AS first_ts, MAX(ts) AS last_ts, COUNT(DISTINCT event_type) AS distinct_types FROM events GROUP BY 1 ORDER BY 1""",
    // canonical ASOF JOIN semantics — checks the merge-style operator
    // against DuckDB's native implementation, not against itself
    "events_asof_purchase_click" ->
      """SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts, p.value AS purchase_value, c.event_id AS click_id, c.ts AS click_ts FROM (SELECT * FROM events WHERE event_type = 'purchase') p ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c ON p.user_id = c.user_id AND p.ts >= c.ts ORDER BY purchase_id""",
    "events_sessionize" ->
      """WITH x AS (SELECT user_id, ts, event_id, value, CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL '30' MINUTE THEN 1 ELSE 0 END AS brk FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), s AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM x) SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_grouped_quantiles" ->
      """WITH r AS (SELECT event_type, value, row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) - 1 AS rn, COUNT(*) OVER (PARTITION BY event_type) AS n FROM events WHERE value IS NOT NULL) SELECT event_type, MAX(CASE WHEN rn = floor(0.25 * (n - 1)) THEN value END) AS p25, MAX(CASE WHEN rn = floor(0.5 * (n - 1)) THEN value END) AS p50, MAX(CASE WHEN rn = floor(0.9 * (n - 1)) THEN value END) AS p90 FROM r GROUP BY 1 ORDER BY 1""",
    "events_quantile_bounds" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n, min(value) AS min_val, max(value) AS max_val FROM events WHERE value IS NOT NULL GROUP BY 1 ORDER BY 1""",
    "events_range_error_clicks" ->
      """SELECT e.event_id AS error_id, COUNT(*) AS n_clicks_5min FROM (SELECT * FROM events WHERE event_type = 'error') e JOIN (SELECT * FROM events WHERE event_type = 'click') c ON c.ts >= e.ts - INTERVAL '5' MINUTE AND c.ts <= e.ts GROUP BY 1 ORDER BY 1""",
    "events_json_typed" ->
      """SELECT event_type, COUNT(k) AS parsed, CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unparsed, MIN(k) AS min_k, MAX(k) AS max_k, COUNT(DISTINCT k) AS distinct_k FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) GROUP BY 1 ORDER BY 1""",
    // session_window semantics: new session at gap >= 30 min
    "events_session_window" ->
      """WITH x AS (SELECT user_id, ts, event_id, value, CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL '30' MINUTE THEN 1 ELSE 0 END AS brk FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM x) SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"""
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_json_extract" -> jsonExtract _,
    "events_json_typed" -> jsonTyped _,
    "events_hourly" -> hourlyRollup _,
    "events_user_activity" -> userActivity _,
    "events_asof_purchase_click" -> asOfPurchaseClick _,
    "events_sessionize" -> sessionizeBatch _,
    "events_grouped_quantiles" ->
      ((s: SparkSession, dir: String) => groupedQuantiles(s, dir)),
    "events_quantile_bounds" -> groupedQuantileBounds _,
    "events_range_error_clicks" -> rangeErrorClicks _,
    "events_session_window" -> sessionWindows _,
    "events_split_temporal" -> temporalSplit _,
    "events_split_temporal_summary" -> temporalSplitSummary _
  )
}
