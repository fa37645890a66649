package graft.ops

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline stage metrics — the reference logs rows/cols/size/time
  * per stage by re-counting eagerly (etl_pipeline/extract.py:52-56,
  * load.py:347-349). The Spark-first form is `Dataset.observe`:
  * metric expressions ride along with the job that materializes the
  * stage, so row counts and value checks cost ZERO extra passes —
  * at 100 TB a separate `count()` per stage would double every scan.
  *
  * Usage:
  * {{{
  *   val (df, obs) = StageLog.observed("transform", cleaned)
  *   df.write.parquet(out)            // the action
  *   val m = StageLog.metrics(obs)    // rows etc., already collected
  * }}}
  */
object StageLog {

  /** Attach an observation measuring row count and null count of the
    * given columns to a stage frame. */
  def observed(stage: String, df: DataFrame, nullCheckCols: String*)
      : (DataFrame, Observation) = {
    val obs = Observation(stage)
    val nullCounts = nullCheckCols.map(c =>
      sum(col(c).isNull.cast("long")).as(s"nulls_$c"))
    (df.observe(obs, count(lit(1)).as("rows"), nullCounts: _*), obs)
  }

  /** Block until the observation's job finishes and return metrics. */
  def metrics(obs: Observation): Map[String, Any] = obs.get

  /** Render a batch of stage metrics as a DataFrame — the queryable
    * form of the reference's log files. */
  def metricsTable(spark: SparkSession,
      stages: Seq[(String, Map[String, Any])]): DataFrame = {
    import spark.implicits._
    stages.map { case (name, m) =>
      (name, m.get("rows").fold(-1L)(_.toString.toLong),
        m.view.filterKeys(_ != "rows")
          .map { case (k, v) => s"$k=$v" }.mkString(","))
    }.toDF("stage", "rows", "detail")
  }
}
