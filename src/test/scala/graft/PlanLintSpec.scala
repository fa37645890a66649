package graft

/** Plan lint: every registered query's physical plan is checked for
  * scale anti-patterns — accidental cartesian products, nested-loop
  * joins, and single-partition windows over fact-sized inputs. Known,
  * intentional cases are whitelisted with the reason; anything new
  * fails the build, so a future query can't silently regress into a
  * plan that dies at 100 TB. */
class PlanLintSpec extends SparkSpec {

  // intentional exceptions: global windows over DIM-sized inputs
  // (surrogate keys on distinct'd dims — see StarSchema scaladoc)
  private val allowGlobalWindow = Set(
    "star_dim_date", "star_dim_country", "star_dim_item",
    "star_dim_channel", "star_fact_sales", "star_revenue_by_year",
    // time-series windows over POST-AGGREGATION frames (one row per
    // day/month — bounded by the calendar, not by fact size; see
    // WindowAnalytics scaladoc)
    "window_moving_average", "window_month_over_month")

  // intentional exceptions: exactness baselines over bounded inputs,
  // kept next to their scale paths (IVF/LSH) — see Dedup scaladoc —
  // and the centroid scorer's broadcast fan-out against a
  // CONSTANT-sized representative set (8 rows: work is 8× corpus,
  // not corpus², at any scale)
  private val allowProductJoin =
    Set("dedup_embedding_cosine", "sim_centroid_assign")

  test("no query plans a cartesian or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      if (allowProductJoin(name)) None
      else {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")
          || plan.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    }
    assert(offenders.isEmpty,
      s"queries with product joins: $offenders")
  }

  test("no fact-path query uses an unpartitioned (global) window") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      if (allowGlobalWindow(name)) None
      else {
        val globalWindows = fn(spark, sf).queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
        }
        if (globalWindows.nonEmpty) Some(name) else None
      }
    }
    assert(offenders.isEmpty,
      s"queries with global windows: $offenders")
  }
}
