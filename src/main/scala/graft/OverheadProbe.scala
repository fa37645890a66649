package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev experiment for the tiny-query overhead question (round-3
  * verdict #7): q5/q7 cost ~5× the reference MySQL in ABSOLUTE terms
  * while big-scan queries beat it — where does a sub-second Spark
  * query's time actually go? This probe splits wall time into
  *
  *  1. plan: analysis + optimization + physical planning
  *     (forcing `queryExecution.executedPlan`),
  *  2. execute: steady-state collect (min of 3) with job/stage/task
  *     counts from a listener,
  *
  * and re-times execution under candidate overhead mitigations
  * (AQE coalesce to fewer tasks via parallelismFirst=false).
  * Usage: runMain graft.OverheadProbe [query ...] (default q5, q7).
  */
object OverheadProbe {

  private final class CountListener extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks)
    }
  }

  private def probe(spark: SparkSession, name: String, sfDir: String,
      listener: CountListener): Unit = {
    def planSec(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
      (System.nanoTime() - t0) / 1e9
    }
    def execSec(): Double = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e9
    }
    execSec() // warm
    val plan = Seq(planSec(), planSec(), planSec()).min
    val j0 = listener.jobs.get; val s0 = listener.stages.get
    val t0 = listener.tasks.get
    val exec = execSec()
    Thread.sleep(300)
    val (dj, ds, dt) = (listener.jobs.get - j0, listener.stages.get - s0,
      listener.tasks.get - t0)
    val steady = Seq(execSec(), execSec(), execSec()).min
    println(f"[probe] $name%-28s plan $plan%6.3f s  exec $exec%6.3f s  " +
      f"steady-min $steady%6.3f s  jobs $dj stages $ds tasks $dt")
  }

  /** Steady-state serving-latency comparison for the dashboard memo
    * layer (graft.queries.QueryMemo): fresh plan+execute per request
    * (what a naive dashboard pays on every widget interaction) vs
    * plan-reuse (same DataFrame instance — Catalyst paid once) vs
    * pinned (persist() — execution skipped too, the full
    * `@st.cache_data` analog). Each number is min of 3 after warm-up. */
  private def probeReuse(spark: SparkSession, name: String,
      sfDir: String): Unit = {
    import graft.queries.QueryMemo
    def minOf3(f: () => Double): Double = Seq(f(), f(), f()).min
    def timed(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); df.collect(); (System.nanoTime() - t0) / 1e9
    }
    SparkEntry.queries(name)(spark, sfDir).collect() // warm codegen/IO
    val fresh = minOf3(() => timed(SparkEntry.queries(name)(spark, sfDir)))
    val memoDf = QueryMemo.of(spark, name, sfDir)
    memoDf.collect() // plan once
    val reuse = minOf3(() => timed(memoDf))
    val pinDf = QueryMemo.pinned(spark, s"$name@$sfDir#pinned")(
      SparkEntry.queries(name)(spark, sfDir))
    pinDf.collect() // materialize the cache
    val pinned = minOf3(() => timed(pinDf))
    println(f"[probe] $name%-28s fresh $fresh%6.3f s  " +
      f"plan-reuse $reuse%6.3f s (${fresh / reuse}%4.1fx)  " +
      f"pinned $pinned%6.3f s (${fresh / pinned}%4.1fx)")
  }

  def main(args: Array[String]): Unit = {
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q5_avg_margin_per_channel", "q7_top_orders_by_price")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def run(tag: String, extra: Map[String, String]): Unit = {
      val b = GraftSession.builder("local[32]", "32")
        .appName(s"overhead-$tag")
      extra.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val listener = new CountListener
      spark.sparkContext.addSparkListener(listener)
      println(s"[probe] --- $tag ---")
      qs.foreach(q => probe(spark, q, sfDir, listener))
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    run("default", Map.empty)
    // candidate mitigation: coalesce post-shuffle partitions to size,
    // not parallelism — fewer tiny tasks per exchange
    run("coalesce-to-size", Map(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m"))
    // dashboard serving path: QueryMemo plan-reuse vs fresh-per-request
    val spark = GraftSession.builder("local[32]", "32")
      .appName("overhead-reuse").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("[probe] --- dashboard memo reuse (QueryMemo) ---")
    val dashQs = qs ++ (if (args.nonEmpty) Nil else Seq("dash_kpis",
      "dash_filtered_kpis", "dash_channel_rollup", "dash_monthly_trend"))
    dashQs.foreach(q => probeReuse(spark, q, sfDir))
    spark.stop()
  }
}
