package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every implemented
  * operator from SURVEY.md §2 is exposed here as a named query, with a
  * DuckDB-equivalent oracle SQL where the semantics are
  * ANSI-SQL-expressible (non-expressible ops get a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q6_revenue_per_region_year")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Analytics.queries ++
      graft.queries.EltOps.queries ++
      graft.queries.JoinsExtra.queries ++
      graft.queries.Reshape.queries ++
      graft.queries.WindowAnalytics.queries ++
      graft.pipeline.StarSchema.queries ++
      graft.pipeline.GoldLayout.queries ++
      graft.pipeline.EtlPipeline.queries ++
      graft.ext.TextOps.queries ++
      graft.ext.Selection.queries ++
      graft.ext.Dedup.queries ++
      graft.ext.Similarity.queries ++
      graft.ext.KMeans.queries ++
      graft.ext.ProductQuant.queries ++
      graft.ext.ScalarQuant.queries ++
      graft.ext.Multimodal.queries ++
      graft.ext.EventOps.queries ++
      graft.ext.Sampling.queries ++
      graft.ext.Pii.queries ++
      graft.ext.Retrieval.queries ++
      graft.ext.Curation.queries ++
      graft.ext.ClusterOps.queries ++
      graft.ext.Bpe.queries ++
      graft.pipeline.ZOrderLayout.queries ++
      graft.ext.RetrievalEval.queries

  /** DuckDB inlines a non-MATERIALIZED CTE, re-evaluating it once PER
    * REFERENCE — and the k-means / sub-quantizer training chains
    * reference their round CTEs multiply, compounding down the chain.
    * Measured at sf0.01: `dedup_semantic_artifact` 86 s → 0.7 s, the
    * FULL suite 813 s → 38 s, with bit-identical results (the chains'
    * values are quantized integers and fixed-order per-row folds, so
    * evaluation strategy cannot move them). Applied uniformly here
    * rather than per-string so a future oracle cannot silently re-pay
    * the blowup — round 14's correctness artifact came back empty
    * because the suite's DuckDB cost outgrew the driver's budget.
    * Recursive members (`reach(a, b) AS`) don't match the pattern and
    * stay plain, as DuckDB requires; CTEs already marked MATERIALIZED
    * don't match either. */
  private def materializeCtes(sql: String): String =
    sql.replaceAll("""\b(\w+ AS) \(SELECT""", "$1 MATERIALIZED (SELECT")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = rawOracleSql
    .map { case (k, v) => k -> materializeCtes(v) }

  private def rawOracleSql: Map[String, String] =
    graft.queries.Analytics.oracle ++
      graft.queries.EltOps.oracle ++
      graft.queries.JoinsExtra.oracle ++
      graft.queries.Reshape.oracle ++
      graft.queries.WindowAnalytics.oracle ++
      graft.pipeline.StarSchema.oracle ++
      graft.pipeline.GoldLayout.oracle ++
      graft.pipeline.EtlPipeline.oracle ++
      graft.ext.TextOps.oracle ++
      graft.ext.Selection.oracle ++
      graft.ext.Dedup.oracle ++
      graft.ext.Similarity.oracle ++
      graft.ext.KMeans.oracle ++
      graft.ext.KMeans.servedOracle ++
      graft.ext.ProductQuant.oracle ++
      graft.ext.ScalarQuant.oracle ++
      graft.ext.Multimodal.oracle ++
      graft.ext.EventOps.oracle ++
      graft.ext.Sampling.oracle ++
      graft.ext.Pii.oracle ++
      graft.ext.Retrieval.oracle ++
      graft.ext.Curation.allOracle ++
      graft.ext.ClusterOps.oracle ++
      graft.ext.Bpe.oracle ++
      graft.pipeline.ZOrderLayout.oracle ++
      graft.ext.RetrievalEval.oracle
}
