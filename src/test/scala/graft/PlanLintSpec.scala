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
    "window_moving_average", "window_month_over_month",
    // normalizing-total window over the POST-AGGREGATION per-source
    // frame (rows = sources — Sampling.temperatureWeights scaladoc);
    // tokenBudgetMix's quota subplan carries the same window
    "mix_temperature_weights", "mix_token_budget",
    // max-weight window over the POST-AGGREGATION per-LANGUAGE
    // fertility frame (rows = languages, a model-bounded domain —
    // Sampling.fertilityWeightedMix scaladoc)
    "mix_fertility_weighted",
    // the quantized-retriever eval's single-query forms re-derive
    // ranks with one global rank window over each retriever's OWN
    // top-k output — a ≤ ProductQuant.TopK-row frame by construction
    // (RetrievalEval.evalQuantForms scaladoc: the same bounded-window
    // class as the RRF fuse); the batched adc leg rides the salted
    // two-phase rank like rag_eval_forms
    "rag_eval_quant_forms",
    // in-batch negative sampling: one lead() over the OUTPUT-sized
    // near-pair set (bounded by dedup structure, not corpus size;
    // Similarity.contrastivePairs scaladoc documents the bucket-
    // sharded form for large pair sets)
    "sim_contrastive_pairs",
    // RRF fusion: the dense leg's rank window runs over a frame
    // TakeOrdered-bounded at RrfDepth rows (Retrieval.hybridRrf);
    // the lexical leg's windows are the salted two-phase rank. The
    // _ivf form swaps the dense leg to the single-cell trained probe
    // (same bounded rank frame)
    "rag_hybrid_rrf", "rag_hybrid_rrf_ivf",
    // batch fusion: both legs ride the salted two-phase rank, and the
    // fusion's per-query rank window runs over their UNION — input
    // bounded at nq · 2·RrfDepth rows by construction
    // (Retrieval.fuseBatch)
    "rag_hybrid_rrf_batch",
    // modal-source/modal-label rank windows over the POST-AGGREGATION
    // cluster×source and cluster×label frames (bounded at K·|sources|
    // and K·|labels| rows — ClusterOps.cardOn scaladoc)
    "curation_cluster_card_forms",
    // the artifact-merge card forms run the same post-aggregation
    // modal ranks (inputs bounded at K·|sources| / K·|labels| rows
    // read from the aggregate stores)
    "curation_cluster_card_merge_forms")

  // intentional exceptions: exactness baselines over bounded inputs,
  // kept next to their scale paths (IVF/LSH) — see Dedup scaladoc —
  // and the centroid scorer's broadcast fan-out against a
  // CONSTANT-sized representative set (8 rows: work is 8× corpus,
  // not corpus², at any scale)
  private val allowProductJoin =
    Set("dedup_embedding_cosine", "sim_centroid_assign",
      // inherits dedup_embedding_cosine's guarded all-pairs baseline
      // (its LSH form is the scale path, as that entry documents)
      "dedup_method_agreement",
      // the sources × vocabulary support GRID is the point: JSD's
      // q-side term must exist for (source, token) cells the source
      // never emitted. Both sides are aggregates bounded by the
      // model (sources, vocabulary), never the corpus; the second
      // cross join is against a 1-row total
      "text_js_divergence",
      // composite of already-classified queries reduced to 1-row
      // aggregates — inherits text_js_divergence's support grid
      "curation_data_card",
      // artifact-served and per-source card forms: same legs (the
      // served JSD leg reads the count artifact but scores through
      // the same bounded sources × vocabulary grid; the by-source
      // forms group the legs by source instead of reducing to 1 row)
      "curation_data_card_served", "curation_data_card_by_source",
      "curation_data_card_by_source_served",
      // τ (a 1-row aggregate of the top-(k+1) heap) broadcast against
      // the k-row sample — both sides bounded by the constant k,
      // never the corpus (Sampling.prioritySample scaladoc)
      "sample_weighted_priority",
      // the NB candidate fan-out: token stream × the LANGUAGE domain
      // (a model-bounded constant, the sim_centroid_assign pattern —
      // work is |langs|× corpus, never corpus²)
      "text_nb_lang_score", "text_nb_confusion",
      // the boilerplate-skew fixture (Dedup.skewedDocs): clone
      // generation cross-joins spark.range against a 1-ROW template
      // and a 1-ROW max-id bound — both sides constant-size
      // broadcasts, work is |clones|, never corpus²
      "dedup_lsh_hot_bucket", "dedup_lsh_bucket_stats")

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

  // every rank/row_number window must be CLASSIFIED: either its
  // partition key is row-level (group sizes stay bounded as data
  // grows — dedup windows keyed by orderkey/doc_id) or entity-level
  // (bounded by per-entity activity — user_id sessionization), or it
  // is a documented low-NDV window carrying a rows-per-group loud
  // guard (StatsOps.requireGroupsSortable) with a registered
  // percentile_approx variant. An unclassified rank window fails the
  // build — the shape the round-3 verdict flagged (a window
  // partitioned by a 5-value key sorts whole groups in one task, and
  // the global-window lint can't see it).
  private val rowKeyedWindow = Set(
    "elt_dedup_keep_first", "elt_union_dedup_sources",
    "elt_processed_pipeline", "etl_transform_sales",
    "dedup_incremental", "dedup_incremental_manifest",
    "sim_centroid_assign",
    // rank window partitioned by cluster_id — NDV ~ doc count, group
    // sizes are near-dup cluster sizes
    "dedup_keep_best",
    // island-merge windows partitioned by doc_id over ONLY the
    // duplicated gram positions (group size bounded by doc length)
    "dedup_substring_spans", "dedup_substring_summary",
    // partitioned by the md5 content fingerprint — NDV ~ doc count
    "text_corpus_filter", "text_corpus_filter_summary",
    // band-bucket windows (band_idx, band_val) — NDV tracks the
    // corpus (md5/sub-signature band values), and the window IS the
    // hot-bucket guard: its count/min/row_number cost per bucket is
    // sort-shaped, the mechanism that caps the band join's k²
    // (Dedup.cappedBandPairs / the incrementalCore gold-side cap)
    "dedup_minhash_lsh", "dedup_lsh_hot_bucket", "mm_phash_neardup",
    "dedup_vacuum_served",
    // inherit corpusFilter's fingerprint-keyed dedup window
    "curation_pipeline", "curation_pipeline_summary",
    // built on etl_transform_sales' orderkey-keyed dedup window
    "etl_transform_quality",
    // composite: every window it contains belongs to a component
    // query already classified here (corpus filter's fingerprint
    // dedup, keep-best's cluster rank, the split's hash decile)
    "curation_data_card",
    // served/by-source forms of the same composites: the label-store
    // build they run (writeSplitLabels) carries the split's hash
    // decile and the CC build's windows — all row-keyed as above —
    // and the per-source grouping adds no window of its own
    "curation_data_card_served", "curation_data_card_by_source",
    "curation_data_card_by_source_served",
    // artifact-served keep-best: the cluster_id rank window (NDV ~
    // doc count) plus writeSplitLabels' build-side windows
    "dedup_keep_best_served",
    // per-vector neighbor rank: partitioned by vec_id (NDV = corpus
    // size), group bounded by cell size — ClusterOps.knnGraph; the
    // components form builds the same edge set (the CC loop itself is
    // window-free and checkpoint-truncated); the multi-probe form
    // doubles the candidate set, same row-keyed rank; keep-best adds
    // the community-keyed rank (NDV ~ corpus size, group = community)
    "sim_knn_graph", "sim_knn_components", "sim_knn_graph_p2_forms",
    "sim_knn_keep_best", "sim_knn_community_hist",
    // the removal gates build the pre-removal stores (writeKnnEdges'
    // same row-keyed rank) and the repairs recompute touched cells
    // through the identical rank — group still bounded by cell size
    "sim_knn_remove_edges", "sim_knn_remove_labels",
    // the merge-family forms entry runs the same row-keyed rank over
    // the gold side, the recomputed touched cells, and (served form)
    // the partition-pruned artifact read; the sub-probe forms entry
    // runs the same per-vector rank with probes live and from the
    // store
    "sim_knn_graph_merge_forms", "sim_knn_graph_p2_sub_forms",
    // incremental communities: both CC legs run the same row-keyed
    // edge ranks; the CC loop itself is window-free; the served form
    // replaces the carried leg with a pruned artifact read and keeps
    // only the touched cells' rank
    "sim_knn_communities_merge_forms",
    // label spread: per-round modal-vote rank partitioned by vec_id
    // (NDV ~ corpus size, group ≤ 2·KnnK + 1 votes) over the
    // post-aggregation vote counts; the live form adds the edge
    // derivation's row-keyed rank, the served form reads the edges
    // artifact
    "sim_knn_label_spread_forms")
  private val entityKeyedWindow = Set(
    "events_sessionize", "events_asof_purchase_click")
  private val guardedLowNdvWindow = Set(
    "elt_boxplot", "events_grouped_quantiles",
    // per-source exact p25 cutoffs: requireGroupsSortable guard +
    // percentile_approx as the documented scale path
    "text_quality_source_cut",
    // per-language tercile cutoffs (CCNet buckets): same
    // requireGroupsSortable guard + percentile_approx scale path
    "text_ppl_buckets")
  // per-cell training-sample cap: the rank window's INPUT is the
  // modulus-bounded pre-sample (~K·cap·8 rows by construction —
  // Dedup.sampleModulusFor), never the corpus; at gate scale the
  // modulus is 1 because the corpus is already sample-sized
  private val boundedSampleWindow = Set("dedup_semantic_artifact")
  // rank over a POST-AGGREGATION frame bounded by the calendar
  // (years × 12 rows), same justification as the allowGlobalWindow
  // time-series entries
  private val calendarBoundedWindow = Set("window_month_rank")
  // SkewOps.topKPerGroup: stage-1 window is (key, salt)-partitioned,
  // stage-2 input bounded at groups·salts·k by construction
  private val saltedTwoPhaseWindow =
    Set("window_top3_per_region", "sample_fixed_count",
      // per-source priority top-(k+1) rides SkewOps.topKPerGroup
      // (stage-2 bounded at sources·salts·k); τ joins back by
      // broadcast (Sampling.prioritySampleBySource scaladoc)
      "sample_priority_by_source",
      // per-query top-k over the batch's probed cells rides
      // SkewOps.topKPerGroup (stage-2 bounded at queries·salts·k);
      // the served form answers from the cell-partitioned store
      // through the same two-phase rank
      "sim_ivf_batch_topk", "sim_ivf_batch_topk_served",
      "sim_adc_batch_topk",
      // BM25: per-query top-k AND per-query query-term selection both
      // ride SkewOps.topKPerGroup (stage-2 bounded at
      // queries·salts·k — Retrieval scaladoc); the store-fed forms
      // answer through the same two-phase rank
      "rag_bm25_topk", "rag_bm25_batch", "rag_bm25_served",
      "rag_bm25_index_append", "rag_bm25_takedown_forms",
      "rag_bm25_diff_upsert",
      // per-cluster quota rides SkewOps.topKPerGroup (stage-2 bounded
      // at K·salts·quota — ClusterOps.clusterBalanceSample scaladoc);
      // the served form answers through the same two-phase rank
      "sample_cluster_balance_forms",
      // exact-truth and IVF-probe top-k both ride topKPerGroup over
      // the literal query block's fan-out (queries × corpus scored
      // rows, stage-2 bounded at queries·salts·k —
      // RetrievalEval.exactBatchTopK scaladoc)
      "rag_eval_forms")
  // running-sum/rank windows partitioned by (source or epoch,
  // doc_id-shard): parallelism = groups × shards, and a deployment
  // scales the shard count with the corpus (Curation.packSequences /
  // Sampling.epochShuffle scaladocs)
  private val shardedWindow = Set("text_pack_sequences", "text_pack_summary",
    "mix_epoch_shuffle",
    // (source, doc_id-shard) running-sum cut + the sources-frame
    // quota window (same post-agg justification as
    // mix_temperature_weights)
    "mix_token_budget",
    // (phase, shard) position windows — shard count is the scaling
    // knob (epochShuffle argument); also inherits pplBuckets'
    // guarded low-NDV lang-cutoff window
    "mix_curriculum",
    // BPE-token packing: the same (doc_id-shard) running-sum cut as
    // text_pack_sequences, over the trained tokenizer's counts
    // (Bpe.bpePackSummary scaladoc); the trainer's own windows are
    // word-partitioned (NDV = vocabulary)
    "text_pack_bpe_summary",
    // the composed version-bump pipeline packs its sampled keepers
    // through the same (source, doc_id-shard) running-sum cut
    // (Curation.packSequencesOn)
    "curation_bump_pipeline")

  test("every rank window is classified: row-keyed, entity-keyed, or guarded") {
    // built with AQE off: AdaptiveSparkPlanExec is a leaf node, so
    // WindowExec inside an AQE-wrapped plan is invisible to collect()
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val known = rowKeyedWindow ++ entityKeyedWindow ++
        guardedLowNdvWindow ++ calendarBoundedWindow ++
        saltedTwoPhaseWindow ++ shardedWindow ++ allowGlobalWindow ++
        boundedSampleWindow
      val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
        if (known(name)) None
        else {
          val windows = fn(spark, sf).queryExecution.executedPlan.collect {
            case w: org.apache.spark.sql.execution.window.WindowExec => w
          }
          if (windows.nonEmpty) Some(name) else None
        }
      }
      assert(offenders.isEmpty,
        s"unclassified rank-window queries (classify in PlanLintSpec " +
          s"and guard low-NDV keys): $offenders")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("prefix-filtered dedup plans no window and no df join") {
    // the broadcast-rank form: the df dictionary is a reference
    // object, prefix selection is in-projection — the corpus-index
    // sort that aborted the first formulation at 100x must not
    // reappear as a WindowExec or a df-side SortMergeJoin. The
    // operator pins the index behind a localCheckpoint (round-13:
    // three consumers, one scan), which truncates its lineage out of
    // the operator's plan — so the structural assertions run against
    // the INDEX's own plan, where the selection actually lives.
    val idxPlan = graft.ext.Dedup.prefixIndex(spark,
        graft.ext.Dedup.docShingles(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!idxPlan.contains("Window"),
      s"prefix selection regressed to a rank window:\n$idxPlan")
    assert(!idxPlan.contains("SortMergeJoin"),
      s"prefix selection regressed to a df-side join:\n$idxPlan")
    assert(idxPlan.toLowerCase.contains("prefixbydf"),
      s"prefix selection should ride the PrefixByDf expression:\n$idxPlan")
    // and the operator downstream of the pinned index stays
    // window-free (candidate join + verify only)
    val opPlan = graft.ext.Dedup.ngramJaccardPrefixPairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!opPlan.contains("Window"),
      s"prefix path regressed to a rank window:\n$opPlan")
  }

  test("span dedup's probe join broadcasts the multi-occurrence gram " +
      "set (AQE runtime conversion)") {
    // the broadcast is an AQE decision made from the count-agg's
    // runtime stats (the dup-gram set is ~5% of distinct grams), so
    // the final adaptive plan — inspectable only after execution —
    // must carry it; without it the probe side would re-shuffle the
    // whole (doc_id, pos, g) stream, doubling the operator's one
    // irreducible exchange (the count-agg floor, see dupPositions)
    val df = graft.ext.Dedup.substringSpans(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dup-gram probe must broadcast under AQE:\n$plan")
  }

  test("stratified sample core plans with zero exchanges") {
    val plan = graft.ext.Sampling.stratifiedSampleCore(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"sampling must stay a pure scan+filter projection:\n$plan")
  }

  test("bloom decontamination plans no join operator at all") {
    val plan = graft.ext.Curation.decontaminateBloom(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"the bitmask probe must be pure map + agg, no join:\n$plan")
  }

  test("decontamination probes the eval gram set via broadcast join") {
    val plan = graft.ext.Curation.decontaminate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval side is benchmark-sized and must broadcast:\n$plan")
  }

  test("OOV rate probes the vocabulary via broadcast join") {
    val plan = graft.ext.TextOps.oovRate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the K-row vocabulary must broadcast to the corpus probe side:\n$plan")
  }

  test("vocabulary top-k is a partial aggregate + bounded take, not a global sort") {
    val plan = graft.ext.TextOps.vocabTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must take k per partition, not globally sort the vocab:\n$plan")
    assert(!plan.contains("Sort "),
      s"no full sort should survive planning:\n$plan")
  }

  test("no fact-path query uses an unpartitioned (global) window") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      if (allowGlobalWindow(name)) None
      else {
        val globalWindows = collectPlan(fn(spark, sf).queryExecution.executedPlan) {
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
