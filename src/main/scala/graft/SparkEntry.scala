package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * north-star training-data-pipeline operator) expressed over the shared
  * testdata; [[oracleSql]] carries the equivalent DuckDB SQL the driver
  * hash-compares against. Column names AND types are aligned on both sides
  * (DuckDB's count/sum/length/year return wider types than Spark — the
  * oracle SQL casts them back).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"  -> (RelationalOps.pricingSummary _),
    "q02_filter_project"   -> (RelationalOps.filterProject _),
    "q03_join_revenue"     -> (RelationalOps.joinRevenue _),
    "q04_star_join"        -> (RelationalOps.starJoin _),
    "q05_topk_orders"      -> (RelationalOps.topKOrders _),
    "q06_argmax_customer"  -> (RelationalOps.argmaxPerCustomer _),
    "q07_window_top3"      -> (RelationalOps.windowTop3 _),
    "q08_union_slices"     -> (RelationalOps.unionSlices _),
    "q09_anti_join"        -> (RelationalOps.antiJoin _),
    "q10_semi_join"        -> (RelationalOps.semiJoin _),
    "q11_distinct"         -> (RelationalOps.distinctSegments _),
    "q12_case_agg"         -> (RelationalOps.caseAgg _),
    "q13_rollup"           -> (RelationalOps.rollupAgg _),
    "q14_scalar_funcs"     -> (RelationalOps.scalarFunctions _),
    "q15_avg_qty_filter"   -> (RelationalOps.avgQtyFilter _),
    "q16_token_stats"      -> (TextOps.tokenStats _),
    "q17_quality_score"    -> (TextOps.qualityScore _),
    "q18_langid"           -> (TextOps.langId _),
    "q19_fingerprint"      -> (TextOps.fingerprint _),
    "q20_exact_dedup"      -> (Dedup.exactDedup _),
    "q21_ngram_jaccard"    -> (Dedup.ngramJaccard _),
    "q22_minhash_lsh"      -> (Dedup.minhashLsh _),
    "q23_simhash"          -> (Dedup.simhash _),
    "q24_simhash_pairs"    -> (Dedup.simhashPairs _),
    "q25_knn_brute"        -> (Similarity.knnBrute _),
    "q26_ann_lsh"          -> (Similarity.annLsh _),
    "q27_cosine_near_dup"  -> (Similarity.cosineNearDup _),
    "q28_tumbling_window"  -> (EventOps.tumblingWindow _),
    "q29_sessionize"       -> (EventOps.sessionize _),
    "q30_media_features"   -> (MultimodalOps.mediaFeatures _),
    "q31_lateral_top1"     -> (LateralOps.lateralTop1 _),
    "q32_first_wins_dedup" -> (LateralOps.firstWinsDedup _),
    "q33_set_ops"          -> (LateralOps.setOps _),
    "q34_cube"             -> (LateralOps.cubeAgg _),
    // q35 runs the chess stack on a bundled fixture; its oracle is the
    // committed golden table (DuckDB replay of the reference SQL over the
    // staged parse — tools/q35_golden.py)
    "q35_pgn_pipeline"     -> (PgnDemo.pgnPipeline _),
    "q36_distinct_agg"     -> (ExtraOps.distinctAgg _),
    "q37_ann_ivf"          -> (ExtraOps.annIvf _),
    "q38_regex_tokens"     -> (ExtraOps.regexTokens _),
    "q39_train_split"      -> (SamplingOps.trainSplit _),
    "q40_stratified_sample" -> (SamplingOps.stratifiedSample _),
    // q41/q42 oracle-validate the scale utilities themselves: the salted
    // broadcast join and the bounded top-k Aggregator must produce exactly
    // what the plain join / window SQL produces
    "q41_salted_join"      -> ((s: SparkSession, d: String) =>
      ScaleOps.saltedBroadcastJoin(
          Tables.customer(s, d), Tables.nation(s, d), "c_nationkey", "n_nationkey", 8)
        .select("c_custkey", "c_name", "n_name")),
    "q42_topk_aggregator"  -> ((s: SparkSession, d: String) =>
      ScaleOps.topKPerGroup(Tables.orders(s, d), "o_custkey", "o_totalprice", "o_orderkey", 3)),
    "q43_json_extract"     -> (SemiStructuredOps.jsonExtract _),
    "q44_pivot"            -> (SemiStructuredOps.pivotStatus _),
    "q45_rolling_window"   -> (SemiStructuredOps.rollingWindow _),
    "q46_percentiles"      -> (FunctionOps.percentiles _),
    "q47_pattern_filter"   -> (FunctionOps.patternFilter _),
    "q48_array_agg"        -> (FunctionOps.arrayAgg _),
    "q49_kmeans_assign"    -> (AdvancedOps.kmeansAssign _),
    "q50_merge_upsert"     -> (AdvancedOps.mergeUpsertOrders _),
    "q51_asof_join"        -> (AdvancedOps.asofJoin _),
    "q52_range_join"       -> (AdvancedOps.rangeJoin _),
    "q53_window_suite"     -> (AdvancedOps.windowSuite _),
    "q54_tfidf"            -> (AdvancedOps.tfidf _),
    "q55_ann_multiprobe"   -> (AdvancedOps.annMultiProbe _),
    // q56: sketch estimates have no cross-engine oracle (rows-only check;
    // SketchBoundsSpec asserts error bounds against exact values)
    "q56_sketches"         -> (AdvancedOps.sketches _),
    "q57_dedup_clusters"   -> (AdvancedOps.dedupClusters _),
    "q58_frame_sample"     -> (MultimodalOps.frameSample _),
    "q59_unpivot"          -> (FunctionOps.unpivotMetrics _),
    "q60_datetime"         -> (FunctionOps.datetimeSuite _),
    // q61 oracle-validates the Bloom-prefilter utility: identical output to
    // the plain equi-join (false positives are removed by the exact join)
    "q61_bloom_join"       -> ((s: SparkSession, d: String) =>
      ScaleOps.bloomPrefilteredJoin(
          Tables.lineitem(s, d),
          Tables.orders(s, d).filter(org.apache.spark.sql.functions.col("o_totalprice") > 400000.0),
          "l_orderkey", "o_orderkey", 100000L)
        .select("l_orderkey", "l_linenumber", "o_totalprice")),
    "q62_zscore"           -> (FunctionOps.zscore _),
    "q63_dedup_keep_list"  -> (AdvancedOps.dedupKeepList _),
    "q64_string_suite"     -> (FunctionOps.stringSuite _),
    "q65_grouping_sets"    -> (FunctionOps.groupingSets _),
    "q66_subword_tokens"   -> (TextOps.subwordTokens _),
    // q67 oracle-validates the skew-salted two-phase aggregation against
    // the plain GROUP BY (exactness under any salt; salt is content-derived)
    "q67_salted_agg"       -> ((s: SparkSession, d: String) =>
      ScaleOps.saltedAgg(Tables.lineitem(s, d), "l_returnflag", "l_quantity", 16)
        .select(org.apache.spark.sql.functions.col("l_returnflag"),
          org.apache.spark.sql.functions.col("n"),
          ops.Portable.r4(org.apache.spark.sql.functions.col("total")).as("total"))),
    // q68: z-order (Morton) clustering key — the layout-optimization
    // primitive; LayoutSpec proves the per-file multi-dimension bounding
    "q68_zorder_key"       -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions.col
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        ScaleOps.zorder2(col("l_orderkey"), col("l_partkey")).as("zvalue"))
    }),
    // q69: CDC between two snapshot versions — the FULL OUTER join shape
    "q69_snapshot_diff"    -> (AdvancedOps.snapshotDiffOrders _),
    "q70_embedding_stats"  -> (Similarity.embeddingStats _),
    "q71_redact"           -> (TextOps.redact _),
    "q72_boilerplate"      -> (TextOps.boilerplate _),
    "q73_quantize_int8"    -> (Similarity.quantizeInt8 _),
    // q74: incremental maintenance must land EXACTLY on the full recompute
    "q74_incremental_agg"  -> (AdvancedOps.incrementalAgg _),
    "q75_sql_surface"      -> (RelationalOps.sqlSurface _),
    "q76_profile"          -> (ExtraOps.profile _),
    "q77_histogram"        -> (ExtraOps.histogram _),
    "q78_retention"        -> (EventOps.retention _),
    "q79_funnel"           -> (EventOps.funnel _),
    "q80_top_paths"        -> (EventOps.topPaths _),
    "q81_contamination"    -> (Dedup.contamination _),
    "q82_repetition"       -> (TextOps.repetition _),
    "q83_pack_sequences"   -> (SamplingOps.packSequences _),
    "q84_temperature_mix"  -> (SamplingOps.temperatureMix _),
    "q85_pagerank"         -> (GraphOps.pagerank _),
    "q86_winsorize"        -> (FunctionOps.winsorize _),
    "q87_canonicalize"     -> (EntityOps.canonicalize _),
    "q88_equidepth_hist"   -> (ExtraOps.equiDepthHistogram _),
    "q89_group_ols"        -> (ExtraOps.groupOls _),
    "q90_quota_sample"     -> (SamplingOps.quotaSample _),
    "q91_hopping_window"   -> (EventOps.hoppingWindow _),
    "q92_ewma"             -> (EventOps.ewma _),
    "q93_date_spine"       -> (EventOps.dateSpine _),
    "q94_transitions"      -> (EventOps.transitions _),
    "q95_skew_report"      -> (ExtraOps.skewReport _),
    "q96_fk_audit"         -> (ExtraOps.fkAudit _),
    "q97_key_check"        -> (ExtraOps.keyCheck _),
    "q98_twap"             -> (EventOps.twap _),
    "q99_attribution"      -> (EventOps.attribution _),
    "q100_corpus_funnel"   -> (CurationPipeline.corpusFunnel _),
    "q101_bpe_pairs"       -> (TextOps.bpePairs _),
    "q102_pmi"             -> (TextOps.pmiCollocations _),
    "q103_perplexity"      -> (TextOps.perplexity _),
    "q104_bpe_train"       -> (TextOps.bpeTrain _),
    "q105_adaptive_quality" -> (CorpusOps.adaptiveQuality _),
    "q106_chunk_overlap"   -> (CorpusOps.chunkOverlap _),
    "q107_containment_pairs" -> (Dedup.containmentPairs _),
    "q108_debounce"        -> (EventOps.debounce _),
    "q109_char_entropy"    -> (CorpusOps.charEntropy _),
    "q110_weighted_sample" -> (SamplingOps.weightedSample _),
    "q111_embedding_cov"   -> (Similarity.embeddingCovariance _),
    "q112_dup_rate_by_form" -> (Dedup.dupRateByForm _),
    "q113_incremental_dedup" -> (Dedup.incrementalDedup _),
    "q114_join_cardinality" -> (ExtraOps.joinCardinality _),
    "q115_semantic_dedup"  -> (Similarity.semanticDedup _),
    "q116_scd2"            -> (LakehouseOps.scd2Orders _),
    "q117_triangles"       -> (GraphOps.triangles _),
    "q118_length_buckets"  -> (CorpusOps.lengthBuckets _),
    "q119_mad_outliers"    -> (FunctionOps.madOutliers _),
    "q120_ks_drift"        -> (ExtraOps.ksDrift _),
    "q121_sorted_neighborhood" -> (Dedup.sortedNeighborhood _),
    "q122_bpe_encode"      -> (TextOps.bpeEncode _),
    "q123_novelty"         -> (CorpusOps.noveltyScore _),
    "q124_psi_drift"       -> (ExtraOps.psiDrift _),
    "q125_phash_pairs"     -> (MultimodalOps.phashPairs _),
    "q126_assoc_rules"     -> (GraphOps.assocRules _),
    "q127_zone_maps"       -> (LakehouseOps.zoneMapSkipping _),
    "q128_gap_fill"        -> (EventOps.gapFill _),
    "q129_mom_growth"      -> (ExtraOps.momGrowth _),
    "q130_golden_record"   -> (EntityOps.goldenRecord _),
    "q131_split_balance"   -> (SamplingOps.splitBalance _),
    "q132_best_rep"        -> (AdvancedOps.bestRepKeepList _),
    "q133_mixture_schedule" -> (SamplingOps.mixtureSchedule _),
    "q134_rank_normalize"  -> (FunctionOps.rankNormalize _),
    "q135_dedup_agreement" -> (Dedup.dedupAgreement _),
    "q136_source_overlap"  -> (Dedup.sourceOverlap _),
    "q137_gopher_rules"    -> (CorpusOps.gopherRules _),
    "q138_ann_recall"      -> (Similarity.annRecall _),
    "q139_pareto"          -> (ExtraOps.paretoFrontier _),
    "q140_interval_coverage" -> (EventOps.intervalCoverage _),
    "q141_bm25"            -> (TextOps.bm25 _),
    "q142_cdc_apply"       -> (LakehouseOps.cdcApply _),
    "q143_kl_divergence"   -> (CorpusOps.klDivergence _),
    "q144_ttr_hapax"       -> (CorpusOps.ttrHapax _),
    "q145_prefix_dedup"    -> (Dedup.prefixDedup _),
    "q146_weighted_median" -> (FunctionOps.weightedMedian _),
    "q147_dead_letter"     -> (SemiStructuredOps.deadLetter _),
    "q148_power_iteration" -> (Similarity.powerIteration _),
    "q149_dataset_card"    -> (CorpusOps.datasetCard _),
    "q150_minhash_error"   -> (Dedup.minhashErrorAudit _),
    "q151_late_data"       -> (EventOps.lateData _),
    "q152_vocab_coverage"  -> (TextOps.vocabCoverage _),
    "q153_tree_depth"      -> (GraphOps.treeDepth _),
    "q154_kcore"           -> (GraphOps.kcore _),
    "q155_feature_hash"    -> (TextOps.featureHash _),
    "q156_k_anonymity"     -> (ExtraOps.kAnonymity _),
    "q157_decile_lift"     -> (CorpusOps.decileLift _),
    "q158_split_leakage"   -> (SamplingOps.splitLeakage _),
    "q159_active_users"    -> (EventOps.activeUsers _),
    "q160_lang_confusion"  -> (TextOps.langConfusion _),
    "q161_conformance"     -> (EventOps.conformance _),
    "q162_conversion_latency" -> (EventOps.conversionLatency _),
    "q163_ann_mrr"         -> (Similarity.annMrr _),
    "q164_weekly_churn"    -> (EventOps.weeklyChurn _),
    "q165_max_drawdown"    -> (EventOps.maxDrawdown _),
    "q166_gini_tokens"     -> (CorpusOps.giniTokens _),
    "q167_snm_multipass"   -> (Dedup.snmMultipass _),
    "q168_repeated_spans"  -> (Dedup.repeatedSpans _),
    "q169_repeated_passages" -> (Dedup.repeatedPassages _),
    "q170_span_decontam"   -> (Dedup.spanDecontamination _),
    "q171_cut_passages"    -> (Dedup.cutPassages _),
    "q172_asof_ranged"     -> (AdvancedOps.asofJoinRanged _),
    "q173_decontam_cut"    -> (Dedup.decontamCut _),
    "q174_sessionize_ranged" -> (EventOps.sessionizeRangedGate _),
    "q175_pgn_pipeline_hf" -> (PgnDemo.pgnPipelineHf _),
    "q176_cut_fixpoint"    -> (Dedup.cutPassagesFixpoint _),
    "q177_cms_heavy_hitters" -> (SketchOps.cmsHeavyHitters _),
    "q178_ann_pq"          -> (QuantOps.annPq _),
    "q179_rrf_fusion"      -> (RetrievalOps.rrfFusion _),
    "q180_ann_ivf_pq"      -> (QuantOps.annIvfPq _),
    "q181_cuped"           -> (EventOps.cuped _),
    "q182_compaction_plan" -> (LakehouseOps.compactionPlan _),
    "q183_layout_audit"    -> (LakehouseOps.layoutAudit _),
    "q184_zipf_fit"        -> (CorpusOps.zipfFit _),
    "q185_manifest_diff"   -> (LakehouseOps.manifestDiff _),
    "q186_cluster_split"   -> (SamplingOps.clusterSplit _),
    "q187_hard_negatives"  -> (Similarity.hardNegatives _),
    "q188_time_travel"     -> (LakehouseOps.timeTravel _),
    "q189_shard_migration" -> (ScaleOps.shardMigration _),
    "q190_localized_diff"  -> (LakehouseOps.localizedDiff _),
    "q191_quality_auc"     -> (CorpusOps.qualityAuc _),
    "q192_bootstrap_ci"    -> (SamplingOps.bootstrapCi _),
    "q193_overlap_depth"   -> (LakehouseOps.overlapDepth _),
    "q194_edit_verify"     -> (Dedup.editVerifiedPairs _),
    "q195_winnow_pairs"    -> (Dedup.winnowPairs _),
    "q196_logreg_quality"  -> (CorpusOps.logregQuality _),
    "q197_kcenter_coreset" -> (Similarity.kcenterCoreset _),
    "q198_dsir_weights"    -> (SamplingOps.dsirWeights _),
    "q199_unimax_budget"   -> (SamplingOps.unimaxBudget _),
    "q200_cdc_chunks"      -> (Dedup.cdcChunkDedup _),
    "q201_label_prop"      -> (GraphOps.labelProp _),
    "q202_logreg_confusion" -> (CorpusOps.logregApply _),
    "q203_dedup_cascade"   -> (Dedup.dedupCascade _),
    "q204_soft_dedup"      -> (AdvancedOps.softDedupWeights _),
    "q205_ppl_buckets"     -> (CorpusOps.perplexityBuckets _),
    "q206_redundancy_share" -> (Dedup.redundancyShare _),
    "q207_span_index_delta" -> (Dedup.spanIndexDelta _),
    "q208_semantic_decontam" -> (Similarity.semanticDecontam _),
    "q209_fertility"       -> (TextOps.fertility _),
    "q210_pack_chunks"     -> (PackingOps.packChunks _),
    "q211_doc_fragmentation" -> (PackingOps.docFragmentation _),
    "q212_source_quota"    -> (PackingOps.sourceQuota _),
    "q213_ranged_source_quota" -> (PackingOps.rangedSourceQuota _),
    "q214_eval_leak_profile" -> (Dedup.evalLeakProfile _),
    "q215_calibration"     -> (CorpusOps.logregCalibration _),
    "q216_pack_delta"      -> (PackingOps.packDelta _),
    "q217_budget_fill"     -> (SamplingOps.budgetFill _),
    "q218_heap_source_quota" -> (PackingOps.heapSourceQuota _),
    "q219_pack_contamination" -> (PackingOps.packContamination _),
    "q220_padding_audit"   -> (PackingOps.paddingAudit _),
    "q221_matryoshka_recall" -> (Similarity.matryoshkaRecall _),
    "q222_curation_shift"  -> (CorpusOps.curationShift _),
    "q223_autorange_cumsum" -> (ScaleOps.autorangeCumSum _),
    "q224_crossdomain_ppl" -> (CorpusOps.crossdomainPpl _),
    "q225_filtered_ann"    -> (Similarity.filteredAnn _),
    "q226_ivf_delta"       -> (Similarity.ivfDelta _),
    "q227_shard_shuffle"   -> (PackingOps.shardShuffle _),
    "q228_doremi_weights"  -> (SamplingOps.doremiWeights _),
    "q229_ndcg"            -> (RetrievalOps.ndcg _),
    "q230_dp_histogram"    -> (ExtraOps.dpHistogram _),
    "q231_minhash_pr_curve" -> (Dedup.minhashPrCurve _),
    "q233_bbit_minhash"    -> (Dedup.bbitMinhash _),
    "q234_vocab_prune"     -> (TextOps.vocabPrune _),
    "q235_curriculum"      -> (CorpusOps.curriculumSchedule _),
    "q236_span_corruption" -> (PackingOps.spanCorruption _),
    "q237_heaps_law"       -> (TextOps.heapsLaw _),
    "q238_fp_collisions"   -> (Dedup.fpCollisionAudit _),
    "q239_dedup_transitivity" -> (Dedup.nearDupTransitivity _),
    "q240_mmr_rerank"      -> (RetrievalOps.mmrRerank _),
    "q241_uncertainty"     -> (CorpusOps.uncertaintySample _),
    "q242_chunk_dedup"     -> (PackingOps.chunkDedupSurvival _),
    "q243_eval_holdout"    -> (SamplingOps.evalHoldout _),
    "q244_incremental_lsh" -> (Dedup.incrementalLsh _),
    "q245_gradient_select" -> (CorpusOps.gradientSelect _),
    "q246_signal_corr"     -> (CorpusOps.signalCorrelation _),
    "q247_topic_diversity" -> (AdvancedOps.topicDiversity _),
    "q248_silhouette"      -> (AdvancedOps.silhouette _),
    "q249_rholoss_select"  -> (CorpusOps.rholossSelect _),
    "q250_gate_kappa"      -> (CorpusOps.kappaGates _),
    "q251_source_mmd"      -> (Similarity.sourceMmd _),
    "q252_scaling_plan"    -> (SamplingOps.scalingPlan _),
    "q253_dup_flow"        -> (AdvancedOps.dupFlow _),
    "q254_mann_whitney"    -> (ExtraOps.mannWhitney _),
    "q255_rocchio"         -> (Similarity.rocchio _),
    "q256_cluster_powerlaw" -> (AdvancedOps.clusterPowerlaw _),
    "q257_lang_purity"     -> (TextOps.langPurity _),
    "q258_map_at_k"        -> (Similarity.mapAtK _),
    "q259_threshold_sweep" -> (CorpusOps.thresholdSweep _),
    "q260_lexsem_corr"     -> (Similarity.lexicalSemanticCorr _),
    "q232_source_minhash"  -> (Dedup.sourceMinhash _),
  )

  /** DuckDB-equivalent SQL per query (runs on the same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty,
         round(avg(l_discount),4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY 1,2""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount > 0.05 AND l_quantity < 25""",
    "q03_join_revenue" ->
      """SELECT o_orderpriority,
         round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
         count(*) AS n_items
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1""",
    "q04_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal),2) AS total_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1,2""",
    "q05_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q06_argmax_customer" ->
      """SELECT o_custkey, o_orderkey AS best_order, o_totalprice AS best_price
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
               FROM orders) WHERE rn = 1""",
    "q07_window_top3" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn::INT AS rn
         FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                      row_number() OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders) WHERE rn <= 3""",
    "q08_union_slices" ->
      """SELECT o_orderstatus, count(*) AS n
         FROM (SELECT * FROM orders WHERE o_totalprice > 400000.0
               UNION ALL
               SELECT * FROM orders WHERE o_orderpriority = '1-URGENT')
         GROUP BY 1""",
    "q09_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)""",
    "q10_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""",
    "q11_distinct" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "q12_case_agg" ->
      """SELECT l_linestatus,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1""",
    "q13_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q14_scalar_funcs" ->
      """SELECT o_orderkey,
         year(o_orderdate)::INT AS o_year,
         strftime(o_orderdate, '%m') AS o_month,
         substr(o_orderpriority, 1, 1) AS prio_code,
         coalesce(o_orderstatus, '?') AS status,
         upper(o_orderstatus) AS status_up,
         length(o_orderpriority)::INT AS prio_len
         FROM orders WHERE o_orderkey < 1000""",
    "q15_avg_qty_filter" ->
      """WITH pp AS (SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty
                     FROM lineitem GROUP BY 1)
         SELECT l_partkey, count(*) AS n_small, round(sum(l_extendedprice),2) AS value_small
         FROM lineitem JOIN pp ON l_partkey = pk
         WHERE l_quantity < avg_qty * 0.5
         GROUP BY 1""",
    "q16_token_stats"   -> TextOps.tokenStatsSql,
    "q17_quality_score" -> TextOps.qualityScoreSql,
    "q18_langid"        -> TextOps.langIdSql,
    "q19_fingerprint"   -> TextOps.fingerprintSql,
    "q20_exact_dedup"   -> Dedup.exactDedupSql,
    "q21_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "q22_minhash_lsh"   -> Dedup.minhashLshSql,
    "q23_simhash"       -> Dedup.simhashSql,
    "q24_simhash_pairs" -> Dedup.simhashPairsSql,
    "q25_knn_brute"     -> Similarity.knnBruteSql,
    "q26_ann_lsh"       -> Similarity.annLshSql,
    "q27_cosine_near_dup" -> Similarity.cosineNearDupSql,
    "q28_tumbling_window" -> EventOps.tumblingWindowSql,
    "q29_sessionize"      -> EventOps.sessionizeSql,
    "q30_media_features"  -> MultimodalOps.mediaFeaturesSql,
    "q31_lateral_top1"    -> LateralOps.lateralTop1Sql,
    "q32_first_wins_dedup" -> LateralOps.firstWinsDedupSql,
    "q33_set_ops"         -> LateralOps.setOpsSql,
    "q34_cube"            -> LateralOps.cubeAggSql,
    "q35_pgn_pipeline"    -> PgnDemo.goldenOracleSql,
    "q36_distinct_agg"    -> ExtraOps.distinctAggSql,
    "q37_ann_ivf"         -> ExtraOps.annIvfSql,
    "q38_regex_tokens"    -> ExtraOps.regexTokensSql,
    "q39_train_split"     -> SamplingOps.trainSplitSql,
    "q40_stratified_sample" -> SamplingOps.stratifiedSampleSql,
    "q41_salted_join" ->
      """SELECT c_custkey, c_name, n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "q42_topk_aggregator" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rank::INT AS rank
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        |      FROM orders)
        |WHERE rank <= 3""".stripMargin,
    "q43_json_extract"    -> SemiStructuredOps.jsonExtractSql,
    "q44_pivot"           -> SemiStructuredOps.pivotStatusSql,
    "q45_rolling_window"  -> SemiStructuredOps.rollingWindowSql,
    "q46_percentiles"     -> FunctionOps.percentilesSql,
    "q47_pattern_filter"  -> FunctionOps.patternFilterSql,
    "q48_array_agg"       -> FunctionOps.arrayAggSql,
    "q49_kmeans_assign"   -> AdvancedOps.kmeansAssignSql,
    "q50_merge_upsert"    -> AdvancedOps.mergeUpsertOrdersSql,
    "q51_asof_join"       -> AdvancedOps.asofJoinSql,
    "q52_range_join"      -> AdvancedOps.rangeJoinSql,
    "q53_window_suite"    -> AdvancedOps.windowSuiteSql,
    "q54_tfidf"           -> AdvancedOps.tfidfSql,
    "q55_ann_multiprobe"  -> AdvancedOps.annMultiProbeSql,
    "q57_dedup_clusters"  -> AdvancedOps.dedupClustersSql,
    "q58_frame_sample"    -> MultimodalOps.frameSampleSql,
    "q59_unpivot"         -> FunctionOps.unpivotMetricsSql,
    "q60_datetime"        -> FunctionOps.datetimeSuiteSql,
    "q61_bloom_join"      ->
      """SELECT l_orderkey, l_linenumber, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000.0""".stripMargin,
    "q62_zscore"          -> FunctionOps.zscoreSql,
    "q63_dedup_keep_list" -> AdvancedOps.dedupKeepListSql,
    "q64_string_suite"    -> FunctionOps.stringSuiteSql,
    "q65_grouping_sets"   -> FunctionOps.groupingSetsSql,
    "q66_subword_tokens"  -> TextOps.subwordTokensSql,
    "q67_salted_agg"      ->
      s"""SELECT l_returnflag, count(*) AS n,
         |${ops.Portable.r4Sql("sum(l_quantity)")} AS total
         |FROM lineitem GROUP BY 1""".stripMargin,
    "q68_zorder_key"      ->
      s"""SELECT l_orderkey, l_linenumber,
         |${ops.ScaleOps.zorder2Sql("l_orderkey", "l_partkey")} AS zvalue
         |FROM lineitem""".stripMargin,
    "q69_snapshot_diff"   -> AdvancedOps.snapshotDiffOrdersSql,
    "q70_embedding_stats" -> Similarity.embeddingStatsSql,
    "q71_redact"          -> TextOps.redactSql,
    "q72_boilerplate"     -> TextOps.boilerplateSql,
    "q73_quantize_int8"   -> Similarity.quantizeInt8Sql,
    "q74_incremental_agg" -> AdvancedOps.incrementalAggSql,
    "q75_sql_surface"     -> RelationalOps.sqlSurfaceSql,
    "q76_profile"         -> ExtraOps.profileSql,
    "q77_histogram"       -> ExtraOps.histogramSql,
    "q78_retention"       -> EventOps.retentionSql,
    "q79_funnel"          -> EventOps.funnelSql,
    "q80_top_paths"       -> EventOps.topPathsSql,
    "q81_contamination"   -> Dedup.contaminationSql,
    "q82_repetition"      -> TextOps.repetitionSql,
    "q83_pack_sequences"  -> SamplingOps.packSequencesSql,
    "q84_temperature_mix" -> SamplingOps.temperatureMixSql,
    "q85_pagerank"        -> GraphOps.pagerankSql,
    "q86_winsorize"       -> FunctionOps.winsorizeSql,
    "q87_canonicalize"    -> EntityOps.canonicalizeSql,
    "q88_equidepth_hist"  -> ExtraOps.equiDepthHistogramSql,
    "q89_group_ols"       -> ExtraOps.groupOlsSql,
    "q90_quota_sample"    -> SamplingOps.quotaSampleSql,
    "q91_hopping_window"  -> EventOps.hoppingWindowSql,
    "q92_ewma"            -> EventOps.ewmaSql,
    "q93_date_spine"      -> EventOps.dateSpineSql,
    "q94_transitions"     -> EventOps.transitionsSql,
    "q95_skew_report"     -> ExtraOps.skewReportSql,
    "q96_fk_audit"        -> ExtraOps.fkAuditSql,
    "q97_key_check"       -> ExtraOps.keyCheckSql,
    "q98_twap"            -> EventOps.twapSql,
    "q99_attribution"     -> EventOps.attributionSql,
    "q100_corpus_funnel"  -> CurationPipeline.corpusFunnelSql,
    "q101_bpe_pairs"      -> TextOps.bpePairsSql,
    "q102_pmi"            -> TextOps.pmiCollocationsSql,
    "q103_perplexity"     -> TextOps.perplexitySql,
    "q104_bpe_train"      -> TextOps.bpeTrainSql,
    "q105_adaptive_quality" -> CorpusOps.adaptiveQualitySql,
    "q106_chunk_overlap"  -> CorpusOps.chunkOverlapSql,
    "q107_containment_pairs" -> Dedup.containmentPairsSql,
    "q108_debounce"       -> EventOps.debounceSql,
    "q109_char_entropy"   -> CorpusOps.charEntropySql,
    "q110_weighted_sample" -> SamplingOps.weightedSampleSql,
    "q111_embedding_cov"  -> Similarity.embeddingCovarianceSql,
    "q112_dup_rate_by_form" -> Dedup.dupRateByFormSql,
    "q113_incremental_dedup" -> Dedup.incrementalDedupSql,
    "q114_join_cardinality" -> ExtraOps.joinCardinalitySql,
    "q115_semantic_dedup"  -> Similarity.semanticDedupSql,
    "q116_scd2"            -> LakehouseOps.scd2OrdersSql,
    "q117_triangles"       -> GraphOps.trianglesSql,
    "q118_length_buckets"  -> CorpusOps.lengthBucketsSql,
    "q119_mad_outliers"    -> FunctionOps.madOutliersSql,
    "q120_ks_drift"        -> ExtraOps.ksDriftSql,
    "q121_sorted_neighborhood" -> Dedup.sortedNeighborhoodSql,
    "q122_bpe_encode"      -> TextOps.bpeEncodeSql,
    "q123_novelty"         -> CorpusOps.noveltyScoreSql,
    "q124_psi_drift"       -> ExtraOps.psiDriftSql,
    "q125_phash_pairs"     -> MultimodalOps.phashPairsSql,
    "q126_assoc_rules"     -> GraphOps.assocRulesSql,
    "q127_zone_maps"       -> LakehouseOps.zoneMapSkippingSql,
    "q128_gap_fill"        -> EventOps.gapFillSql,
    "q129_mom_growth"      -> ExtraOps.momGrowthSql,
    "q130_golden_record"   -> EntityOps.goldenRecordSql,
    "q131_split_balance"   -> SamplingOps.splitBalanceSql,
    "q132_best_rep"        -> AdvancedOps.bestRepKeepListSql,
    "q133_mixture_schedule" -> SamplingOps.mixtureScheduleSql,
    "q134_rank_normalize"  -> FunctionOps.rankNormalizeSql,
    "q135_dedup_agreement" -> Dedup.dedupAgreementSql,
    "q136_source_overlap"  -> Dedup.sourceOverlapSql,
    "q137_gopher_rules"    -> CorpusOps.gopherRulesSql,
    "q138_ann_recall"      -> Similarity.annRecallSql,
    "q139_pareto"          -> ExtraOps.paretoFrontierSql,
    "q140_interval_coverage" -> EventOps.intervalCoverageSql,
    "q141_bm25"            -> TextOps.bm25Sql,
    "q142_cdc_apply"       -> LakehouseOps.cdcApplySql,
    "q143_kl_divergence"   -> CorpusOps.klDivergenceSql,
    "q144_ttr_hapax"       -> CorpusOps.ttrHapaxSql,
    "q145_prefix_dedup"    -> Dedup.prefixDedupSql,
    "q146_weighted_median" -> FunctionOps.weightedMedianSql,
    "q147_dead_letter"     -> SemiStructuredOps.deadLetterSql,
    "q148_power_iteration" -> Similarity.powerIterationSql,
    "q149_dataset_card"    -> CorpusOps.datasetCardSql,
    "q150_minhash_error"   -> Dedup.minhashErrorAuditSql,
    "q151_late_data"       -> EventOps.lateDataSql,
    "q152_vocab_coverage"  -> TextOps.vocabCoverageSql,
    "q153_tree_depth"      -> GraphOps.treeDepthSql,
    "q154_kcore"           -> GraphOps.kcoreSql,
    "q155_feature_hash"    -> TextOps.featureHashSql,
    "q156_k_anonymity"     -> ExtraOps.kAnonymitySql,
    "q157_decile_lift"     -> CorpusOps.decileLiftSql,
    "q158_split_leakage"   -> SamplingOps.splitLeakageSql,
    "q159_active_users"    -> EventOps.activeUsersSql,
    "q160_lang_confusion"  -> TextOps.langConfusionSql,
    "q161_conformance"     -> EventOps.conformanceSql,
    "q162_conversion_latency" -> EventOps.conversionLatencySql,
    "q163_ann_mrr"         -> Similarity.annMrrSql,
    "q164_weekly_churn"    -> EventOps.weeklyChurnSql,
    "q165_max_drawdown"    -> EventOps.maxDrawdownSql,
    "q166_gini_tokens"     -> CorpusOps.giniTokensSql,
    "q167_snm_multipass"   -> Dedup.snmMultipassSql,
    "q168_repeated_spans"  -> Dedup.repeatedSpansSql,
    "q169_repeated_passages" -> Dedup.repeatedPassagesSql,
    "q170_span_decontam"   -> Dedup.spanDecontaminationSql,
    "q171_cut_passages"    -> Dedup.cutPassagesSql,
    // q172 is q51's semantics under the ranged plan — same oracle, so a
    // hash match IS the window-form row-identity proof at gate scale
    "q172_asof_ranged"     -> AdvancedOps.asofJoinSql,
    "q173_decontam_cut"    -> Dedup.decontamCutSql,
    // q174 is q29's semantics under the ranged plan — same oracle (the
    // q172 discipline: the hash match is the window-form identity proof)
    "q174_sessionize_ranged" -> EventOps.sessionizeSql,
    // q175 is q35's pipeline with openings ingested through the verbatim
    // hf://datasets/... URI — same golden oracle (the q172 discipline:
    // the hash match proves the hf:// input path is byte-equivalent)
    "q175_pgn_pipeline_hf" -> PgnDemo.goldenOracleSql,
    // q176's oracle unrolls exactly CutFixpointMaxRounds q171 rounds —
    // identity rounds past the fixpoint keep it aligned with the
    // probe-terminated Spark loop (the q154 kcore alignment argument)
    "q176_cut_fixpoint"    -> Dedup.cutPassagesFixpointSql,
    "q177_cms_heavy_hitters" -> SketchOps.cmsHeavyHittersSql,
    "q178_ann_pq"          -> QuantOps.annPqSql,
    "q179_rrf_fusion"      -> RetrievalOps.rrfFusionSql,
    "q180_ann_ivf_pq"      -> QuantOps.annIvfPqSql,
    "q181_cuped"           -> EventOps.cupedSql,
    "q182_compaction_plan" -> LakehouseOps.compactionPlanSql,
    "q183_layout_audit"    -> LakehouseOps.layoutAuditSql,
    "q184_zipf_fit"        -> CorpusOps.zipfFitSql,
    "q185_manifest_diff"   -> LakehouseOps.manifestDiffSql,
    "q186_cluster_split"   -> SamplingOps.clusterSplitSql,
    "q187_hard_negatives"  -> Similarity.hardNegativesSql,
    "q188_time_travel"     -> LakehouseOps.timeTravelSql,
    "q189_shard_migration" -> ScaleOps.shardMigrationSql,
    "q190_localized_diff"  -> LakehouseOps.localizedDiffSql,
    "q191_quality_auc"     -> CorpusOps.qualityAucSql,
    "q192_bootstrap_ci"    -> SamplingOps.bootstrapCiSql,
    "q193_overlap_depth"   -> LakehouseOps.overlapDepthSql,
    "q194_edit_verify"     -> Dedup.editVerifiedPairsSql,
    "q195_winnow_pairs"    -> Dedup.winnowPairsSql,
    "q196_logreg_quality"  -> CorpusOps.logregQualitySql,
    "q197_kcenter_coreset" -> Similarity.kcenterCoresetSql,
    "q198_dsir_weights"    -> SamplingOps.dsirWeightsSql,
    "q199_unimax_budget"   -> SamplingOps.unimaxBudgetSql,
    "q200_cdc_chunks"      -> Dedup.cdcChunkDedupSql,
    "q201_label_prop"      -> GraphOps.labelPropSql,
    "q202_logreg_confusion" -> CorpusOps.logregApplySql,
    "q203_dedup_cascade"   -> Dedup.dedupCascadeSql,
    "q204_soft_dedup"      -> AdvancedOps.softDedupWeightsSql,
    "q205_ppl_buckets"     -> CorpusOps.perplexityBucketsSql,
    "q206_redundancy_share" -> Dedup.redundancyShareSql,
    "q207_span_index_delta" -> Dedup.spanIndexDeltaSql,
    "q208_semantic_decontam" -> Similarity.semanticDecontamSql,
    "q209_fertility"       -> TextOps.fertilitySql,
    "q210_pack_chunks"     -> PackingOps.packChunksSql,
    "q211_doc_fragmentation" -> PackingOps.docFragmentationSql,
    "q212_source_quota"    -> PackingOps.sourceQuotaSql,
    // the ranged form reproduces the window form ROW-FOR-ROW — same oracle,
    // so the hash match doubles as the row-identity proof (q172 discipline)
    "q213_ranged_source_quota" -> PackingOps.sourceQuotaSql,
    "q214_eval_leak_profile" -> Dedup.evalLeakProfileSql,
    "q215_calibration"     -> CorpusOps.logregCalibrationSql,
    "q216_pack_delta"      -> PackingOps.packDeltaSql,
    "q217_budget_fill"     -> SamplingOps.budgetFillSql,
    // third strategy on the SAME oracle: window (q212) / grid (q213) /
    // bounded-heap (q218) are gate-proven row-identical
    "q218_heap_source_quota" -> PackingOps.sourceQuotaSql,
    "q219_pack_contamination" -> PackingOps.packContaminationSql,
    "q220_padding_audit"   -> PackingOps.paddingAuditSql,
    "q221_matryoshka_recall" -> Similarity.matryoshkaRecallSql,
    "q222_curation_shift"  -> CorpusOps.curationShiftSql,
    // written as the NAIVE partition-less window; the AutoRangeCumSum
    // optimizer rule rewrites it — the oracle is the window form, so the
    // hash match proves the optimizer's plan row-identical
    "q223_autorange_cumsum" -> ScaleOps.autorangeCumSumSql,
    "q224_crossdomain_ppl" -> CorpusOps.crossdomainPplSql,
    "q225_filtered_ann"    -> Similarity.filteredAnnSql,
    "q226_ivf_delta"       -> Similarity.ivfDeltaSql,
    "q227_shard_shuffle"   -> PackingOps.shardShuffleSql,
    "q228_doremi_weights"  -> SamplingOps.doremiWeightsSql,
    "q229_ndcg"            -> RetrievalOps.ndcgSql,
    "q230_dp_histogram"    -> ExtraOps.dpHistogramSql,
    "q231_minhash_pr_curve" -> Dedup.minhashPrCurveSql,
    "q233_bbit_minhash"    -> Dedup.bbitMinhashSql,
    "q234_vocab_prune"     -> TextOps.vocabPruneSql,
    "q235_curriculum"      -> CorpusOps.curriculumScheduleSql,
    "q236_span_corruption" -> PackingOps.spanCorruptionSql,
    "q237_heaps_law"       -> TextOps.heapsLawSql,
    "q238_fp_collisions"   -> Dedup.fpCollisionAuditSql,
    "q239_dedup_transitivity" -> Dedup.nearDupTransitivitySql,
    "q240_mmr_rerank"      -> RetrievalOps.mmrRerankSql,
    "q241_uncertainty"     -> CorpusOps.uncertaintySampleSql,
    "q242_chunk_dedup"     -> PackingOps.chunkDedupSurvivalSql,
    "q243_eval_holdout"    -> SamplingOps.evalHoldoutSql,
    "q244_incremental_lsh" -> Dedup.incrementalLshSql,
    "q245_gradient_select" -> CorpusOps.gradientSelectSql,
    "q246_signal_corr"     -> CorpusOps.signalCorrelationSql,
    "q247_topic_diversity" -> AdvancedOps.topicDiversitySql,
    "q248_silhouette"      -> AdvancedOps.silhouetteSql,
    "q249_rholoss_select"  -> CorpusOps.rholossSelectSql,
    "q250_gate_kappa"      -> CorpusOps.kappaGatesSql,
    "q251_source_mmd"      -> Similarity.sourceMmdSql,
    "q252_scaling_plan"    -> SamplingOps.scalingPlanSql,
    "q253_dup_flow"        -> AdvancedOps.dupFlowSql,
    "q254_mann_whitney"    -> ExtraOps.mannWhitneySql,
    "q255_rocchio"         -> Similarity.rocchioSql,
    "q256_cluster_powerlaw" -> AdvancedOps.clusterPowerlawSql,
    "q257_lang_purity"     -> TextOps.langPuritySql,
    "q258_map_at_k"        -> Similarity.mapAtKSql,
    "q259_threshold_sweep" -> CorpusOps.thresholdSweepSql,
    "q260_lexsem_corr"     -> Similarity.lexicalSemanticCorrSql,
    "q232_source_minhash"  -> Dedup.sourceMinhashSql,
  )
}
