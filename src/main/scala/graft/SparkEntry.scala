package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._
import graft.streaming.StreamingOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the north-star
  * LLM-pipeline extensions) registers a query here; queries with an
  * `oracleSql` entry are hash-compared against DuckDB on the same
  * parquet tables, the rest get the rows-only check (they use
  * engine-specific hashing/LSH that ANSI SQL can't reproduce).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03SegmentRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational surface (SURVEY.md §2.6)
    "q01_pricing_summary" -> (Relational.q01PricingSummary _),
    "q02_scan_revenue" -> (Relational.q02ScanRevenue _),
    "q03_segment_revenue" -> (Relational.q03SegmentRevenue _),
    "q04_region_brand" -> (Relational.q04RegionBrand _),
    "q05_topk_per_group" -> (Relational.q05TopKPerGroup _),
    "q06_running_window" -> (Relational.q06RunningWindow _),
    "q07_set_ops" -> (Relational.q07SetOps _),
    "q08_sort_limit" -> (Relational.q08SortLimit _),
    "q09_rollup" -> (Relational.q09Rollup _),
    "q10_distinct_agg" -> (Relational.q10DistinctAgg _),
    "q11_semi_anti" -> (Relational.q11SemiAnti _),
    "q16_cube" -> (Relational.q16Cube _),
    "q17_grouping_sets" -> (Relational.q17GroupingSets _),
    "q18_interval_join" -> (Relational.q18IntervalJoin _),
    "q19_pivot" -> (Relational.q19Pivot _),
    "q44_percentiles" -> (Relational.q44Percentiles _),
    "q46_window_suite" -> (Relational.q46WindowSuite _),
    "q47_string_fns" -> (Relational.q47StringFns _),
    "q48_date_fns" -> (Relational.q48DateFns _),
    "q49_math_fns" -> (Relational.q49MathFns _),
    "q50_bag_setops" -> (Relational.q50BagSetOps _),
    "q55_moving_window" -> (Relational.q55MovingWindow _),
    "q59_grouped_topk" -> (Relational.q59GroupedTopK _),
    "q56_correlated_subquery" -> (Relational.q56CorrelatedSubquery _),
    // event / semi-structured / temporal
    "q12_json_extract" -> (EventOps.q12JsonExtract _),
    "q66_map_fns" -> (EventOps.q66MapFns _),
    "q13_hourly_tumbling" -> (EventOps.q13HourlyTumbling _),
    "q14_asof_last_signup" -> (EventOps.q14AsofLastSignup _),
    "q15_sessionize" -> (EventOps.q15Sessionize _),
    // dedup family
    "q20_dedup_exact" -> (Dedup.q20DedupExact _),
    "q21_dedup_fingerprint" -> (TextAnalysis.q21Fingerprint _),
    "q22_dedup_minhash_lsh" -> (Dedup.q22MinHashLsh _),
    "q23_dedup_ngram_jaccard" -> (Dedup.q23NgramJaccard _),
    "q24_dedup_simhash" -> (Dedup.q24SimHash _),
    "q25_embedding_neardup" -> (Dedup.q25EmbeddingNearDup _),
    "q40_dedup_apply" -> (Dedup.q40DedupApply _),
    "q54_corpus_pipeline" -> (CorpusPipeline.q54Pipeline _),
    // similarity search
    "q26_knn_brute" -> (Similarity.q26KnnBrute _),
    "q27_knn_lsh" -> (Similarity.q27KnnLsh _),
    "q37_knn_ivf" -> (Similarity.q37KnnIvf _),
    "q38_approx_distinct" -> (Relational.q38ApproxDistinct _),
    "q39_vector_stats" -> (Similarity.q39VectorStats _),
    "q61_approx_recall" -> (RecallGates.q61ApproxRecall _),
    // text analysis
    "q28_lang_id" -> (TextAnalysis.q28LangId _),
    "q60_lang_id_ngram" -> (TextAnalysis.q60LangIdNgram _),
    "q29_text_quality" -> (TextAnalysis.q29TextQuality _),
    "q30_token_count" -> (TextAnalysis.q30TokenCount _),
    "q53_heavy_hitters" -> (TextAnalysis.q53HeavyHitters _),
    // multimodal plumbing
    "q31_multimodal_meta" -> (Multimodal.q31MultimodalMeta _),
    // reference-core: inference + CSV round-trip
    "q32_schema_infer" -> (InferOps.q32SchemaInfer _),
    "q33_csv_roundtrip" -> (InferOps.q33CsvRoundtrip _),
    // structured streaming
    "q34_stream_tumbling" -> (StreamingOps.q34StreamTumbling _),
    "q43_stream_stateful" -> (StreamingOps.q43StreamStateful _),
    "q58_stream_stream_join" -> (StreamingOps.q58StreamStreamJoin _),
    "q62_stream_session" -> (StreamingOps.q62StreamSession _),
    "q63_stream_dedup" -> (StreamingOps.q63StreamDedup _),
    "q64_stream_sliding" -> (StreamingOps.q64StreamSliding _),
    "q68_stream_late_data" -> (StreamingOps.q68StreamLateData _),
    "q65_sketch_error" -> (RecallGates.q65SketchError _),
    // rolling-hash fingerprint + multimodal frame sampling
    "q41_rolling_fingerprint" -> (TextAnalysis.q41RollingFingerprint _),
    "q42_frame_sample" -> (Multimodal.q42FrameSample _),
    "q45_resize_features" -> (Multimodal.q45ResizeFeatures _),
    // xlsx + jdbc round-trips (S4-S6/K6, S9-S10/K1-K3)
    "q35_xlsx_roundtrip" -> (InferOps.q35XlsxRoundtrip _),
    "q36_jdbc_roundtrip" -> (InferOps.q36JdbcRoundtrip _),
    "q51_jsonl_roundtrip" -> (InferOps.q51JsonlRoundtrip _),
    "q57_partition_prune" -> (InferOps.q57PartitionedPrune _),
    "q52_orc_roundtrip" -> (InferOps.q52OrcRoundtrip _),
    "q67_compaction" -> (InferOps.q67Compaction _),
    "q69_skew_join" -> (SkewJoin.q69SkewJoin _),
    // curation quality signals + PII governance
    "q70_dup_ngrams" -> (TextAnalysis.q70DupNgrams _),
    "q73_pii_redact" -> (TextAnalysis.q73PiiRedact _),
    // curation: decontamination / sampling / mix / cluster formation
    "q71_contamination" -> (Curation.q71Contamination _),
    "q72_stratified_sample" -> (Curation.q72StratifiedSample _),
    "q74_domain_mix" -> (Curation.q74DomainMix _),
    "q76_dedup_clusters" -> (Curation.q76DedupClusters _),
    // multimodal: distributed binary-file ingestion + magic dispatch
    "q75_binary_ingest" -> (Multimodal.q75BinaryIngest _),
    // runtime-filter join pruning (native Bloom primitives)
    "q77_bloom_join" -> (BloomJoin.q77BloomJoin _),
    // corpus statistics: TF-IDF keywords + bigram-LM quality scoring
    "q78_tfidf_terms" -> (TextAnalysis.q78TfidfTerms _),
    "q79_bigram_nll" -> (TextAnalysis.q79BigramNll _),
    // incremental batch-vs-index dedup (continuous-ingestion shape)
    "q80_incremental_dedup" -> (Dedup.q80IncrementalDedup _),
    // weighted reservoir sampling (deterministic A-ES via TopK agg)
    "q81_weighted_sample" -> (Curation.q81WeightedSample _),
    // z-order clustered layout (lossless 2-D box query)
    "q82_zorder_layout" -> (ZOrder.q82ZorderLayout _),
    // asymmetric shingle containment (embedded-duplicate signal)
    "q83_containment" -> (Dedup.q83Containment _),
    // CDC batch merge (SCD1 upsert) into a durable snapshot
    "q84_merge_upsert" -> (MergeOps.q84MergeUpsert _),
    // SCD2 effective-dated history merge (all four dispositions)
    "q85_scd2_history" -> (MergeOps.q85Scd2 _),
    // Spark 4 transformWithState (ValueState + MapState on RocksDB)
    "q86_transform_with_state" -> (StreamingOps.q86TransformWithState _),
    // streaming CDC-upsert sink (foreachBatch merge into versioned snapshot)
    "q87_streaming_upsert" -> (StreamingOps.q87StreamingUpsert _),
    // vocabulary build + per-doc OOV coverage (tokenizer-training signal)
    "q88_vocab_coverage" -> (TextAnalysis.q88VocabCoverage _),
    // product-quantization ANN (rows-only; quality gated through q61)
    "q89_knn_pq" -> (Similarity.q89KnnPq _),
    // exact cross-doc substring dedup: coverage stats + removal
    "q90_substr_stats" -> (Dedup.q90SubstrStats _),
    "q91_substr_remove" -> (Dedup.q91SubstrRemove _),
    // SemDeDup-style embedding dedup with keep-first policy
    "q92_semantic_dedup" -> (Dedup.q92SemanticDedup _),
    // greedy sequence packing into token-budget bins per source
    "q93_seq_packing" -> (Curation.q93SeqPacking _),
    // dedup-cluster keep-best-quality representative selection
    "q94_cluster_keep_best" -> (Curation.q94ClusterKeepBest _),
    // leakage-safe train/holdout split (decided per near-dup cluster)
    "q95_leakage_safe_split" -> (Curation.q95LeakageSafeSplit _),
    // incremental FUZZY dedup: batch vs banded-MinHash index
    // (rows-only; gated by the q22 cross-boundary equivalence spec)
    "q96_incremental_minhash" -> (Dedup.q96IncrementalMinhash _),
    // BM25 full-text retrieval (RAG/decontamination lookup shape)
    "q97_bm25_topk" -> (Retrieval.q97Bm25 _),
    // incremental materialized-aggregate maintenance (delta-only merge)
    "q98_incremental_agg" -> (MergeOps.q98IncrementalAgg _),
    // BPE tokenizer training: first-iteration pair counts
    "q99_bpe_pairs" -> (Bpe.q99BpePairs _),
    // deterministic training-shard assignment (data-loader order)
    "q100_shard_assign" -> (Curation.q100ShardAssign _),
    // ANALYZE-style per-column statistics in one scan
    "q101_table_stats" -> (Analyze.q101TableStats _),
    // windowed conversion funnel + weekly retention cohorts
    "q102_funnel" -> (EventOps.q102Funnel _),
    "q103_retention" -> (EventOps.q103Retention _),
    // first-order Markov transition matrix over per-user event paths
    "q104_event_transitions" -> (EventOps.q104EventTransitions _),
    // per-group OLS trend from exact integer moment sums
    "q105_trend_regression" -> (Analyze.q105TrendRegression _),
    // distribution-drift score (PSI) between two corpus slices
    "q106_drift_psi" -> (Analyze.q106DriftPsi _),
    // robust outlier detection (median/MAD, 3σ̂ threshold)
    "q107_outlier_mad" -> (Analyze.q107OutlierMad _),
    // BPE tokenizer APPLICATION: train rules, encode every document
    // (rows-only; iterative greedy merges are not SQL-expressible —
    // BpeSpec pins the encoder against the Sennrich example)
    "q108_bpe_encode" -> (Bpe.q108BpeEncode _),
    // stream-static dimension-enrichment join
    "q109_stream_static_join" -> (StreamingOps.q109StreamStaticJoin _),
    // temperature-scaled source mix (countᵅ upsampling weights)
    "q110_temperature_mix" -> (Curation.q110TemperatureMix _),
    // per-user path NLL under the corpus Markov model (anomaly score)
    "q111_path_anomaly" -> (EventOps.q111PathAnomaly _),
    // equi-depth histogram (CBO selectivity / data-skipping statistic)
    "q112_histogram_equidepth" -> (Analyze.q112HistogramEquidepth _),
    // pairwise source-vocabulary Jaccard overlap (mixing diagnostic)
    "q113_vocab_overlap" -> (TextAnalysis.q113VocabOverlap _),
    // EXACT similarity self-join via prefix filtering (no LSH/blocking)
    "q114_prefix_join" -> (Dedup.q114PrefixJoin _),
    // per-document character-entropy quality signal
    "q115_char_entropy" -> (TextAnalysis.q115CharEntropy _),
    // daily calendar gap-fill + LOCF resample per user
    "q116_gap_fill" -> (EventOps.q116GapFill _),
    // 2D Pareto frontier (local-sweep-then-global skyline)
    "q117_skyline" -> (Analyze.q117Skyline _),
    // CUSUM level-shift change-point over the daily series
    "q118_cusum" -> (Analyze.q118Cusum _),
    // top-k PMI collocations (corpus bigram statistics)
    "q119_pmi_collocations" -> (TextAnalysis.q119PmiCollocations _),
    // overlapping context-window chunking (retrieval/packing prep)
    "q120_doc_chunking" -> (Audit.q120DocChunking _),
    // exact embedding covariance from one-pass quantized moment sums
    "q121_embedding_covariance" -> (Audit.q121EmbeddingCovariance _),
    // blocked edit-distance entity resolution (record linkage)
    "q122_entity_resolution" -> (Audit.q122EntityResolution _),
    // source-balance audit: Gini / HHI / entropy of token share
    "q123_source_balance" -> (Audit.q123SourceBalance _),
    // per-document n-gram novelty (dedup-aware curriculum signal)
    "q124_ngram_novelty" -> (Audit.q124NgramNovelty _),
    // stationary event-type distribution (integer power iteration)
    "q125_stationary_dist" -> (EventOps.q125StationaryDist _),
    // Zipf power-law fit over the term-frequency distribution
    "q126_zipf_fit" -> (VocabStats.q126ZipfFit _),
    // token coverage curve for vocab-size selection
    "q127_token_coverage" -> (VocabStats.q127TokenCoverage _),
    // materialized HLL sketch table + mergeable weekly rollup
    "q128_sketch_rollup" -> (Analyze.q128SketchRollup _),
    // point-in-time (as-of) join against an SCD2 dimension
    "q129_pit_join" -> (MergeOps.q129PitJoin _),
    // association rules (support/confidence/lift) over sessions
    "q130_association_rules" -> (EventOps.q130AssociationRules _),
    // per-source quality-score z-calibration
    "q131_score_calibration" -> (Audit.q131ScoreCalibration _),
    // streaming top-k maintenance (complete-mode leaderboard)
    "q132_stream_topk" -> (StreamingOps.q132StreamTopk _),
    // per-user temporal burstiness (automation/abuse signal)
    "q133_burstiness" -> (EventOps.q133Burstiness _),
    // BPE tokenizer hard gate (the q61 pattern): round-trip, fixpoint,
    // token validity, and independent-encoder parity as oracle-hashed
    // booleans — the quality floor for the rows-only q108
    "q134_bpe_gate" -> (Bpe.q134BpeGate _),
    // exact all-pairs TF-IDF cosine join via l2-mass prefix filter
    "q135_cosine_join" -> (SparseSim.q135CosineJoin _),
    // last-touch revenue attribution over the per-user event order
    "q136_attribution" -> (EventOps.q136Attribution _),
    // production SemDeDup over the durable IVF-cell layout, gated the
    // q61 way (layout completeness + drop soundness + recall floor)
    "q137_semdedup_cell" -> (Dedup.q137SemDedupCell _),
    "q143_semdedup_multiprobe" -> (Dedup.q143SemDedupMultiProbe _),
    "q144_ivf_append" -> (Similarity.q144IvfAppend _),
    // first-touch + linear multi-touch attribution (q136's siblings)
    "q138_attribution_models" -> (EventOps.q138AttributionModels _),
    // referential-integrity / constraint audit: pk uniqueness, fk
    // containment, not-null, domain checks across the whole snapshot
    "q139_integrity_audit" -> (Integrity.q139IntegrityAudit _),
    // exact two-sample KS drift between every pair of sources
    "q140_ks_drift" -> (Analyze.q140KsDrift _),
    // streaming drift monitor: per-day PSI vs the corpus margin,
    // maintained by one streaming tumbling aggregation
    "q141_stream_drift" -> (StreamingOps.q141StreamDriftPsi _),
    // Spearman rank agreement between quality signals, per source
    "q142_signal_agreement" -> (Analyze.q142SignalAgreement _),
    // multinomial Naive Bayes source classifier (train + apply,
    // micro-nat-quantized — the SQL-expressible curation classifier)
    "q145_nb_classifier" -> (Classify.q145NaiveBayes _),
    // hybrid retrieval: BM25 ∪ dense cosine, reciprocal-rank fusion
    "q146_hybrid_rrf" -> (Retrieval.q146HybridRrf _),
    // multimodal audio: real RIFF/WAVE PCM decode via javax.sound
    "q147_audio_meta" -> (Multimodal.q147AudioMeta _),
    // distributed integer PageRank over the co-purchase part graph
    "q148_pagerank" -> (Graph.q148PageRank _),
    // DSIR-style importance resampling weights (hashed n-gram ratio)
    "q149_importance_weights" -> (Curation.q149ImportanceWeights _),
    // schema-evolution-tolerant ingest (additive mergeSchema union)
    "q150_schema_evolution" -> (InferOps.q150SchemaEvolution _),
    // intra-doc repetition filters (Gopher-style word/bigram shares)
    "q151_repetition_filter" -> (TextAnalysis.q151RepetitionFilter _),
    // hard-negative mining: top-k cross-label cosine neighbors
    "q152_hard_negatives" -> (Similarity.q152HardNegatives _),
    // CDC extract: snapshot diff into an insert/update/delete set
    "q153_snapshot_diff" -> (MergeOps.q153SnapshotDiff _),
    // phrase search over a positional inverted index
    "q154_phrase_search" -> (Retrieval.q154PhraseSearch _),
    // int8 embedding quantization with a certified error bound
    "q155_int8_quant" -> (Similarity.q155Int8Quant _),
    // curriculum ordering: exact global positions, no global window
    "q156_curriculum_order" -> (Curation.q156CurriculumOrder _),
    // kNN over the int8-quantized store (exact integer dot ranking)
    "q157_knn_int8" -> (Similarity.q157KnnInt8 _),
    "q158_bfs_hops" -> (Graph.q158BfsHops _),
    "q159_triangle_count" -> (Graph.q159Triangles _),
    "q160_connected_components" -> (Graph.q160Components _),
    // CUPED variance-reduced A/B readout (pre-period covariate)
    "q161_cuped" -> (EventOps.q161Cuped _),
    // Snorkel-style weak supervision: LF votes -> weighted revote
    "q162_weak_labels" -> (Classify.q162WeakLabels _),
    // two-proportion conversion chi-squared (A/B family with q161)
    "q163_conversion_test" -> (EventOps.q163ConversionTest _),
    // Mann-Whitney U rank-sum with midrank ties (A/B family)
    "q164_mann_whitney" -> (EventOps.q164MannWhitney _),
    // strength-weighted PageRank (mass flow ∝ co-purchase count)
    "q165_weighted_pagerank" -> (Graph.q165WeightedPageRank _),
    // LSH index compaction lifecycle gate (tombstones -> rewrite)
    "q166_lsh_compaction" -> (Dedup.q166LshCompaction _),
    // Welch's unequal-variance t-test (A/B family with q161/163/164)
    "q167_welch_ttest" -> (EventOps.q167WelchTTest _),
    // bounded-round 3-core peel with per-row convergence certificate
    "q168_kcore" -> (Graph.q168KCore _),
    // degree assortativity (Pearson over edge endpoint degrees)
    "q169_assortativity" -> (Graph.q169Assortativity _),
    // link prediction: common-neighbor / Jaccard / resource-allocation
    "q170_link_predict" -> (Graph.q170LinkPredict _),
    // cheapest weighted path from a brand seed set (bounded Bellman-Ford)
    "q171_cheapest_path" -> (Graph.q171CheapestPath _),
    // perceptual-hash image dedup (real decode -> dHash -> Hamming bands)
    "q172_phash_dedup" -> (Multimodal.q172PhashDedup _),
    // Kaplan-Meier time-to-first-error survival curve (right-censored)
    "q173_kaplan_meier" -> (EventOps.q173KaplanMeier _),
    // Benjamini-Hochberg FDR over per-segment conversion chi-squared
    "q174_bh_fdr" -> (EventOps.q174BhFdr _),
    // Wald SPRT hourly conversion monitor (sequential decision curve)
    "q175_sprt_monitor" -> (EventOps.q175SprtMonitor _),
    // bipartite HITS: customer hubs -> part authorities
    "q176_hits" -> (Graph.q176Hits _),
    // Newman-Girvan modularity of the brand partition
    "q177_modularity" -> (Graph.q177Modularity _),
    // Fellegi-Sunter log-odds match weights over the q122 candidates
    "q178_fellegi_sunter" -> (Audit.q178FellegiSunter _),
    // stream-maintained banded LSH index ≡ batch-built (q63 discipline)
    "q179_stream_lsh_index" -> (Dedup.q179StreamLshIndex _),
    // end-to-end entity resolution: FS threshold → CC → canonical record
    "q180_entity_rollup" -> (Audit.q180EntityRollup _),
    // label-propagation communities (deterministic synchronous LPA)
    "q181_lpa_communities" -> (Graph.q181Communities _),
    // modularity of the DISCOVERED partition (q181 ∘ q177)
    "q182_lpa_modularity" -> (Graph.q182LpaModularity _),
    // distributed full-corpus integer k-means (Lloyd) assignment
    "q183_kmeans_assign" -> (Cluster.q183KmeansAssign _),
    // personalized PageRank: teleport restarts at the smallest brand's parts
    "q184_personalized_pagerank" -> (Graph.q184PersonalizedPageRank _),
    // GraphSAGE-style deterministic 2-hop neighbor sampling
    "q185_neighbor_sample" -> (Graph.q185NeighborSample _),
    // stream-maintained IVF layout: foreachBatch append → tombstone
    // compaction → stream≡batch audit (the q179 template on vectors)
    "q186_stream_ivf_index" -> (Similarity.q186StreamIvfIndex _),
    // documented-approximate heavy hitters: fixed-capacity space-saving
    // with per-item error bounds (rows-only; bracket/containment
    // guarantees spec-gated against exact counts). MUST STAY rows-only:
    // under saturation the emitted items AND cnt_est depend on
    // partial-aggregate merge order (task completion order), so output
    // rows are nondeterministic RUN-TO-RUN on identical data — any
    // future hash/golden-row gate pointed here would flake, not fail
    // deterministically
    "q187_approx_heavy_hitters" -> (TextAnalysis.q187ApproxHeavyHitters _),
    // type-widening schema evolution (INT→BIGINT / FLOAT→DOUBLE
    // reconciliation across snapshot generations — q150's other half)
    "q188_type_widening" -> (InferOps.q188TypeWidening _),
    // stream-maintained SCALED IVF under a frozen two-level codebook
    // artifact (the q186 lifecycle past the flat driver-fit ceiling)
    "q189_stream_scaled_ivf" -> (Similarity.q189StreamScaledIvf _),
    "q190_semdedup_scaled_cells" -> (Dedup.q190SemDedupScaledCells _)
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.q01Sql,
    "q02_scan_revenue" -> Relational.q02Sql,
    "q03_segment_revenue" -> Relational.q03Sql,
    "q04_region_brand" -> Relational.q04Sql,
    "q05_topk_per_group" -> Relational.q05Sql,
    "q06_running_window" -> Relational.q06Sql,
    "q07_set_ops" -> Relational.q07Sql,
    "q08_sort_limit" -> Relational.q08Sql,
    "q09_rollup" -> Relational.q09Sql,
    "q10_distinct_agg" -> Relational.q10Sql,
    "q11_semi_anti" -> Relational.q11Sql,
    "q16_cube" -> Relational.q16Sql,
    "q17_grouping_sets" -> Relational.q17Sql,
    "q38_approx_distinct" -> Relational.q38Sql,
    "q39_vector_stats" -> Similarity.q39Sql,
    "q18_interval_join" -> Relational.q18Sql,
    "q19_pivot" -> Relational.q19Sql,
    "q44_percentiles" -> Relational.q44Sql,
    "q46_window_suite" -> Relational.q46Sql,
    "q47_string_fns" -> Relational.q47Sql,
    "q48_date_fns" -> Relational.q48Sql,
    "q49_math_fns" -> Relational.q49Sql,
    "q50_bag_setops" -> Relational.q50Sql,
    "q55_moving_window" -> Relational.q55Sql,
    "q59_grouped_topk" -> Relational.q59Sql,
    "q56_correlated_subquery" -> Relational.q56Sql,
    "q12_json_extract" -> EventOps.q12Sql,
    "q66_map_fns" -> EventOps.q66Sql,
    "q13_hourly_tumbling" -> EventOps.q13Sql,
    "q14_asof_last_signup" -> EventOps.q14Sql,
    "q15_sessionize" -> EventOps.q15Sql,
    "q20_dedup_exact" -> Dedup.q20Sql,
    "q21_dedup_fingerprint" -> TextAnalysis.q21Sql,
    "q23_dedup_ngram_jaccard" -> Dedup.q23Sql,
    "q25_embedding_neardup" -> Dedup.q25Sql,
    "q40_dedup_apply" -> Dedup.q40Sql,
    "q54_corpus_pipeline" -> CorpusPipeline.q54Sql,
    "q26_knn_brute" -> Similarity.q26Sql,
    "q61_approx_recall" -> RecallGates.q61Sql,
    "q28_lang_id" -> TextAnalysis.q28Sql,
    "q60_lang_id_ngram" -> TextAnalysis.q60Sql,
    "q29_text_quality" -> TextAnalysis.q29Sql,
    "q30_token_count" -> TextAnalysis.q30Sql,
    "q53_heavy_hitters" -> TextAnalysis.q53Sql,
    "q31_multimodal_meta" -> Multimodal.q31Sql,
    "q32_schema_infer" -> InferOps.q32Sql,
    "q33_csv_roundtrip" -> InferOps.q33Sql,
    "q34_stream_tumbling" -> StreamingOps.q34Sql,
    "q43_stream_stateful" -> StreamingOps.q43Sql,
    "q58_stream_stream_join" -> StreamingOps.q58Sql,
    "q62_stream_session" -> StreamingOps.q62Sql,
    "q63_stream_dedup" -> StreamingOps.q63Sql,
    "q64_stream_sliding" -> StreamingOps.q64Sql,
    "q68_stream_late_data" -> StreamingOps.q68Sql,
    "q65_sketch_error" -> RecallGates.q65Sql,
    "q41_rolling_fingerprint" -> TextAnalysis.q41Sql,
    "q42_frame_sample" -> Multimodal.q42Sql,
    "q45_resize_features" -> Multimodal.q45Sql,
    "q35_xlsx_roundtrip" -> InferOps.q35Sql,
    "q36_jdbc_roundtrip" -> InferOps.q36Sql,
    "q51_jsonl_roundtrip" -> InferOps.q51Sql,
    "q57_partition_prune" -> InferOps.q57Sql,
    "q52_orc_roundtrip" -> InferOps.q52Sql,
    "q67_compaction" -> InferOps.q67Sql,
    "q69_skew_join" -> SkewJoin.q69Sql,
    "q70_dup_ngrams" -> TextAnalysis.q70Sql,
    "q73_pii_redact" -> TextAnalysis.q73Sql,
    "q71_contamination" -> Curation.q71Sql,
    "q72_stratified_sample" -> Curation.q72Sql,
    "q74_domain_mix" -> Curation.q74Sql,
    "q76_dedup_clusters" -> Curation.q76Sql,
    "q75_binary_ingest" -> Multimodal.q75Sql,
    "q77_bloom_join" -> BloomJoin.q77Sql,
    "q78_tfidf_terms" -> TextAnalysis.q78Sql,
    "q79_bigram_nll" -> TextAnalysis.q79Sql,
    "q80_incremental_dedup" -> Dedup.q80Sql,
    "q81_weighted_sample" -> Curation.q81Sql,
    "q82_zorder_layout" -> ZOrder.q82Sql,
    "q83_containment" -> Dedup.q83Sql,
    "q84_merge_upsert" -> MergeOps.q84Sql,
    "q85_scd2_history" -> MergeOps.q85Sql,
    "q86_transform_with_state" -> StreamingOps.q86Sql,
    "q87_streaming_upsert" -> StreamingOps.q87Sql,
    "q88_vocab_coverage" -> TextAnalysis.q88Sql,
    "q90_substr_stats" -> Dedup.q90Sql,
    "q91_substr_remove" -> Dedup.q91Sql,
    "q92_semantic_dedup" -> Dedup.q92Sql,
    "q93_seq_packing" -> Curation.q93Sql,
    "q94_cluster_keep_best" -> Curation.q94Sql,
    "q95_leakage_safe_split" -> Curation.q95Sql,
    "q97_bm25_topk" -> Retrieval.q97Sql,
    "q98_incremental_agg" -> MergeOps.q98Sql,
    "q99_bpe_pairs" -> Bpe.q99Sql,
    "q100_shard_assign" -> Curation.q100Sql,
    "q101_table_stats" -> Analyze.q101Sql,
    "q102_funnel" -> EventOps.q102Sql,
    "q103_retention" -> EventOps.q103Sql,
    "q104_event_transitions" -> EventOps.q104Sql,
    "q105_trend_regression" -> Analyze.q105Sql,
    "q106_drift_psi" -> Analyze.q106Sql,
    "q107_outlier_mad" -> Analyze.q107Sql,
    "q109_stream_static_join" -> StreamingOps.q109Sql,
    "q110_temperature_mix" -> Curation.q110Sql,
    "q111_path_anomaly" -> EventOps.q111Sql,
    "q112_histogram_equidepth" -> Analyze.q112Sql,
    "q113_vocab_overlap" -> TextAnalysis.q113Sql,
    "q114_prefix_join" -> Dedup.q114Sql,
    "q115_char_entropy" -> TextAnalysis.q115Sql,
    "q116_gap_fill" -> EventOps.q116Sql,
    "q117_skyline" -> Analyze.q117Sql,
    "q118_cusum" -> Analyze.q118Sql,
    "q119_pmi_collocations" -> TextAnalysis.q119Sql,
    "q120_doc_chunking" -> Audit.q120Sql,
    "q121_embedding_covariance" -> Audit.q121Sql,
    "q122_entity_resolution" -> Audit.q122Sql,
    "q123_source_balance" -> Audit.q123Sql,
    "q124_ngram_novelty" -> Audit.q124Sql,
    "q125_stationary_dist" -> EventOps.q125Sql,
    "q126_zipf_fit" -> VocabStats.q126Sql,
    "q127_token_coverage" -> VocabStats.q127Sql,
    "q128_sketch_rollup" -> Analyze.q128Sql,
    "q129_pit_join" -> MergeOps.q129Sql,
    "q130_association_rules" -> EventOps.q130Sql,
    "q131_score_calibration" -> Audit.q131Sql,
    "q132_stream_topk" -> StreamingOps.q132Sql,
    "q133_burstiness" -> EventOps.q133Sql,
    "q134_bpe_gate" -> Bpe.q134Sql,
    "q135_cosine_join" -> SparseSim.q135Sql,
    "q136_attribution" -> EventOps.q136Sql,
    "q137_semdedup_cell" -> Dedup.q137Sql,
    "q143_semdedup_multiprobe" -> Dedup.q143Sql,
    "q144_ivf_append" -> Similarity.q144Sql,
    "q138_attribution_models" -> EventOps.q138Sql,
    "q139_integrity_audit" -> Integrity.q139Sql,
    "q140_ks_drift" -> Analyze.q140Sql,
    "q141_stream_drift" -> StreamingOps.q141Sql,
    "q142_signal_agreement" -> Analyze.q142Sql,
    "q145_nb_classifier" -> Classify.q145Sql,
    "q146_hybrid_rrf" -> Retrieval.q146Sql,
    "q147_audio_meta" -> Multimodal.q147Sql,
    "q148_pagerank" -> Graph.q148Sql,
    "q149_importance_weights" -> Curation.q149Sql,
    "q150_schema_evolution" -> InferOps.q150Sql,
    "q151_repetition_filter" -> TextAnalysis.q151Sql,
    "q152_hard_negatives" -> Similarity.q152Sql,
    "q153_snapshot_diff" -> MergeOps.q153Sql,
    "q154_phrase_search" -> Retrieval.q154Sql,
    "q155_int8_quant" -> Similarity.q155Sql,
    "q156_curriculum_order" -> Curation.q156Sql,
    "q157_knn_int8" -> Similarity.q157Sql,
    "q158_bfs_hops" -> Graph.q158Sql,
    "q159_triangle_count" -> Graph.q159Sql,
    "q160_connected_components" -> Graph.q160Sql,
    "q161_cuped" -> EventOps.q161Sql,
    "q162_weak_labels" -> Classify.q162Sql,
    "q163_conversion_test" -> EventOps.q163Sql,
    "q164_mann_whitney" -> EventOps.q164Sql,
    "q165_weighted_pagerank" -> Graph.q165Sql,
    "q166_lsh_compaction" -> Dedup.q166Sql,
    "q167_welch_ttest" -> EventOps.q167Sql,
    "q168_kcore" -> Graph.q168Sql,
    "q169_assortativity" -> Graph.q169Sql,
    "q170_link_predict" -> Graph.q170Sql,
    "q171_cheapest_path" -> Graph.q171Sql,
    "q172_phash_dedup" -> Multimodal.q172Sql,
    "q173_kaplan_meier" -> EventOps.q173Sql,
    "q174_bh_fdr" -> EventOps.q174Sql,
    "q175_sprt_monitor" -> EventOps.q175Sql,
    "q176_hits" -> Graph.q176Sql,
    "q177_modularity" -> Graph.q177Sql,
    "q178_fellegi_sunter" -> Audit.q178Sql,
    "q179_stream_lsh_index" -> Dedup.q179Sql,
    "q180_entity_rollup" -> Audit.q180Sql,
    "q181_lpa_communities" -> Graph.q181Sql,
    "q182_lpa_modularity" -> Graph.q182Sql,
    "q183_kmeans_assign" -> Cluster.q183Sql,
    "q184_personalized_pagerank" -> Graph.q184Sql,
    "q185_neighbor_sample" -> Graph.q185Sql,
    "q186_stream_ivf_index" -> Similarity.q186Sql,
    "q188_type_widening" -> InferOps.q188Sql,
    "q189_stream_scaled_ivf" -> Similarity.q189Sql,
    "q190_semdedup_scaled_cells" -> Dedup.q190Sql
  )
}
