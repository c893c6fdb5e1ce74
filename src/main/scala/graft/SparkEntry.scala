package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ann.Ann
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.operators.{Events, Relational}
import graft.text.TextAnalysis

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) / §7 (plan). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational core (Presto SQL surface)
    "q01_agg_groupby" -> (Relational.q01 _),
    "q02_filter_project" -> (Relational.q02 _),
    "q03_join_inner" -> (Relational.q03 _),
    "q04_join_outer" -> (Relational.q04 _),
    "q05_join_semi" -> (Relational.q05 _),
    "q06_join_anti" -> (Relational.q06 _),
    "q07_star_join" -> (Relational.q07 _),
    "q08_agg_distinct" -> (Relational.q08 _),
    "q09_approx_distinct" -> (Relational.q09 _),
    "q10_percentile" -> (Relational.q10 _),
    "q11_window_rank" -> (Relational.q11 _),
    "q12_window_running" -> (Relational.q12 _),
    "q13_setops" -> (Relational.q13 _),
    "q14_rollup" -> (Relational.q14 _),
    "q15_topn" -> (Relational.q15 _),
    "q16_case_pivot" -> (Relational.q16 _),
    "q17_string_funcs" -> (Relational.q17 _),
    "q18_date_funcs" -> (Relational.q18 _),
    "q19_math_funcs" -> (Relational.q19 _),
    "q20_subquery_scalar" -> (Relational.q20 _),
    "q21_subquery_in" -> (Relational.q21 _),
    "q22_exists_correlated" -> (Relational.q22 _),
    "q23_having" -> (Relational.q23 _),
    "q24_cte" -> (Relational.q24 _),
    "q25_unnest" -> (Relational.q25 _),
    "q26_distinct" -> (Relational.q26 _),
    "q27_nulls_order" -> (Relational.q27 _),
    "q28_cross_join" -> (Relational.q28 _),
    "q29_array_agg" -> (Relational.q29 _),
    "q30_tpch_q6" -> (Relational.q30 _),
    "q31_self_join" -> (Relational.q31 _),
    "q32_conditional_null" -> (Relational.q32 _),
    "q33_json" -> (Relational.q33 _),
    "q34_bitwise" -> (Relational.q34 _),
    "q35_url" -> (Relational.q35 _),
    "q36_width_bucket" -> (Relational.q36 _),
    "q37_map_agg" -> (Relational.q37 _),
    "q38_try_funcs" -> (Relational.q38 _),
    "q39_global_avg_filter" -> (Relational.q39 _),
    "q40_pivot" -> (Relational.q40 _),
    "q41_max_by" -> (Relational.q41 _),
    // Events
    "e01_tumbling_window" -> (Events.tumbling _),
    "e02_sessionize" -> (Events.sessionize _),
    "e03_topk_users" -> (Events.topkUsers _),
    "e04_moving_avg" -> (Events.movingAvg _),
    "e05_funnel" -> (Events.funnel _),
    "e06_sliding_window" -> (Events.sliding _),
    "e07_session_window" -> (Events.sessionWindows _),
    "e08_retention" -> (Events.retention _),
    "e09_anomaly" -> (Events.anomaly _),
    "e10_attribution" -> (Events.attribution _),
    "e11_transitions" -> (Events.transitions _),
    "e12_gap_sketch" -> (Events.gapSketch _),
    "e13_rfm" -> (Events.rfm _),
    "e14_sliding_distinct" -> (Events.slidingDistinct _),
    "e15_conversion_lag" -> (Events.conversionLag _),
    "e16_dwell_time" -> (Events.dwellTime _),
    "e17_burst_detection" -> (Events.burstDetection _),
    "e18_path_mining" -> (Events.pathMining _),
    "e19_conversion_survival" -> (Events.conversionSurvival _),
    "e20_stickiness" -> (Events.stickiness _),
    // Text analysis
    "t01_langid" -> (TextAnalysis.langid _),
    "t02_quality_score" -> (TextAnalysis.quality _),
    "t03_token_count" -> (TextAnalysis.tokens _),
    "t04_fingerprint" -> (TextAnalysis.fingerprint _),
    "t05_normalize" -> (TextAnalysis.normalize _),
    "t06_bigrams" -> (TextAnalysis.bigrams _),
    "t07_repetition" -> ((s: SparkSession, d: String) => TextAnalysis.repetition(s, d)),
    "t08_pii_redact" -> ((s: SparkSession, d: String) => TextAnalysis.piiRedact(s, d)),
    "t09_tfidf" -> (TextAnalysis.tfidf _),
    "t10_unigram_lm" -> (TextAnalysis.unigramLm _),
    "t11_gopher_quality" -> (TextAnalysis.gopherQuality _),
    "t12_bm25" -> (TextAnalysis.bm25 _),
    "t13_zipf" -> (TextAnalysis.zipfSlope _),
    "t14_entropy" -> (TextAnalysis.entropy _),
    "t15_bpe_pairs" -> (TextAnalysis.bpePairs _),
    "t16_scripts" -> (TextAnalysis.scripts _),
    "t17_readability" -> (TextAnalysis.readability _),
    "t18_normalize_unicode" -> (TextAnalysis.normalizeUnicodeReport _),
    "t19_bigram_lm" -> (TextAnalysis.bigramLm _),
    "t20_keywords" -> (TextAnalysis.keywords _),
    "t21_bpe_train" -> (TextAnalysis.bpeTrain _),
    "t22_bpe_encode" -> (TextAnalysis.bpeEncode _),
    "t23_quality_lr" -> (TextAnalysis.qualityLr _),
    "t24_ccnet_buckets" -> (TextAnalysis.ccnetBuckets _),
    "t25_dsir" -> (TextAnalysis.dsir _),
    "t26_blocklist" -> (TextAnalysis.blocklist _),
    // Dedup
    "d01_dedup_exact" -> (Dedup.exact _),
    "d02_dedup_minhash" -> (Dedup.minhashLsh _),
    "d03_dedup_simhash" -> (Dedup.simhash _),
    "d04_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "d05_dedup_embedding" -> (Dedup.embeddingDedup _),
    "d06_dedup_clusters" -> (Dedup.minhashClusters _),
    "c01_curation" -> (graft.pipeline.Curation.curate _),
    "c02_corpus_stats" -> (graft.pipeline.Curation.corpusStats _),
    "c03_full_curation" -> (graft.pipeline.Curation.fullCuration _),
    "c04_data_quality" -> (graft.pipeline.Curation.dataQuality _),
    "d07_contamination" -> (Dedup.contamination _),
    "d08_chunk_dedup" -> ((s: SparkSession, d: String) => Dedup.chunkDedup(s, d)),
    "d09_minhash_est" -> (Dedup.minhashEstimate _),
    "d10_winnowing" -> (Dedup.winnowing _),
    "d11_url_dedup" -> (Dedup.urlDedup _),
    "d12_bloom_contamination" -> (Dedup.bloomContamination _),
    "d13_span_dedup" -> (Dedup.spanDedup _),
    "d14_boilerplate" -> (Dedup.boilerplate _),
    "d15_containment" -> (Dedup.containment _),
    "d16_lsh_curve" -> (Dedup.lshCurve _),
    "p01_split" -> (graft.pipeline.Splits.splitReport _),
    "p02_stratified_cap" -> ((s: SparkSession, d: String) => graft.pipeline.Splits.stratifiedCap(s, d)),
    "p03_upsert" -> (graft.pipeline.Incremental.upsertReport _),
    "p04_incremental_dedup" -> (graft.pipeline.Incremental.incrementalDedup _),
    "p05_shard_pack" -> ((s: SparkSession, d: String) => graft.pipeline.Splits.shardPack(s, d)),
    "p06_global_shuffle" -> ((s: SparkSession, d: String) => graft.pipeline.Splits.globalShuffle(s, d)),
    "p07_mixture" -> (graft.pipeline.Splits.mixture _),
    "p08_split_leakage" -> (graft.pipeline.Splits.splitLeakage _),
    "p09_curriculum" -> (graft.pipeline.Splits.curriculum _),
    "p10_pack_sequences" -> ((s: SparkSession, d: String) => graft.pipeline.Splits.packSequences(s, d)),
    "p11_temperature_mix" -> (graft.pipeline.Splits.temperatureMixture _),
    "p12_incremental_rollup" -> (graft.pipeline.Incremental.incrementalRollup _),
    "p13_epoch_mix" -> (graft.pipeline.Splits.epochMixture _),
    "p14_token_budget" -> (graft.pipeline.Splits.tokenBudgetMixture _),
    "p16_snapshot_diff" -> (graft.pipeline.Incremental.snapshotDiff _),
    "p15_reservoir_sample" -> ((s: SparkSession, d: String) =>
      graft.pipeline.Splits.reservoirSample(s, d)),
    "q42_promo_ratio" -> (Relational.q42 _),
    "q43_window_dist" -> (Relational.q43 _),
    "q44_stats_agg" -> (Relational.q44 _),
    "q45_interval" -> (Relational.q45 _),
    "q47_like_patterns" -> (Relational.q47 _),
    "q48_nested_agg" -> (Relational.q48 _),
    "q49_values_join" -> (Relational.q49 _),
    "q50_edit_distance" -> (Relational.q50 _),
    "q51_bool_agg" -> (Relational.q51 _),
    "q52_regr" -> (Relational.q52 _),
    "q53_window_frame" -> (Relational.q53 _),
    "q54_setops_all" -> (Relational.q54 _),
    "q55_higher_order" -> (Relational.q55 _),
    "q56_cube" -> (Relational.q56 _),
    "q57_cust_dist" -> (Relational.q57 _),
    "q58_nation_volume" -> (Relational.q58 _),
    "q59_or_of_ands" -> (Relational.q59 _),
    "q60_base_convert" -> (Relational.q60 _),
    "q61_string_agg" -> (Relational.q61 _),
    "q62_string_parts" -> (Relational.q62 _),
    "q63_calendar" -> (Relational.q63 _),
    "q64_trig_math" -> (Relational.q64 _),
    "q65_array_funcs" -> (Relational.q65 _),
    "q66_regex" -> (Relational.q66 _),
    "q67_char_predicates" -> (Relational.q67 _),
    "q68_histogram" -> (Relational.q68 _),
    "q69_min_supplier" -> (Relational.q69 _),
    "q70_multi_exists" -> (Relational.q70 _),
    "q71_range_frame" -> (Relational.q71 _),
    "q72_unpivot" -> (Relational.q72 _),
    "q73_date_spine" -> (Relational.q73 _),
    "q74_null_safe_join" -> (Relational.q74 _),
    "q75_bit_agg" -> (Relational.q75 _),
    "q76_grouping_sets" -> (Relational.q76 _),
    "q77_latest_per_key" -> (Relational.q77 _),
    "q78_tpch_q8" -> (Relational.q78 _),
    "q79_tpch_q10" -> (Relational.q79 _),
    "q80_tpch_q16" -> (Relational.q80 _),
    "q81_tpch_q20" -> (Relational.q81 _),
    "q82_lag_defaults" -> (Relational.q82 _),
    "q83_json_arrays" -> (Relational.q83 _),
    "q84_explode_outer" -> (Relational.q84 _),
    "q85_timezone" -> (Relational.q85 _),
    "q86_tpch_q11" -> (Relational.q86 _),
    "q87_ratio_to_report" -> (Relational.q87 _),
    "q88_width_bucket_array" -> (Relational.q88 _),
    "q89_unixtime" -> (Relational.q89 _),
    "q90_hashes" -> (Relational.q90 _),
    "q91_checksum" -> (Relational.q91 _),
    "q92_approx_topk" -> (Relational.q92 _),
    "q93_correlated_scalar" -> (Relational.q93 _),
    "q94_tpch_q9" -> (Relational.q94 _),
    "q95_tpch_q12" -> (Relational.q95 _),
    "q96_tpch_q15" -> (Relational.q96 _),
    "q99_map_funcs" -> (Relational.q99 _),
    "q100_seq_zip" -> (Relational.q100 _),
    "q101_struct_minmax" -> (Relational.q101 _),
    "q102_array_setops" -> (Relational.q102 _),
    "q103_decimal_exact" -> (Relational.q103 _),
    "q104_approx_percentile" -> (Relational.q104 _),
    "q105_conditional_scalars" -> (Relational.q105 _),
    "q106_sketch_merge" -> (Relational.q106 _),
    "q107_geomean" -> (Relational.q107 _),
    "q108_tablesample" -> (Relational.q108 _),
    "q109_wilson" -> (Relational.q109 _),
    "q110_ntile" -> (Relational.q110 _),
    "q111_gaps_islands" -> (Relational.q111 _),
    "q112_skew_kurt" -> (Relational.q112 _),
    "q113_multimap" -> (Relational.q113 _),
    "q114_map_union" -> (Relational.q114 _),
    "q115_sketch_quantile" -> (Relational.q115 _),
    "q116_set_union" -> (Relational.q116 _),
    "q117_tpch_q5" -> (Relational.q117 _),
    "q118_tpch_q17" -> (Relational.q118 _),
    "q119_tpch_q18" -> (Relational.q119 _),
    "q120_tpch_q22" -> (Relational.q120 _),
    "q121_tpch_q4" -> (Relational.q121 _),
    "q122_geo_distance" -> (Relational.q122 _),
    "q123_point_in_polygon" -> (Relational.q123 _),
    "q124_bing_tiles" -> (Relational.q124 _),
    "q125_map_transform" -> (Relational.q125 _),
    "q126_map_cosine" -> (Relational.q126 _),
    "q127_st_predicates" -> (Relational.q127 _),
    "q128_geo_measures" -> (Relational.q128 _),
    "q129_tpch_q3" -> (Relational.q129 _),
    "q130_tpch_q7" -> (Relational.q130 _),
    "q131_tpch_q13" -> (Relational.q131 _),
    "q132_tpch_q21" -> (Relational.q132 _),
    "q133_interval_frame" -> (Relational.q133 _),
    "q134_ignore_nulls_fill" -> (Relational.q134 _),
    "q135_rollup_distinct" -> (Relational.q135 _),
    "q136_st_contains" -> (Relational.q136 _),
    "q137_percentile_disc" -> (Relational.q137 _),
    "q138_wkt_front_door" -> (Relational.q138 _),
    "q139_st_accessors" -> (Relational.q139 _),
    "q140_polygon_holes" -> (Relational.q140 _),
    "q141_multipolygon" -> (Relational.q141 _),
    "q142_agg_filter" -> (Relational.q142 _),
    "q143_variant" -> (Relational.q143 _),
    "q144_ordinality" -> (Relational.q144 _),
    // Link-graph curation (crawl-scale PageRank, exact fixed-point)
    "g01_pagerank" -> (graft.graph.LinkGraph.g01 _),
    "g02_hits" -> (graft.graph.LinkGraph.g02 _),
    "g03_triangles" -> (graft.graph.LinkGraph.g03 _),
    "g04_graph_stats" -> (graft.graph.LinkGraph.g04 _),
    "g05_kcore" -> (graft.graph.LinkGraph.g05 _),
    "g06_label_prop" -> (graft.graph.LinkGraph.g06 _),
    "g07_cocitation" -> (graft.graph.LinkGraph.g07 _),
    // Time-series joins (operators Spark lacks, scale topologies)
    "q97_asof_join" -> (graft.operators.AsOfJoin.clickLastView _),
    "q98_range_join" -> (graft.operators.RangeJoin.signupAttribution _),
    // Skew handling (same oracle: the salted join must equal the plain one)
    "x01_skew_plain" -> (graft.operators.SkewJoin.hotJoinPlain _),
    "x02_skew_salted" -> (graft.operators.SkewJoin.hotJoinSalted _),
    "x03_topk_window" -> (graft.operators.TopKPerKey.topkPlain _),
    "x04_topk_partial" -> (graft.operators.TopKPerKey.topkPartial _),
    "x05_bloom_off" -> (graft.operators.RuntimeFilters.bloomOff _),
    "x06_bloom_on" -> (graft.operators.RuntimeFilters.bloomOn _),
    "x07_skew_aqe_off" -> (graft.operators.SkewJoin.hotJoinAqeOff _),
    "x08_skew_aqe_on" -> (graft.operators.SkewJoin.hotJoinAqeOn _),
    // Similarity search
    "a01_knn_brute" -> (Ann.bruteForce _),
    "a02_knn_ivf" -> (Ann.ivf _),
    "a03_knn_join" -> (Ann.knnJoin _),
    "a04_quantize" -> (Ann.quantize _),
    "a05_quantized_recall" -> (Ann.quantizedRecall _),
    "a06_kmeans" -> (Ann.kmeansStep _),
    "a07_semantic_dedup" -> (Ann.semanticDedup _),
    "a08_hamming_recall" -> (Ann.binaryHammingRecall _),
    "a09_kmeans_train" -> (Ann.kmeansTrain _),
    "a10_ivf_trained_recall" -> (Ann.ivfTrainedRecall _),
    "a11_pq" -> (Ann.pqCodes _),
    "a12_nprobe_curve" -> (Ann.nprobeCurve _),
    "a13_ivfpq_recall" -> (Ann.ivfpqRecall _),
    "a14_filtered_knn" -> (Ann.filteredKnn _),
    "a15_ann_persist" -> (Ann.annIndexPersist _),
    "a16_index_update" -> (Ann.annIndexUpdate _),
    "a17_range_search" -> ((s: SparkSession, d: String) => Ann.rangeSearch(s, d)),
    "a18_mips" -> (Ann.mips _),
    // Sources (container/connector paths inside the correctness gate)
    "v01_avro_roundtrip" -> (graft.sources.AvroIo.roundtripReport _),
    "v02_jdbc_roundtrip" -> (graft.sources.Formats.jdbcRoundtripReport _),
    // Multimodal
    "m01_multimodal_meta" -> (Multimodal.features _),
    "m02_multimodal_resize" -> ((s: SparkSession, d: String) => Multimodal.resized(s, d)),
    "m03_frame_sample" -> ((s: SparkSession, d: String) => Multimodal.frameSample(s, d)),
    "m04_perceptual_hash" -> (Multimodal.perceptualHash _),
    "m05_audio_meta" -> (Multimodal.audioMeta _),
    "m06_video_meta" -> (Multimodal.videoMeta _),
    "m07_image_dup_clusters" -> (Multimodal.imageDupClusters _),
    "m08_audio_energy" -> (Multimodal.audioEnergy _),
    "m09_jpeg_quality" -> (Multimodal.jpegQuality _),
    "m10_exif" -> (Multimodal.exifMeta _)
  ) ++ GraftCli.queries ++ // SQL-text front door (s01..)
    // s23: the TPC-H suite as verbatim SQL text (each text's values are
    // pinned three ways: the twin's oracle by reference, the driver's
    // hash compare, and TpchSqlSpec's text == twin row-for-row pin)
    graft.operators.TpchSql.texts.map { case (name, _, text) =>
      name -> ((s: SparkSession, d: String) => GraftCli.sql(s, d, text))
    }.toMap

  /** DuckDB oracle SQL per query (omitted for approximate/heuristic ops →
    * driver records rows-only checks for those). */
  def oracleSql: Map[String, String] = OracleSql.sql ++ GraftCli.oracles ++
    // s23 texts share their DataFrame twin's oracle BY REFERENCE (the s11
    // discipline); Q2 has no twin and its canonical text runs verbatim in
    // DuckDB, so it IS its own oracle.
    graft.operators.TpchSql.twins.map { case (name, twin) =>
      name -> OracleSql.sql(twin)
    } ++ Map(
    "s23_tpch_q02" -> graft.operators.TpchSql.texts
      .find(_._1 == "s23_tpch_q02").get._3,
    // a15 persists the a09-trained index and serves a10's search from
    // the RELOADED artifact — identical report by construction, so the
    // oracle is a10's replay by reference (persistence lossiness would
    // fork the hash).
    "a15_ann_persist" -> OracleSql.sql("a10_ivf_trained_recall"),
    "a01_knn_brute" -> """
      WITH px AS (
        SELECT vec_id AS probe_id, i, CAST(e AS DOUBLE) AS pe
        FROM (SELECT vec_id, unnest(embedding) AS e,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings WHERE vec_id < 5) t
      ), cx AS (
        SELECT vec_id AS cand_id, i, CAST(e AS DOUBLE) AS ce
        FROM (SELECT vec_id, unnest(embedding) AS e,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings) t
      ), pairs AS (
        SELECT probe_id, cand_id,
          CAST(SUM(CAST(pe * ce AS DECIMAL(30,15))) AS DOUBLE) AS dot,
          CAST(SUM(CAST(pe * pe AS DECIMAL(30,15))) AS DOUBLE) AS pp,
          CAST(SUM(CAST(ce * ce AS DECIMAL(30,15))) AS DOUBLE) AS cc
        FROM px JOIN cx ON px.i = cx.i
        GROUP BY probe_id, cand_id
      )
      SELECT probe_id, cand_id, cos_sim, rn FROM (
        SELECT probe_id, cand_id,
          round(dot / (sqrt(pp) * sqrt(cc)), 4) AS cos_sim,
          CAST(row_number() OVER (PARTITION BY probe_id
            ORDER BY round(dot / (sqrt(pp) * sqrt(cc)), 4) DESC, cand_id)
            AS INTEGER) AS rn
        FROM pairs
      ) t WHERE rn <= 10 ORDER BY probe_id, rn""",
    // a17: the a01 pairing with a radius predicate instead of a rank —
    // threshold applied to the ROUNDED similarity on both sides so the
    // decimal-exact accumulation can't fork a borderline match.
    "a17_range_search" -> """
      WITH px AS (
        SELECT vec_id AS probe_id, i, CAST(e AS DOUBLE) AS pe
        FROM (SELECT vec_id, unnest(embedding) AS e,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings WHERE vec_id < 5) t
      ), cx AS (
        SELECT vec_id AS cand_id, i, CAST(e AS DOUBLE) AS ce
        FROM (SELECT vec_id, unnest(embedding) AS e,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings) t
      ), pairs AS (
        SELECT probe_id, cand_id,
          CAST(SUM(CAST(pe * ce AS DECIMAL(30,15))) AS DOUBLE) AS dot,
          CAST(SUM(CAST(pe * pe AS DECIMAL(30,15))) AS DOUBLE) AS pp,
          CAST(SUM(CAST(ce * ce AS DECIMAL(30,15))) AS DOUBLE) AS cc
        FROM px JOIN cx ON px.i = cx.i
        GROUP BY probe_id, cand_id
      ), sims AS (
        SELECT probe_id, cand_id,
          round(dot / (sqrt(pp) * sqrt(cc)), 4) AS cos_sim FROM pairs
      ), m AS (SELECT * FROM sims WHERE cos_sim >= 0.30)
      SELECT probe_id, cand_id, cos_sim,
        COUNT(*) OVER (PARTITION BY probe_id) AS n_matches
      FROM m ORDER BY probe_id, cand_id""",
    // a18: the a01 pairing ranked by raw inner product, plus the
    // norm-augmentation reduction replayed — M² is the corpus max of the
    // decimal-exact squared norms, the augmented cosine is
    // dot/(sqrt(pp)·sqrt(M²)), and both rankings compare ROUNDED values
    // with the cand_id tie-break so accumulation order can't fork ranks.
    "a18_mips" -> """
      WITH px AS (
        SELECT vec_id AS probe_id, i, CAST(e AS DOUBLE) AS pe
        FROM (SELECT vec_id, unnest(embedding) AS e,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings WHERE vec_id < 5) t
      ), cx AS (
        SELECT vec_id AS cand_id, i, CAST(e AS DOUBLE) AS ce
        FROM (SELECT vec_id, unnest(embedding) AS e,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings) t
      ), pairs AS (
        SELECT probe_id, cand_id,
          CAST(SUM(CAST(pe * ce AS DECIMAL(30,15))) AS DOUBLE) AS dot,
          CAST(SUM(CAST(pe * pe AS DECIMAL(30,15))) AS DOUBLE) AS pp,
          CAST(SUM(CAST(ce * ce AS DECIMAL(30,15))) AS DOUBLE) AS cc
        FROM px JOIN cx ON px.i = cx.i
        GROUP BY probe_id, cand_id
      ), m AS (
        SELECT MAX(cc) AS m2 FROM (
          SELECT CAST(SUM(CAST(ce * ce AS DECIMAL(30,15))) AS DOUBLE) AS cc
          FROM cx GROUP BY cand_id) t
      ), r AS (
        SELECT probe_id, cand_id, round(dot, 4) AS ip,
          CAST(row_number() OVER (PARTITION BY probe_id
            ORDER BY round(dot, 4) DESC, cand_id) AS INTEGER) AS rn,
          CAST(row_number() OVER (PARTITION BY probe_id
            ORDER BY round(dot / (sqrt(pp) * sqrt(m2)), 4) DESC, cand_id)
            AS INTEGER) AS rn_aug
        FROM pairs, m
      ), ag AS (
        SELECT probe_id, COUNT(*) AS n_aug_common
        FROM r WHERE rn <= 10 AND rn_aug <= 10 GROUP BY probe_id)
      SELECT r.probe_id AS probe_id, cand_id, ip, rn, n_aug_common
      FROM r JOIN ag ON r.probe_id = ag.probe_id
      WHERE rn <= 10 ORDER BY r.probe_id, rn""",
    // a14: the a01 replay scoped to the probe's label slice — the join
    // carries the label equality beside the element index.
    "a14_filtered_knn" -> """
      WITH px AS (
        SELECT vec_id AS probe_id, label AS plabel, i, CAST(e AS DOUBLE) AS pe
        FROM (SELECT vec_id, label, unnest(embedding) AS e,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings WHERE vec_id < 5) t
      ), cx AS (
        SELECT vec_id AS cand_id, label AS clabel, i, CAST(e AS DOUBLE) AS ce
        FROM (SELECT vec_id, label, unnest(embedding) AS e,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings) t
      ), pairs AS (
        SELECT probe_id, plabel AS label, cand_id,
          CAST(SUM(CAST(pe * ce AS DECIMAL(30,15))) AS DOUBLE) AS dot,
          CAST(SUM(CAST(pe * pe AS DECIMAL(30,15))) AS DOUBLE) AS pp,
          CAST(SUM(CAST(ce * ce AS DECIMAL(30,15))) AS DOUBLE) AS cc
        FROM px JOIN cx ON px.i = cx.i AND px.plabel = cx.clabel
        GROUP BY probe_id, plabel, cand_id
      )
      SELECT probe_id, label, cand_id, cos_sim, rn FROM (
        SELECT probe_id, label, cand_id,
          round(dot / (sqrt(pp) * sqrt(cc)), 4) AS cos_sim,
          CAST(row_number() OVER (PARTITION BY probe_id
            ORDER BY round(dot / (sqrt(pp) * sqrt(cc)), 4) DESC, cand_id)
            AS INTEGER) AS rn
        FROM pairs
      ) t WHERE rn <= 10 ORDER BY probe_id, rn"""
  )
}
