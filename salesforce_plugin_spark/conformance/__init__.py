"""Declared conformance queries — the contract checked against the DuckDB
oracle (SURVEY.md §2 "Declared conformance queries" table).

Every capability row in SURVEY §2 (the SOQL surface D1-D21 the reference
forwards to Salesforce's executor, the plugin's own transforms C1-C8 /
B1-B9, and the north-star training-data operators F1-F6) has a query here;
``QUERIES`` maps name → builder(spark, sf_dir) → DataFrame and ``ORACLES``
maps the same name → ANSI SQL DuckDB runs on the same parquet. Names absent
from ``ORACLES`` degrade to the driver's rows-only check (nondeterministic
or non-SQL-expressible ops only).

Determinism discipline (what makes value-hashes match across two engines):

- **Sums over doubles** are cast per-row to DECIMAL first, then summed —
  decimal addition is exact and associative, so partial/final aggregation
  order (Spark) vs sequential scan (DuckDB) cannot diverge. A raw double
  SUM is order-dependent in the last ulp and WILL mismatch.
- **Averages** are computed as ``CAST(decimal_sum AS DOUBLE) / count`` —
  one double divide of identical operands is bit-deterministic.
- **Timestamps** leave the plan as epoch integers (``unix_millis`` /
  ``unix_micros`` ↔ ``epoch_ms`` / ``epoch_us``) or formatted strings,
  never raw timestamp objects, sidestepping ns/µs/ms precision and
  tz-naivety differences between engines. The fixtures' physical unit is
  NOT assumed anywhere — the catalog and streaming source sniff the
  parquet footer (currently ``timestamp[us]``; see FIXTURES.md "Harness
  notes" and tests/test_fixture_precision.py).
- **Every computed column is aliased identically** in the Spark plan and
  the oracle SQL — the driver sorts columns by name before hashing.

Scale posture: each builder is a lazy DataFrame plan (no collect), filters
sit directly on scans so they push into parquet, dimension-side joins are
broadcast, and aggregate plans keep partial aggregation map-side. The same
plans are what bench.py times at sf0.1.
"""

from __future__ import annotations

from salesforce_plugin_spark.conformance._common import (  # noqa: F401
    QueryFn,
    _dec,
    _sumd,
    _flatten_decimal_outputs,
)
from salesforce_plugin_spark.conformance.relational import (  # noqa: F401
    q_scan_project,
    q_filter_compare,
    q_filter_like,
    q_filter_in,
    q_semi_join,
    q_anti_join,
    q_parent_lookup_join,
    q_child_flatten_join,
    q_agg_global,
    q_agg_groupby,
    q_agg_count_distinct,
    q_agg_rollup,
    q_agg_cube,
    q_agg_collect,
    q_agg_percentile,
    q_grouping_sets,
    q_pivot,
    q_unpivot,
    q_agg_having,
    q_tpch_q1,
    q_tpch_q3,
    q_tpch_q5,
    q_tpch_q10,
    q_tpch_q18,
    q_tpch_q6,
    q_tpch_q7,
    q_tpch_q14,
    q_tpch_q19,
    q_tpch_q4,
    q_tpch_q11,
    q_tpch_q13,
    q_tpch_q15,
    q_tpch_q17,
    q_tpch_q21,
    q_tpch_q22,
    q_tpch_q2,
    q_tpch_q9,
    q_tpch_q8,
    q_tpch_q12,
    q_tpch_q16,
    q_tpch_q20,
    q_percent_rank,
    q_sort_limit,
    q_offset_page,
    q_date_parts,
    q_date_range,
    ORACLES as _ORACLES_relational,
)
from salesforce_plugin_spark.conformance.relational2 import (  # noqa: F401
    q_asof_join,
    q_range_join,
    q_ndjson_roundtrip,
    q_csv_roundtrip,
    q_doc_chunks,
    q_embed_quantize,
    q_embed_dedup,
    q_incremental_extract,
    q_bucketed_join,
    q_partitioned_scan,
    q_skew_join,
    q_salted_distinct,
    q_topk_per_group,
    q_set_ops,
    q_embed_ivf,
    q_interval_overlap,
    q_zorder,
    q_zonemap_prune,
    q_scd2_lookup,
    q_hierarchy,
    q_asof_forward,
    q_asof_nearest,
    q_union_evolve,
    q_keyset_page,
    q_ntile,
    q_pivot_margins,
    ORACLES as _ORACLES_relational2,
)
from salesforce_plugin_spark.conformance.soql import (  # noqa: F401
    q_soql_typeof,
    q_soql_front_door,
    q_soql_rollup_having,
    q_soql_date_parts,
    q_soql_relationship,
    q_soql_relationship3,
    q_soql_child_sub,
    q_soql_date_literal,
    q_soql_fiscal,
    q_soql_fields,
    ORACLES as _ORACLES_soql,
)
from salesforce_plugin_spark.conformance.dedup import (  # noqa: F401
    q_coerce_epoch,
    q_newline_scrub,
    q_varchar_truncate,
    q_lowercase_schema_align,
    q_fetch_time_added,
    q_dedup_exact,
    q_dedup_fingerprint,
    q_winnow_fingerprint,
    q_near_dedup,
    q_incremental_dedup,
    q_vocab,
    q_tfidf,
    q_minhash_clusters,
    q_dedup_components,
    q_global_line_dedup,
    q_quality_classifier,
    q_embed_centroids,
    q_kmeans_assign,
    q_kmeans_step,
    q_bigram_fluency,
    q_dedup_components_star,
    q_text_tokens,
    q_lang_id,
    q_quality_score,
    q_pii_redact,
    q_repetition,
    q_contamination,
    q_sample_split,
    q_simhash,
    q_semantic_dedup,
    q_curation_capstone,
    q_span_dedup,
    q_repeated_spans,
    q_lcs_dedup,
    q_blocking_recall,
    q_self_lcs,
    q_minhash_error,
    q_containment,
    q_novelty,
    q_embed_decontaminate,
    q_dup_size_dist,
    ORACLES as _ORACLES_dedup,
)
from salesforce_plugin_spark.conformance.text import (  # noqa: F401
    q_line_clean,
    q_importance_weights,
    q_bm25,
    q_url_dedup,
    q_encoding_repair,
    q_gopher_gate,
    q_bpe_step,
    q_fuzzy_link,
    q_hybrid_rrf,
    q_rerank,
    q_cross_encoder,
    q_distill_quality,
    q_kneser_ney,
    q_collocations,
    q_oov_audit,
    q_golden_records,
    q_cluster_terms,
    q_skipgrams,
    q_term_assoc,
    q_rake,
    q_length_buckets,
    q_vocab_coverage,
    q_token_gini,
    q_surprisal,
    q_source_overlap,
    q_bpe_apply,
    ORACLES as _ORACLES_text,
)
from salesforce_plugin_spark.conformance.vector import (  # noqa: F401
    q_dbscan_hierarchy,
    q_dbscan_tree,
    q_embed_topk,
    q_embed_batch_topk,
    q_cosine_pairs,
    q_jaccard_pairs,
    q_embed_bucket,
    q_kmeans_converged,
    q_dimension_stats,
    q_kmeans_margin,
    q_gram_matrix,
    q_centroid_sim,
    q_rand_proj,
    q_ann_recall,
    q_ndcg,
    q_mutual_nn,
    q_cluster_cohesion,
    q_mmr,
    q_hard_negatives,
    q_knn_classify,
    q_quant_error,
    q_knn_confusion,
    q_dbscan_roles,
    q_dbscan_clusters,
    ORACLES as _ORACLES_vector,
)
from salesforce_plugin_spark.conformance.multimodal import (  # noqa: F401
    q_multimodal_bytes,
    q_json_extract,
    q_multimodal_histogram,
    q_event_window,
    q_event_sliding,
    q_event_session,
    q_multimodal_frames,
    q_multimodal_channels,
    ORACLES as _ORACLES_multimodal,
    q_multimodal_ahash,
    q_bmp_histogram,
    q_jpeg_gray_stats,
    q_png16_stats,
    q_png_adam7_histogram,
    q_png_histogram,
    q_png_lowdepth_stats,
    q_png_palette_histogram,
    q_png_resize,
    q_wav_channels,
    q_bmp_ahash,
    q_bmp_resize,
)
from salesforce_plugin_spark.conformance.graph import (  # noqa: F401
    q_pagerank,
    q_triangles,
    q_power_step,
    q_power_converged,
    q_pca_project,
    q_neighbor_agg,
    q_label_prop,
    q_degree_dist,
    q_kcore,
    q_khop,
    q_hits,
    q_wpagerank,
    q_sssp,
    q_louvain_step,
    q_ppr,
    q_random_walk,
    q_link_predict,
    q_component_sizes,
    q_assortativity,
    q_modularity,
    ORACLES as _ORACLES_graph,
)
from salesforce_plugin_spark.conformance.sketch import (  # noqa: F401
    q_kmv_distinct,
    q_kmv_setops,
    q_quantile_sketch,
    q_heavy_hitters,
    q_join_size_est,
    q_feature_bins,
    q_bloom_prune,
    q_grouped_quantiles,
    q_percentile_normalize,
    q_iqr_outliers,
    q_distribution_drift,
    q_ks_test,
    q_winsorize,
    q_rolling_quantiles,
    q_cm_error,
    q_hll,
    q_quantile_error,
    ORACLES as _ORACLES_sketch,
)
from salesforce_plugin_spark.conformance.analytics import (  # noqa: F401
    q_user_growth,
    q_anomaly_zscore,
    q_funnel,
    q_retention,
    q_session_paths,
    q_copurchase,
    q_itemcf,
    q_resample_ffill,
    q_rolling_metrics,
    q_key_skew,
    q_class_balance,
    q_date_dimension,
    q_debounce,
    q_throttle,
    q_disorder,
    q_contribution,
    q_attribution,
    q_activity_bitmap,
    q_attribution_first,
    q_attribution_last,
    q_decayed_score,
    q_rolling_wau,
    q_trajectories,
    q_weighted_median,
    q_bootstrap,
    q_cusum,
    q_changepoint,
    q_monitoring_capstone,
    q_autocorr,
    q_user_features,
    q_rank_corr,
    q_trend,
    q_target_encoding,
    q_markov,
    q_interarrival,
    q_minmax_scale,
    q_funnel_latency,
    q_mad_outliers,
    q_rank_movers,
    q_leadlag,
    q_theil_sen,
    q_fano,
    q_dow_profile,
    q_coverage_gaps,
    q_seasonal_anomaly,
    ORACLES as _ORACLES_analytics,
    q_assoc_rules,
    q_wilson,
    q_abtest,
    q_calibration,
)
from salesforce_plugin_spark.conformance.pipeline import (  # noqa: F401
    q_sample_per_group,
    q_token_pack,
    q_profile,
    q_object_extract,
    q_schema_reconcile,
    q_training_corpus,
    q_training_sequences,
    q_training_decontaminated,
    q_corpus_mix,
    q_data_quality,
    q_unique_keys,
    q_scd2,
    q_scd2_incremental,
    q_cdc_merge,
    q_weighted_sample,
    q_negative_sampling,
    q_snapshot_diff,
    q_fk_audit,
    q_budget_sample,
    q_fd_audit,
    q_kanonymity,
    q_benford,
    q_surrogate_keys,
    q_star_load,
    q_incremental_rollup,
    q_quality_gate,
    q_manifest,
    q_epoch_shuffle,
    q_kfold,
    q_chat_render,
    q_temperature_mix,
    q_stratified_sample,
    q_erasure_audit,
    ORACLES as _ORACLES_pipeline,
)
from salesforce_plugin_spark.conformance.streaming import (  # noqa: F401
    q_stream_near_dedup,
    q_stream_window,
    q_stream_dedup,
    q_stream_stateful,
    q_stream_upsert,
    q_stream_join,
    q_stream_scd2,
    q_stream_kmv,
    q_stream_heavy_hitters,
    q_stream_quantiles,
    q_stream_rolling_wau,
    q_stream_cusum,
    q_stream_interarrival,
    q_stream_class_balance,
    q_stream_vocab_coverage,
    q_stream_user_growth,
    q_stream_rolling_quantiles,
    q_stream_fano,
    q_stream_dow,
    q_stream_hll,
    q_stream_wilson,
    q_stream_abtest,
    q_stream_calibration,
    q_stream_zscore,
    q_stream_kanonymity,
    q_stream_changepoint,
    q_stream_ks,
    q_stream_benford,
    q_stream_itemcf,
    q_stream_gram_power,
    q_stream_autocorr,
    q_stream_kneser_ney,
    q_stream_repeated_spans,
    q_stream_distill,
    q_stream_theil_sen,
    q_stream_temperature_mix,
    ORACLES as _ORACLES_streaming,
)

QUERIES: dict[str, QueryFn] = {
    # --- driver-graded window (first 50): one per §2 family, ROTATED
    # each round (VERDICT r7 #5): where a family has multiple oracle-gated
    # representatives, a never-driver-verified one leads this round so the
    # official gate accumulates independent coverage over the full registry
    # (round 8 rotated 24 fresh entries in; displaced entries moved to the
    # fresh entry's old slot beyond the window — same keys, same oracles,
    # nothing removed) ---
    # D1-D19: the relational surface the reference forwards to SOQL
    "q_soql_fiscal": q_soql_fiscal,
    "q_cusum": q_cusum,
    "q_grouping_sets": q_grouping_sets,
    "q_itemcf": q_itemcf,
    "q_resample_ffill": q_resample_ffill,
    "q_key_skew": q_key_skew,
    "q_date_dimension": q_date_dimension,
    "q_span_dedup": q_span_dedup,
    "q_sample_split": q_sample_split,
    "q_kmeans_assign": q_kmeans_assign,
    "q_degree_dist": q_degree_dist,
    "q_khop": q_khop,
    "q_hits": q_hits,
    "q_png_resize": q_png_resize,
    "q_png_palette_histogram": q_png_palette_histogram,
    "q_png16_stats": q_png16_stats,
    "q_png_lowdepth_stats": q_png_lowdepth_stats,
    "q_png_adam7_histogram": q_png_adam7_histogram,
    "q_profile": q_profile,
    "q_sample_per_group": q_sample_per_group,
    "q_snapshot_diff": q_snapshot_diff,
    # D via the SOQL string front door (parser → DataFrame plans)
    "q_soql_relationship3": q_soql_relationship3,
    "q_partitioned_scan": q_partitioned_scan,
    # C: the plugin's own row/column transforms
    "q_coerce_epoch": q_coerce_epoch,
    "q_newline_scrub": q_newline_scrub,
    "q_zonemap_prune": q_zonemap_prune,
    "q_tfidf": q_tfidf,
    # B: schema reconciliation (full two-load DDL lifecycle + alignment)
    "q_schema_reconcile": q_schema_reconcile,
    "q_asof_nearest": q_asof_nearest,
    # A: sink round-trip + semi-structured extraction (csv variant after
    # the window; its C4 scrub is gated by q_newline_scrub here)
    "q_doc_chunks": q_doc_chunks,
    "q_data_quality": q_data_quality,
    # F1/F2: exact + near dedup
    "q_dedup_fingerprint": q_dedup_fingerprint,
    "q_near_dedup": q_near_dedup,
    "q_bloom_prune": q_bloom_prune,
    "q_grouped_quantiles": q_grouped_quantiles,
    "q_stream_kmv": q_stream_kmv,
    # F3: similarity search
    "q_embed_topk": q_embed_topk,
    "q_scd2_incremental": q_scd2_incremental,
    "q_stream_dow": q_stream_dow,
    # F4: multimodal binary pipelines
    "q_multimodal_ahash": q_multimodal_ahash,
    "q_stream_user_growth": q_stream_user_growth,
    "q_png_histogram": q_png_histogram,
    # F5: text analysis
    "q_lang_id": q_lang_id,
    "q_url_dedup": q_url_dedup,
    # custom operators (SURVEY §4)
    "q_wav_channels": q_wav_channels,
    "q_bpe_step": q_bpe_step,
    # F6: event time — batch, true streaming, E5 upsert
    "q_stream_near_dedup": q_stream_near_dedup,
    "q_hybrid_rrf": q_hybrid_rrf,
    "q_dimension_stats": q_dimension_stats,
    "q_stream_cusum": q_stream_cusum,
    "q_stream_upsert": q_stream_upsert,
    # training-pipeline capstones
    "q_training_corpus": q_training_corpus,
    "q_ndcg": q_ndcg,
    "q_training_sequences": q_training_sequences,
    # --- beyond the graded window: variants and additional forms ---
    "q_ndjson_roundtrip": q_ndjson_roundtrip,
    "q_stream_window": q_stream_window,
    "q_label_prop": q_label_prop,
    "q_cosine_pairs": q_cosine_pairs,
    "q_csv_roundtrip": q_csv_roundtrip,
    "q_agg_having": q_agg_having,
    "q_object_extract": q_object_extract,
    "q_embed_dedup": q_embed_dedup,
    "q_dedup_exact": q_dedup_exact,
    "q_jaccard_pairs": q_jaccard_pairs,
    "q_minhash_clusters": q_minhash_clusters,
    "q_soql_child_sub": q_soql_child_sub,
    "q_embed_batch_topk": q_embed_batch_topk,
    "q_embed_quantize": q_embed_quantize,
    "q_tpch_q1": q_tpch_q1,
    "q_varchar_truncate": q_varchar_truncate,
    "q_text_tokens": q_text_tokens,
    "q_agg_groupby": q_agg_groupby,
    "q_unique_keys": q_unique_keys,
    "q_repetition": q_repetition,
    "q_vocab": q_vocab,
    "q_training_decontaminated": q_training_decontaminated,
    "q_bucketed_join": q_bucketed_join,
    "q_embed_ivf": q_embed_ivf,
    "q_event_window": q_event_window,
    "q_event_sliding": q_event_sliding,
    "q_semi_join": q_semi_join,
    "q_sort_limit": q_sort_limit,
    "q_anti_join": q_anti_join,
    "q_percent_rank": q_percent_rank,
    "q_retention": q_retention,
    "q_pivot": q_pivot,
    "q_unpivot": q_unpivot,
    "q_agg_collect": q_agg_collect,
    "q_agg_percentile": q_agg_percentile,
    "q_json_extract": q_json_extract,
    "q_agg_count_distinct": q_agg_count_distinct,
    "q_agg_rollup": q_agg_rollup,
    "q_date_parts": q_date_parts,
    "q_parent_lookup_join": q_parent_lookup_join,
    "q_date_range": q_date_range,
    "q_scan_project": q_scan_project,
    "q_agg_global": q_agg_global,
    "q_tpch_q3": q_tpch_q3,
    "q_tpch_q5": q_tpch_q5,
    "q_tpch_q10": q_tpch_q10,
    "q_tpch_q18": q_tpch_q18,
    "q_tpch_q6": q_tpch_q6,
    "q_tpch_q7": q_tpch_q7,
    "q_tpch_q14": q_tpch_q14,
    "q_tpch_q19": q_tpch_q19,
    "q_tpch_q4": q_tpch_q4,
    "q_tpch_q8": q_tpch_q8,
    "q_tpch_q12": q_tpch_q12,
    "q_tpch_q16": q_tpch_q16,
    "q_tpch_q20": q_tpch_q20,
    "q_tpch_q11": q_tpch_q11,
    "q_tpch_q13": q_tpch_q13,
    "q_tpch_q15": q_tpch_q15,
    "q_tpch_q17": q_tpch_q17,
    "q_tpch_q21": q_tpch_q21,
    "q_tpch_q22": q_tpch_q22,
    "q_tpch_q2": q_tpch_q2,
    "q_tpch_q9": q_tpch_q9,
    "q_soql_typeof": q_soql_typeof,
    "q_dedup_components": q_dedup_components,
    "q_gopher_gate": q_gopher_gate,
    "q_lowercase_schema_align": q_lowercase_schema_align,
    "q_quality_classifier": q_quality_classifier,
    "q_soql_front_door": q_soql_front_door,
    "q_bigram_fluency": q_bigram_fluency,
    "q_bm25": q_bm25,
    "q_embed_centroids": q_embed_centroids,
    "q_quality_score": q_quality_score,
    "q_kmeans_step": q_kmeans_step,
    "q_embed_bucket": q_embed_bucket,
    "q_filter_compare": q_filter_compare,
    "q_filter_like": q_filter_like,
    "q_set_ops": q_set_ops,
    "q_range_join": q_range_join,
    "q_multimodal_histogram": q_multimodal_histogram,
    "q_rolling_metrics": q_rolling_metrics,
    "q_repeated_spans": q_repeated_spans,
    "q_token_pack": q_token_pack,
    "q_heavy_hitters": q_heavy_hitters,
    "q_soql_date_literal": q_soql_date_literal,
    "q_contamination": q_contamination,
    "q_agg_cube": q_agg_cube,
    "q_winnow_fingerprint": q_winnow_fingerprint,
    "q_simhash": q_simhash,
    "q_kmeans_converged": q_kmeans_converged,
    "q_funnel": q_funnel,
    "q_skew_join": q_skew_join,
    "q_scd2_lookup": q_scd2_lookup,
    "q_encoding_repair": q_encoding_repair,
    "q_soql_date_parts": q_soql_date_parts,
    "q_ann_recall": q_ann_recall,
    "q_kmv_setops": q_kmv_setops,
    "q_scd2": q_scd2,
    "q_semantic_dedup": q_semantic_dedup,
    "q_importance_weights": q_importance_weights,
    "q_stream_stateful": q_stream_stateful,
    "q_kmv_distinct": q_kmv_distinct,
    "q_filter_in": q_filter_in,
    "q_curation_capstone": q_curation_capstone,
    "q_incremental_dedup": q_incremental_dedup,
    "q_stream_heavy_hitters": q_stream_heavy_hitters,
    "q_topk_per_group": q_topk_per_group,
    "q_bmp_ahash": q_bmp_ahash,
    "q_fuzzy_link": q_fuzzy_link,
    "q_stream_quantiles": q_stream_quantiles,
    "q_event_session": q_event_session,
    "q_soql_relationship": q_soql_relationship,
    "q_pivot_margins": q_pivot_margins,
    "q_offset_page": q_offset_page,
    "q_pagerank": q_pagerank,
    "q_power_converged": q_power_converged,
    "q_pca_project": q_pca_project,
    "q_join_size_est": q_join_size_est,
    "q_session_paths": q_session_paths,
    "q_child_flatten_join": q_child_flatten_join,
    "q_feature_bins": q_feature_bins,
    "q_zorder": q_zorder,
    "q_weighted_sample": q_weighted_sample,
    "q_negative_sampling": q_negative_sampling,
    "q_dedup_components_star": q_dedup_components_star,
    "q_user_growth": q_user_growth,
    "q_containment": q_containment,
    "q_line_clean": q_line_clean,
    "q_percentile_normalize": q_percentile_normalize,
    "q_fk_audit": q_fk_audit,
    "q_iqr_outliers": q_iqr_outliers,
    "q_stream_join": q_stream_join,
    "q_class_balance": q_class_balance,
    "q_budget_sample": q_budget_sample,
    "q_hierarchy": q_hierarchy,
    "q_stream_rolling_wau": q_stream_rolling_wau,
    "q_distribution_drift": q_distribution_drift,
    "q_ks_test": q_ks_test,
    "q_fd_audit": q_fd_audit,
    "q_kanonymity": q_kanonymity,
    "q_benford": q_benford,
    "q_copurchase": q_copurchase,
    "q_surrogate_keys": q_surrogate_keys,
    "q_star_load": q_star_load,
    "q_collocations": q_collocations,
    "q_oov_audit": q_oov_audit,
    "q_incremental_rollup": q_incremental_rollup,
    "q_asof_forward": q_asof_forward,
    "q_global_line_dedup": q_global_line_dedup,
    "q_debounce": q_debounce,
    "q_throttle": q_throttle,
    "q_novelty": q_novelty,
    "q_disorder": q_disorder,
    "q_union_evolve": q_union_evolve,
    "q_golden_records": q_golden_records,
    "q_contribution": q_contribution,
    "q_quality_gate": q_quality_gate,
    "q_attribution": q_attribution,
    "q_activity_bitmap": q_activity_bitmap,
    "q_attribution_first": q_attribution_first,
    "q_attribution_last": q_attribution_last,
    "q_epoch_shuffle": q_epoch_shuffle,
    "q_gram_matrix": q_gram_matrix,
    "q_trend": q_trend,
    "q_term_assoc": q_term_assoc,
    "q_embed_decontaminate": q_embed_decontaminate,
    "q_skipgrams": q_skipgrams,
    "q_rank_corr": q_rank_corr,
    "q_user_features": q_user_features,
    "q_triangles": q_triangles,
    "q_soql_fields": q_soql_fields,
    "q_changepoint": q_changepoint,
    "q_monitoring_capstone": q_monitoring_capstone,
    "q_autocorr": q_autocorr,
    "q_bootstrap": q_bootstrap,
    "q_manifest": q_manifest,
    "q_stream_scd2": q_stream_scd2,
    "q_weighted_median": q_weighted_median,
    "q_trajectories": q_trajectories,
    "q_cluster_terms": q_cluster_terms,
    "q_rolling_wau": q_rolling_wau,
    "q_kmeans_margin": q_kmeans_margin,
    "q_neighbor_agg": q_neighbor_agg,
    "q_decayed_score": q_decayed_score,
    "q_stream_dedup": q_stream_dedup,
    "q_kfold": q_kfold,
    "q_target_encoding": q_target_encoding,
    "q_winsorize": q_winsorize,
    "q_rake": q_rake,
    "q_pii_redact": q_pii_redact,
    "q_incremental_extract": q_incremental_extract,
    "q_markov": q_markov,
    "q_chat_render": q_chat_render,
    "q_length_buckets": q_length_buckets,
    "q_interarrival": q_interarrival,
    "q_dup_size_dist": q_dup_size_dist,
    "q_vocab_coverage": q_vocab_coverage,
    "q_centroid_sim": q_centroid_sim,
    "q_rand_proj": q_rand_proj,
    "q_minmax_scale": q_minmax_scale,
    "q_token_gini": q_token_gini,
    "q_source_overlap": q_source_overlap,
    "q_corpus_mix": q_corpus_mix,
    "q_stream_class_balance": q_stream_class_balance,
    "q_stream_vocab_coverage": q_stream_vocab_coverage,
    "q_bmp_resize": q_bmp_resize,
    "q_bpe_apply": q_bpe_apply,
    "q_rolling_quantiles": q_rolling_quantiles,
    "q_keyset_page": q_keyset_page,
    "q_fetch_time_added": q_fetch_time_added,
    "q_stream_interarrival": q_stream_interarrival,
    "q_funnel_latency": q_funnel_latency,
    "q_soql_rollup_having": q_soql_rollup_having,
    "q_stream_rolling_quantiles": q_stream_rolling_quantiles,
    "q_multimodal_channels": q_multimodal_channels,
    "q_anomaly_zscore": q_anomaly_zscore,
    "q_ntile": q_ntile,
    "q_power_step": q_power_step,
    "q_mad_outliers": q_mad_outliers,
    "q_rank_movers": q_rank_movers,
    "q_leadlag": q_leadlag,
    "q_wpagerank": q_wpagerank,
    "q_sssp": q_sssp,
    "q_louvain_step": q_louvain_step,
    "q_component_sizes": q_component_sizes,
    "q_mutual_nn": q_mutual_nn,
    "q_fano": q_fano,
    "q_assortativity": q_assortativity,
    "q_cluster_cohesion": q_cluster_cohesion,
    "q_stream_fano": q_stream_fano,
    "q_modularity": q_modularity,
    "q_dow_profile": q_dow_profile,
    "q_coverage_gaps": q_coverage_gaps,
    "q_seasonal_anomaly": q_seasonal_anomaly,
    "q_cdc_merge": q_cdc_merge,
    # --- round 6 ---
    "q_lcs_dedup": q_lcs_dedup,
    "q_rerank": q_rerank,
    "q_self_lcs": q_self_lcs,
    "q_mmr": q_mmr,
    "q_minhash_error": q_minhash_error,
    "q_theil_sen": q_theil_sen,
    "q_stream_theil_sen": q_stream_theil_sen,
    "q_temperature_mix": q_temperature_mix,
    "q_hard_negatives": q_hard_negatives,
    "q_ppr": q_ppr,
    "q_stream_temperature_mix": q_stream_temperature_mix,
    "q_cm_error": q_cm_error,
    "q_stratified_sample": q_stratified_sample,
    "q_hll": q_hll,
    "q_knn_classify": q_knn_classify,
    "q_assoc_rules": q_assoc_rules,
    "q_surprisal": q_surprisal,
    "q_stream_hll": q_stream_hll,
    "q_quant_error": q_quant_error,
    "q_random_walk": q_random_walk,
    "q_quantile_error": q_quantile_error,
    "q_salted_distinct": q_salted_distinct,
    "q_link_predict": q_link_predict,
    "q_knn_confusion": q_knn_confusion,
    "q_multimodal_bytes": q_multimodal_bytes,
    "q_wilson": q_wilson,
    "q_stream_wilson": q_stream_wilson,
    "q_dbscan_roles": q_dbscan_roles,
    "q_erasure_audit": q_erasure_audit,
    "q_blocking_recall": q_blocking_recall,
    "q_dbscan_clusters": q_dbscan_clusters,
    "q_abtest": q_abtest,
    "q_stream_abtest": q_stream_abtest,
    "q_calibration": q_calibration,
    "q_stream_calibration": q_stream_calibration,
    "q_stream_zscore": q_stream_zscore,
    "q_stream_kanonymity": q_stream_kanonymity,
    "q_stream_changepoint": q_stream_changepoint,
    "q_stream_ks": q_stream_ks,
    "q_stream_benford": q_stream_benford,
    "q_stream_itemcf": q_stream_itemcf,
    "q_stream_gram_power": q_stream_gram_power,
    "q_stream_autocorr": q_stream_autocorr,
    # --- round 7 ---
    "q_cross_encoder": q_cross_encoder,
    "q_distill_quality": q_distill_quality,
    "q_dbscan_hierarchy": q_dbscan_hierarchy,
    "q_dbscan_tree": q_dbscan_tree,
    "q_kneser_ney": q_kneser_ney,
    "q_stream_kneser_ney": q_stream_kneser_ney,
    "q_stream_repeated_spans": q_stream_repeated_spans,
    "q_stream_distill": q_stream_distill,
    # --- round 9: the F4 seam through ACTUAL decode (native BMP/WAV) ---
    "q_multimodal_frames": q_multimodal_frames,
    "q_asof_join": q_asof_join,
    "q_interval_overlap": q_interval_overlap,
    "q_bmp_histogram": q_bmp_histogram,
    "q_jpeg_gray_stats": q_jpeg_gray_stats,
    "q_kcore": q_kcore,
    "q_quantile_sketch": q_quantile_sketch,
}


#: r12 driver-window rotation (VERDICT r11 #9). The driver grades the
#: FIRST 50 registry entries each round; this explicit list IS the r12
#: window, applied as an order-preserving reindex below (every displaced
#: entry keeps its key, builder, and oracle — nothing is removed).
#: Composition: the four formerly hash-red entries stay in place so the
#: driver proves the r12 oracle-class fix (HUGEINT finals → BIGINT,
#: sign-explicit //); 30 never-driver-graded entries rotate in —
#: including the 15 casted HUGEINT-class oracles, the two sign-fixed
#: theil-sen faces, the kmeans floor-form family, and this round's
#: perf-touched heavy operators — plus 16 previously-green anchors.
_R12_WINDOW = [
    # formerly hash-red, fixed this round — must re-grade
    "q_cusum", "q_stream_cusum", "q_key_skew", "q_dimension_stats",
    # never graded: the casted HUGEINT-class oracles
    "q_class_balance", "q_contribution", "q_trend", "q_rank_corr",
    "q_user_features", "q_collocations", "q_distribution_drift",
    "q_fk_audit", "q_gram_matrix", "q_incremental_rollup", "q_novelty",
    "q_oov_audit", "q_percentile_normalize", "q_star_load",
    "q_stream_class_balance",
    # never graded: sign-explicit floor-division fixes
    "q_theil_sen", "q_stream_theil_sen",
    # never graded: r12 perf-touched operators (capstone fusion, kmeans
    # floor form, cosine/eps predicate barriers, KN/distill/louvain)
    "q_curation_capstone", "q_semantic_dedup", "q_importance_weights",
    "q_dbscan_clusters", "q_louvain_step", "q_kneser_ney",
    "q_distill_quality", "q_cluster_terms", "q_kmeans_margin",
    "q_cluster_cohesion", "q_kmeans_step", "q_stream_kneser_ney",
    "q_stream_distill",
    # previously-green anchors
    "q_soql_fiscal", "q_grouping_sets", "q_itemcf", "q_resample_ffill",
    "q_date_dimension", "q_tfidf", "q_near_dedup", "q_embed_topk",
    "q_png_histogram", "q_doc_chunks", "q_data_quality",
    "q_schema_reconcile", "q_scd2_incremental", "q_stream_near_dedup",
    "q_multimodal_ahash", "q_wav_channels",
]
assert len(_R12_WINDOW) == 50 and len(set(_R12_WINDOW)) == 50
assert all(k in QUERIES for k in _R12_WINDOW)
QUERIES = {
    **{k: QUERIES[k] for k in _R12_WINDOW},
    **{k: v for k, v in QUERIES.items() if k not in _R12_WINDOW},
}


QUERIES = {name: _flatten_decimal_outputs(fn) for name, fn in QUERIES.items()}

ORACLES: dict[str, str] = {}
ORACLES.update(_ORACLES_relational)
ORACLES.update(_ORACLES_relational2)
ORACLES.update(_ORACLES_soql)
ORACLES.update(_ORACLES_dedup)
ORACLES.update(_ORACLES_text)
ORACLES.update(_ORACLES_vector)
ORACLES.update(_ORACLES_multimodal)
ORACLES.update(_ORACLES_graph)
ORACLES.update(_ORACLES_sketch)
ORACLES.update(_ORACLES_analytics)
ORACLES.update(_ORACLES_pipeline)
ORACLES.update(_ORACLES_streaming)

# Derived/alias oracles (stream faces reuse their batch counterpart's SQL
# verbatim; they can cross family-module boundaries, so they register here
# after the merge, in their original order):
# the star-method closure computes the identical partition over the
# identical candidate graph — same recursive-CTE oracle by construction
ORACLES["q_dedup_components_star"] = ORACLES["q_dedup_components"]
# Incremental SCD2 apply must equal a from-scratch rebuild over the full
# feed — so its oracle IS the full-feed SCD2 oracle.
ORACLES["q_scd2_incremental"] = ORACLES["q_scd2"]
# Streamed SCD2 maintenance must equal the from-scratch batch rebuild.
ORACLES["q_stream_scd2"] = ORACLES["q_scd2"]
# Incremental LSH dedup must equal the from-scratch full-corpus run.
ORACLES["q_incremental_dedup"] = ORACLES["q_near_dedup"]
# Streamed incremental dedup must also equal the from-scratch run.
ORACLES["q_stream_near_dedup"] = ORACLES["q_near_dedup"]
# Streamed count-min state must equal the batch sketch (additivity).
ORACLES["q_stream_heavy_hitters"] = ORACLES["q_heavy_hitters"]
# the equivalence IS the claim: streamed state must match the batch sketch
ORACLES["q_stream_quantiles"] = ORACLES["q_quantile_sketch"]
# streamed CUSUM == one-shot batch CUSUM over the same rows: reuse the
# batch oracle verbatim (the equivalence IS the claim)
ORACLES["q_stream_cusum"] = ORACLES["q_cusum"]
# streamed set-state rolling distinct == one-shot batch run: reuse the
# batch oracle verbatim (arrival-order-insensitivity is the claim)
ORACLES["q_stream_rolling_wau"] = ORACLES["q_rolling_wau"]
# streamed five-BIGINT carry == one-shot batch stats: reuse the batch
# oracle verbatim (the equivalence is the claim)
ORACLES["q_stream_interarrival"] = ORACLES["q_interarrival"]
# additive / set state == one-shot batch runs: reuse the batch oracles
# verbatim (the equivalence is the claim)
ORACLES["q_stream_class_balance"] = ORACLES["q_class_balance"]
ORACLES["q_stream_vocab_coverage"] = ORACLES["q_vocab_coverage"]
ORACLES["q_stream_user_growth"] = ORACLES["q_user_growth"]
ORACLES["q_stream_rolling_quantiles"] = ORACLES["q_rolling_quantiles"]
ORACLES["q_component_sizes"] = ORACLES["q_dedup_components"].replace(
    "SELECT id AS doc_id, min(r) AS component_id FROM reach GROUP BY id",
    """SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_components,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs
    FROM (
        SELECT c, CAST(count(*) AS BIGINT) AS cluster_size
        FROM (SELECT id, min(r) AS c FROM reach GROUP BY id)
        GROUP BY c
    ) GROUP BY 1""",
)
# streamed additive daily counts == one-shot batch Fano (equivalence)
ORACLES["q_stream_fano"] = ORACLES["q_fano"]
ORACLES["q_stream_dow"] = ORACLES["q_dow_profile"]
# streamed additive (type, day) counts == one-shot batch Theil-Sen
ORACLES["q_stream_theil_sen"] = ORACLES["q_theil_sen"]
# Max-merged streamed HLL registers (with a replayed batch) must equal
# the one-shot batch build — same oracle by construction.
ORACLES["q_stream_hll"] = ORACLES["q_hll"]
# Streamed additive (source, gate-verdict) counts == one-shot batch Wilson.
ORACLES["q_stream_wilson"] = ORACLES["q_wilson"]
# Streamed additive (type, arm, verdict) counts == one-shot batch z-test.
ORACLES["q_stream_abtest"] = ORACLES["q_abtest"]
# Streamed additive (bin, n, Σscore, Σoutcome) sums == one-shot batch curve.
ORACLES["q_stream_calibration"] = ORACLES["q_calibration"]
# Streamed (n, Σq, Σq²) moments scored over the batch scan == one-shot batch z-gate.
ORACLES["q_stream_zscore"] = ORACLES["q_anomaly_zscore"]
# Additive class counts + idempotent (QI, sens) set union == one-shot batch audit.
ORACLES["q_stream_kanonymity"] = ORACLES["q_kanonymity"]
# Streamed additive (type, day) counts -> same split as the batch search.
ORACLES["q_stream_changepoint"] = ORACLES["q_changepoint"]
# Streamed additive per-value (ca, cb) counts -> same KS as the batch test.
ORACLES["q_stream_ks"] = ORACLES["q_ks_test"]
# Streamed additive digit counts -> same audit as the batch scan.
ORACLES["q_stream_benford"] = ORACLES["q_benford"]
# Basket-complete slices: pair supports + item counts fold additively.
ORACLES["q_stream_itemcf"] = ORACLES["q_itemcf"]
# Additive partial Grams: G·v0 from summed state == one-pass X^T(Xv0).
ORACLES["q_stream_gram_power"] = ORACLES["q_power_step"]
# The changepoint face's daily-count state, read out as autocorrelation.
ORACLES["q_stream_autocorr"] = ORACLES["q_autocorr"]
# Composition oracle: the monitoring capstone embeds its three stage
# oracles verbatim as subqueries — it can only pass if each stage would.
ORACLES["q_monitoring_capstone"] = (
    "SELECT 'zscore' AS chk, 'n_anomalies' AS metric,"
    " CAST(count(*) AS BIGINT) AS value"
    " FROM (" + ORACLES["q_anomaly_zscore"] + ") WHERE is_anomaly"
    " UNION ALL"
    " SELECT 'ks' AS chk, 'd_ppm' AS metric, d_ppm AS value"
    " FROM (" + ORACLES["q_ks_test"] + ")"
    " UNION ALL"
    " SELECT 'changepoint' AS chk, 'max_gain_milli' AS metric,"
    " CAST(max(gain_milli) AS BIGINT) AS value"
    " FROM (" + ORACLES["q_changepoint"] + ")"
)
# streamed additive (lang, doc/token) counts == one-shot batch mix
ORACLES["q_stream_temperature_mix"] = ORACLES["q_temperature_mix"]
# streamed additive target-slice bigram counts == one-shot batch KN gate
ORACLES["q_stream_kneser_ney"] = ORACLES["q_kneser_ney"]
# round 8: the stream faces replay the batch operators' oracles verbatim
ORACLES["q_stream_repeated_spans"] = ORACLES["q_repeated_spans"]
ORACLES["q_stream_distill"] = ORACLES["q_distill_quality"]
