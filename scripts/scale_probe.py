"""Reproducible 10× fact-scale probe (SCALE.md "10× fact-scale probe").

Builds ``.scratch/facts10x/`` holding each FACT table as a directory of 10
key-shifted copies of the sf0.1 parquet file (6M lineitem rows) while
DIMENSIONS stay at 1× — the closer analog of a real scale-up step than
scaling everything — then times each probe query min-of-2 with a noop sink
at both scales in the same session and prints the ratio table.

Key shifting matters: naive identical copies give every fact row 10
same-key twins, so a fact-fact join (lineitem⨝orders on orderkey) matches
each of 10 lineitem copies against 10 orders copies — 100× the join
output, not 10× — and the probe then reports join explosion, not scaling
(the round-3 q5 "2.6× at 10×" was exactly this artifact). Copy ``i`` adds
``i·10⁹`` to the fact-fact join keys (orderkey on both sides; row-identity
ids) so the join structure is preserved: 10× rows, each matching exactly
as at 1×. Dimension foreign keys (custkey/partkey/suppkey/nationkey,
user_id) are NOT shifted — all copies share the 1× dimension population,
which is what a real 10× data growth over a stable entity base looks like.

Usage: python scripts/scale_probe.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from salesforce_plugin_spark.conformance import QUERIES  # noqa: E402
from salesforce_plugin_spark.session import get_spark  # noqa: E402

FACTS = ["orders", "lineitem", "events", "documents", "embeddings"]
DIMS = ["region", "nation", "customer", "supplier", "part"]
COPIES = 10

#: per-table columns shifted by i*KEY_OFFSET in copy i — the fact-side join
#: keys and row-identity ids; dimension FKs stay on the 1× population.
SHIFT_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
KEY_OFFSET = 10**9

PROBE = [
    "q_agg_groupby",
    "q_tpch_q2",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q13",
    "q_tpch_q18",
    "q_tpch_q21",
    "q_dedup_exact",
    "q_near_dedup",
    "q_minhash_clusters",
    "q_tfidf",
    "q_contamination",
    "q_training_corpus",
    "q_training_sequences",
    "q_event_session",
    "q_event_sliding",
    "q_range_join",
    "q_asof_join",
    "q_global_line_dedup",
    "q_bigram_fluency",
    "q_quality_classifier",
    "q_scd2",
    "q_funnel",
    "q_retention",
    "q_kmv_distinct",
    "q_interval_overlap",
    "q_multimodal_frames",
    "q_span_dedup",
    "q_cdc_merge",
    "q_quantile_sketch",
    "q_bm25",
    "q_url_dedup",
    "q_pagerank",
    "q_sssp",
    "q_louvain_step",
    "q_ndcg",
    "q_pca_project",
    "q_zonemap_prune",
    "q_changepoint",
    "q_stream_zscore",
    "q_ks_test",
    "q_itemcf",
    "q_benford",
    "q_tpch_q1",
    "q_zorder",
    "q_session_paths",
    "q_scd2_lookup",
    "q_encoding_repair",
    "q_gopher_gate",
    "q_kmv_setops",
    "q_scd2_incremental",
    "q_semantic_dedup",
    "q_importance_weights",
    "q_user_growth",
    "q_anomaly_zscore",
    "q_curation_capstone",
    "q_incremental_dedup",
    "q_stream_near_dedup",
    # round-10 additions: the real-decode PNG tier (documents fact 10x)
    "q_png_histogram",
    "q_png_resize",
    "q_png_palette_histogram",
    "q_heavy_hitters",
    "q_bpe_step",
    "q_fuzzy_link",
    "q_hybrid_rrf",
    "q_copurchase",
    "q_triangles",
    "q_power_step",
    "q_power_converged",
    "q_join_size_est",
    "q_resample_ffill",
    "q_rolling_metrics",
    "q_feature_bins",
    "q_bloom_prune",
    "q_weighted_sample",
    "q_negative_sampling",
    "q_grouped_quantiles",
    "q_key_skew",
    "q_containment",
    "q_snapshot_diff",
    "q_percentile_normalize",
    "q_fk_audit",
    "q_iqr_outliers",
    "q_class_balance",
    "q_budget_sample",
    "q_hierarchy",
    "q_dimension_stats",
    "q_distribution_drift",
    "q_fd_audit",
    "q_date_dimension",
    "q_surrogate_keys",
    "q_star_load",
    "q_collocations",
    "q_oov_audit",
    "q_incremental_rollup",
    "q_asof_forward",
    "q_asof_nearest",
    "q_debounce",
    "q_throttle",
    "q_novelty",
    "q_disorder",
    "q_union_evolve",
    "q_golden_records",
    "q_contribution",
    "q_quality_gate",
    "q_attribution",
    "q_activity_bitmap",
    "q_epoch_shuffle",
    "q_gram_matrix",
    "q_trend",
    "q_term_assoc",
    "q_embed_decontaminate",
    "q_skipgrams",
    "q_rank_corr",
    "q_user_features",
    "q_label_prop",
    "q_cusum",
    "q_bootstrap",
    "q_manifest",
    "q_weighted_median",
    "q_trajectories",
    "q_cluster_terms",
    "q_rolling_wau",
    "q_kmeans_margin",
    "q_neighbor_agg",
    "q_decayed_score",
    "q_kfold",
    "q_target_encoding",
    "q_winsorize",
    "q_rake",
    "q_degree_dist",
    "q_kcore",
    "q_markov",
    "q_chat_render",
    "q_length_buckets",
    "q_interarrival",
    "q_dup_size_dist",
    "q_vocab_coverage",
    "q_centroid_sim",
    "q_rand_proj",
    "q_minmax_scale",
    "q_token_gini",
    "q_source_overlap",
    "q_bpe_apply",
    "q_rolling_quantiles",
    "q_keyset_page",
    "q_ann_recall",
    "q_funnel_latency",
    "q_khop",
    "q_multimodal_channels",
    "q_hits",
    "q_mad_outliers",
    "q_rank_movers",
    "q_leadlag",
    "q_wpagerank",
    "q_component_sizes",
    "q_mutual_nn",
    "q_fano",
    "q_assortativity",
    "q_cluster_cohesion",
    "q_modularity",
    "q_dow_profile",
    "q_coverage_gaps",
    "q_seasonal_anomaly",
    "q_lcs_dedup",
    "q_rerank",
    "q_self_lcs",
    "q_mmr",
    "q_minhash_error",
    "q_theil_sen",
    "q_temperature_mix",
    "q_hard_negatives",
    "q_ppr",
    "q_cm_error",
    "q_stratified_sample",
    "q_hll",
    "q_knn_classify",
    "q_assoc_rules",
    "q_surprisal",
    "q_quant_error",
    "q_random_walk",
    "q_quantile_error",
    "q_salted_distinct",
    "q_link_predict",
    "q_knn_confusion",
    "q_multimodal_ahash",
    "q_wilson",
    "q_dbscan_roles",
    "q_dbscan_clusters",
    "q_erasure_audit",
    "q_blocking_recall",
    "q_abtest",
    "q_calibration",
    # round-7 additions (VERDICT r7 #3: probe the L-level pair-stage reuse
    # in the DBSCAN hierarchy and the type-bounded KN model join)
    "q_cross_encoder",
    "q_dbscan_hierarchy",
    "q_dbscan_tree",
    "q_kneser_ney",
    "q_stream_kneser_ney",
    # round-8 additions
    "q_repeated_spans",
    "q_distill_quality",
    "q_stream_repeated_spans",
    "q_stream_distill",
    # round-9 additions (real-decode F4: linear Arrow scans; q_bmp_ahash
    # is pair-producing — verbatim copy twins explode its pair count BY
    # SEMANTICS at ladder scales, like the density ops)
    "q_bmp_histogram",
    "q_wav_channels",
    "q_bmp_ahash",
    "q_bmp_resize",
]


def build_scaled_dir(sf_dir: str, out_dir: str) -> str:
    """Fact tables become directories of COPIES key-shifted parquet files
    (Spark treats a directory of files as one table with that many input
    splits); dimensions are single-copy directories."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    for t in FACTS + DIMS:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        os.makedirs(dst)
        if t in DIMS:
            shutil.copy(src, os.path.join(dst, "part-00000.parquet"))
            continue
        base = pq.read_table(src)
        shift_cols = SHIFT_KEYS[t]
        for i in range(COPIES):
            tbl = base
            if i:  # copy 0 keeps original keys
                for col in shift_cols:
                    idx = tbl.schema.get_field_index(col)
                    shifted = pc.add(tbl.column(col), i * KEY_OFFSET)
                    tbl = tbl.set_column(idx, col, shifted)
            pq.write_table(tbl, os.path.join(dst, f"part-{i:05d}.parquet"))
    return out_dir


def time_query(fn, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    # args: [sf_dir] [q_name ...] [Nx] — q_ args restrict the probe to
    # those queries; an ``Nx`` arg (e.g. ``100x``) sets the copy count
    # (default 10). 100× on the 128 GiB sandbox = 60M lineitem rows —
    # the scaling-exponent check for the headline join tail.
    global COPIES
    sf_dir = "/root/testdata/sf0.1"
    names = []
    for a in sys.argv[1:]:
        if a.startswith("q_"):
            names.append(a)
        elif a.endswith("x") and a[:-1].isdigit():
            COPIES = int(a[:-1])
        else:
            sf_dir = a
    probe = [n for n in PROBE if not names or n in names]
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"facts{COPIES}x",
    )
    print(f"building {scratch} from {sf_dir} (facts ×{COPIES}) ...")
    build_scaled_dir(sf_dir, scratch)

    spark = get_spark("scale-probe")
    # warm both plan shapes once so the timed runs are steady-state
    for name in probe:
        for d in (sf_dir, scratch):
            try:
                QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception:
                pass

    print(f"\n| query | 1x facts | {COPIES}x facts | ratio |")
    print("|---|---|---|---|")
    for name in probe:
        t1 = time_query(QUERIES[name], spark, sf_dir)
        t10 = time_query(QUERIES[name], spark, scratch)
        print(f"| {name} | {t1:.2f} s | {t10:.2f} s | {t10 / t1:.1f}x |")


if __name__ == "__main__":
    main()
