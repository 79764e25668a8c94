"""Scale probe: run headline queries on a synthetic ~10× blow-up of sf0.1.

Writes /tmp/ddspark_sfsynth (union of 10 key-shifted copies of the sf0.1
tables → ~6M lineitem rows), then times the headline queries against it.
This is the local stand-in for the 100× question: does wall-clock scale
~linearly with input (scan-bound plans), and do the shuffles stay balanced?

Usage: python tools/scale_probe.py [copies]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataframe_differ_spark.queries import load_all
from dataframe_differ_spark.session import get_spark
from dataframe_differ_spark.tables import load_table

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/ddspark_sfsynth"

# key column to shift per copy so keys stay unique across copies
SHIFT = {
    "orders": [("o_orderkey", 10_000_000), ("o_custkey", 100_000)],
    "lineitem": [("l_orderkey", 10_000_000)],
    "customer": [("c_custkey", 100_000)],
    "events": [("event_id", 10_000_000), ("user_id", 10_000)],
    "documents": [("doc_id", 1_000_000)],
    "embeddings": [("vec_id", 1_000_000)],
}
PASSTHROUGH = ["region", "nation", "supplier", "part"]

HEADLINE = [
    "agg_pricing_summary",
    "diff_summary",
    "join_smj",
    "tpch_q5_shape",
    "dedup_near",
    "sim_join",
    "window_session",
    "diff_unkeyed",
    "tpch_q13_shape",
    "dedup_containment",
    "path_trigrams",
    "agg_bitmap_distinct",
    "text_repetition",
    "seq_pack_budget",
    "split_train_val_test",
    "contamination_check",
    "events_markov_transitions",
    "tpch_q21_shape",
    # round-1 late additions
    "interval_merge",
    "diff_row_hash",
    "join_bloom_prune",
    "doc_chunking",
    "sample_weighted",
    "graph_pagerank_nations",
    "join_temporal_scd2",
    "diff_agg_reconcile",
    "knn_classify",
    "dedup_fuzzy_names",
    # round-2 additions
    "sim_join_lsh",
    "knn_classify_ivf",
    "dedup_incremental",
    "text_bigram_lm",
    "text_pii_redact",
    # round-3 additions
    "sketch_cms_topk",
    "dedup_minhash_exact",
    "dedup_substring_spans",
    "retrieval_hybrid_rrf",
    "drift_psi",
    "diag_skew_partitions",
    "maintenance_compaction_plan",
    "dedup_clusters",
    "dedup_pipeline_e2e",
    "join_pit_features",
    "sketch_set_intersect_est",
    "vec_pq_codes",
    "dedup_simhash_portable",
    # round-4 additions
    "agg_histogram_equidepth_sketch",
    "layout_zorder_sketch",
    "orders_rfm_sketch",
    "revenue_pareto_sketch",
    "diff_quantile_drift_sketch",
    "win_distribution_sketch",
    "sim_topk_ivf",
    "text_winnowing",
    "vec_quantize_int8",
    "tpch_q2_shape",
    "tpch_q9_shape",
    "tpch_q20_shape",
    "dedup_simhash",
    "agg_hll_merge",
    # round-4 late additions
    "dedup_semantic",
    "text_tokenize_greedy",
    "text_char_entropy",
    "graph_triangle_count",
    "json_variant_extract",
    "sql_recursive_components",
    "vec_matryoshka_prefix",
    "batch_curriculum",
    "vec_quantize_binary",
    "str_collation_group",
    "text_feature_hash_embed",
    "text_quality_classifier_lr",
    "multimodal_shard_manifest",
    "vec_ivfpq_topk",
    "sample_dsir_importance",
    "sql_pipe_syntax",
    "diff_drilldown_rollup",
    "events_pattern_sequence",
    "bpe_train_merges",
    "sample_neyman_allocation",
    "events_changepoint_cusum",
    "events_autocorr",
    "events_seasonality_dow",
    "trend_theilsen_daily",
    "eval_auc_score",
    "eval_calibration_bins",
    "km_survival_users",
    "benford_first_digit",
    "eval_retrieval_recall",
    "eval_dedup_pr",
    # round-4 wave 4/5 additions (statsops.py)
    "drift_ks_test",
    "drift_js_divergence",
    "eval_ndcg_retrieval",
    "eval_mrr_retrieval",
    "text_normalize_unicode",
    "graph_bfs_hops",
    "graph_pagerank_parts",
    "events_holt_linear",
    "stats_bootstrap_ci",
    "source_mix_temperature",
    # round-4 wave-6 additions
    "diff_threeway",
    "stats_ols_multi",
    "vec_top_pc",
    # round-4 wave-7 additions
    "agg_weighted_median",
    "orders_cohort_ltv",
    "events_sliding_distinct",
    # round-5 additions
    "graph_link_prediction",
    "graph_link_prediction_capped",
    "dedup_semantic_sqrtn",
    "orders_market_basket_lift",
    "agg_skewness_kurtosis",
    "text_zipf_alpha",
    "stats_mann_whitney",
    "events_retention_matrix",
    "stats_spearman_corr",
    # round-6 additions
    "dedup_fuzzy_names_capped",
    "stats_kendall_tau",
    "stats_levene_bf",
    "events_fano_burstiness",
    "orders_gini_revenue",
    "text_ngram_novelty",
    "text_heaps_law",
    "orders_lorenz_deciles",
    "events_crosscorr_types",
    "stats_two_proportions_z",
    "orders_abc_classification",
    "stats_power_mde",
    "orders_theil_inequality",
    # round-7 additions
    "stats_cohens_d",
    "orders_hhi_concentration",
    "events_runs_test",
    "warehouse_scd2_apply",
    "bpe_apply_merges",
    "sim_range_search",
    "eval_pr_auc",
    "privacy_t_closeness",
    "sketch_bloom_membership",
    "stats_jarque_bera",
    "graph_assortativity",
    "events_holt_winters",
    "text_simpson_diversity",
    "stats_mann_kendall",
    "join_asof_nearest",
    "stats_friedman",
    "text_rake_keywords",
    # round-8 additions
    "sketch_bloom_persisted",
    "graph_triangle_count_capped",
    "graph_kcore",
    "text_mattr",
    "layout_hilbert_sketch",
    "stats_wilcoxon_signed_rank",
    "text_mtld",
    "graph_label_propagation",
    "stats_cochran_q",
    "text_readability_flesch",
    "vec_random_projection",
    "events_lz78_complexity",
    "sim_topk_ivf_persisted",
    # round-8 wave-2 additions
    "stats_mcnemar",
    "stats_cohens_kappa",
    "stats_kendall_w",
    "stats_durbin_watson",
    "stats_grubbs",
    "drift_hellinger",
    "events_entropy_rate",
    "events_stl_decompose",
    "graph_hits",
    "graph_clustering_coeff",
    "events_kalman_level",
    "sample_systematic",
    "orders_price_elasticity",
    "stats_page_trend",
    "text_burstiness",
    "eval_brier_decomposition",
    "agg_grouping_id",
    "stats_kruskal_wallis",
    "stats_bartlett",
    "text_pmi_cooccurrence",
    "stats_cramers_v",
    "stats_anderson_darling",
    "events_pacf",
    "sketch_linear_counting",
    "stats_pettitt",
    "orders_skyline",
    # round-9 additions
    "dedup_substring",
    "dedup_substring_excise",
    "unigram_train_vocab",
    "unigram_apply_segment",
    "quality_lr_train",
    "quality_lr_score",
    "wordpiece_train_merges",
    "events_dft_power",
    "events_ar2_forecast",
    "sketch_ddsketch_quantiles",
    "eval_bleu_pairs",
    "dq_constraint_suite",
    "eval_forecast_backtest",
    "warehouse_ivm_agg",
    "retrieval_mmr_rerank",
    "dedup_cluster_keep_best",
    "drift_embedding_mean",
    "text_textrank_keywords",
    "stats_corr_matrix",
    # round-10 additions
    "dedup_incremental_persisted",
    "ann_drift_refresh",
    "split_leakage_safe",
    "eval_rouge_pairs",
    "dq_k_anonymity",
    "dedup_store_append",
    "dedup_store_compacted",
    "corpus_data_card",
    "eval_tokenizer_fertility",
    "contamination_semantic",
    "dq_freshness",
]


def _mutate_copy(name: str, df, i: int):
    """Deterministic per-copy content mutation (round-4 verdict item #5).

    Verbatim duplication made every pair-output query (dedup_*, semantic
    dedup, similarity joins) measure planted-pair OUTPUT blow-up instead of
    candidate-generation scaling: copy k of a doc is a 100%-Jaccard dup of
    copies 0..k-1, so pair counts grew quadratically in `copies`. Mutating
    each copy breaks cross-copy near-duplicity while keeping realistic text
    / vector statistics:

    - documents: every 4th token (phase i mod 4) is rewritten to a
      copy-tagged token → ~75% of 3-gram shingles change → Jaccard vs the
      original ~0.14, far below every dedup threshold (0.5 / est 0.35),
      and SimHash moves ~30 bits. Planted WITHIN-corpus dups (the %13
      truncations each query builds itself) are unaffected.
    - embeddings: a deterministic integer-formula perturbation of ±0.05
      per dim (E[cos] ≈ 0.975 vs the original — below the 0.99 SemDeDup
      threshold) with vec_id+dim+copy seeding, so cross-copy vectors stop
      being exact semantic dups while unit-norm geometry stays realistic.
    """
    if i == 0:
        return df
    if name == "documents":
        phase = i % 4
        return df.withColumn(
            "text",
            F.expr(
                "array_join(transform(split(text, ' '), (t, p) -> "
                f"IF(p % 4 = {phase}, concat('c{i}', substr(t, 1, 2)), t)"
                "), ' ')"
            ),
        )
    if name == "embeddings":
        return df.withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, j) -> CAST(x + "
                f"(((vec_id * 31 + j * 7 + {i} * 13) % 101) - 50) * 0.001 "
                "AS FLOAT))"
            ),
        )
    return df


def build(spark, copies: int) -> None:
    for name, shifts in SHIFT.items():
        base = load_table(spark, SRC, name)
        parts = []
        for i in range(copies):
            df = base
            for col, step in shifts:
                df = df.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(_mutate_copy(name, df, i))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
    for name in PASSTHROUGH:
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            f"{OUT}/{name}.parquet"
        )


def main() -> None:
    # Optional subset: --only name1,name2 (probe new queries without
    # re-timing the whole headline list).
    only = None
    argv = sys.argv[1:]
    if "--only" in argv:
        i = argv.index("--only")
        if i + 1 >= len(argv):
            sys.exit("--only requires a comma-separated query list")
        only = set(argv[i + 1].split(","))
        unknown = only - set(HEADLINE)
        if unknown:
            sys.exit(f"--only names not in HEADLINE: {sorted(unknown)}")
        argv = argv[:i] + argv[i + 2 :]
    copies = int(argv[0]) if argv else 10
    spark = get_spark("scale_probe")
    t0 = time.time()
    build(spark, copies)
    print(f"built {copies}x corpus in {time.time()-t0:.1f}s")
    registry = load_all()
    for name in HEADLINE if only is None else [n for n in HEADLINE if n in only]:
        # baseline at sf0.1
        t0 = time.time()
        registry[name].fn(spark, SRC).write.format("noop").mode("overwrite").save()
        base_t = time.time() - t0
        t0 = time.time()
        registry[name].fn(spark, OUT).write.format("noop").mode("overwrite").save()
        big_t = time.time() - t0
        ratio = big_t / base_t if base_t > 0 else float("nan")
        print(
            f"{name}: sf0.1={base_t:.2f}s {copies}x={big_t:.2f}s "
            f"ratio={ratio:.1f} (linear would be ~{copies})"
        )


if __name__ == "__main__":
    main()
