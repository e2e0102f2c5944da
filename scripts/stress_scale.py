#!/usr/bin/env python3
"""Scale-stress harness for the heavy document-family operators.

Builds an N× replica (STRESS_COPIES, default 10) of the sf0.1 documents
table in which each copy gets (a) alphabet-rotated text (token/char
structure identical, vocab disjoint — so no cross-copy near-dup
candidates) and (b) a per-copy source tag (so blocked strategies see N×
more blocks of the SAME size, the shape real corpus growth takes — more
crawl slices, not N×-fatter slices). The planted-dup structure
(doc_id < 100 offsets inside docs_with_dups) exists once per copy-0
only, holding the true-dup count constant while candidate generation
scales with the corpus.

STRESS_SKEW=1 switches to the ADVERSARIAL shape (r9, verdict item 6 —
the greedy-fill asymptote method applied to dedup): 90% of replica
copies keep the ORIGINAL source tags, so every source block grows
~0.9·N× fatter instead of N× more blocks (the dominant-crawl-slice
case), AND 1% of the dominant copies' docs are REPLACED by one shared
short boilerplate template (± a tiny per-doc suffix) — near-identical
short docs across copies share their whole shingle set, land in the
SAME LSH bucket in every band, and force the banded join through one
giant bucket: the classic template-page hazard that makes naive LSH
quadratic in the hot bucket.

Reports 1× and N× wall times and the ratio; a ratio ≫ N would expose
a quadratic surface. Writes no repo files — results are pasted into
SCALE.md by hand.

Usage:  [STRESS_COPIES=50] [STRESS_SKEW=1] python3 scripts/stress_scale.py [q_name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("STRESS_COPIES", "10"))

#: id stride between replica copies — far above the planted-dup offsets
ID_STRIDE = 1_000_000_000

BIG_PATH = "/tmp/stress_documents_10x.parquet"

DEFAULT_QUERIES = [
    "q_dedup_exact",
    "q_dedup_minhash_banded",
    "q_minhash_estimate_error",
    "q_dedup_simhash",
    "q_dedup_ngram",
    "q_dedup_components",
    "q_dedup_components_star",
    "q_repetition_stats",
    "q_contamination",
    "q_cross_source_contamination",
    "q_quality_funnel",
    "q_chunk_sliding",
    "q_source_mixing_weights",
    "q_pack_chunks",
    "q_cdc_chunk_dedup",
    "q_vocab_jaccard",
    "q_readability",
    "q_lexical_richness",
    "q_feature_hashing",
    "q_quantile_normalize",
    "q_wasserstein_drift",
    "q_vocabulary_growth",
]

ALPHABET = "abcdefghijklmnopqrstuvwxyz"

BIG_EVENTS_PATH = "/tmp/stress_events_10x.parquet"

#: queries that read events (stats family) — stressed via an events
#: replica: user/event ids shifted per copy, value/ts distributions
#: preserved, so per-user structure and value histograms scale 10×.
EVENTS_QUERIES = {
    # r7 streaming replays: the 10x events file replays as one
    # availableNow batch — stresses the windowed/stateful aggregation
    # and the foreachBatch capture, the shapes that scale with volume
    "q_stream_hourly_replay",
    "q_stream_session_window_replay",
    "q_stream_ewma_replay",
    "q_stream_gap_sessions_replay",
    "q_stream_upsert_replay",
    "q_quantile_sketch",
    "q_session_cooccurrence",
    "q_mannwhitney",
    "q_ks_test",
    "q_gini_concentration",
    "q_dow_seasonality",
    "q_time_to_convert",
    "q_cramers_v",
    "q_kmv_set_ops",
    "q_minmax_scaler",
    "q_robust_scaler",
    "q_tukey_fences",
    "q_lorenz_deciles",
    "q_interarrival_profile",
    "q_weekly_churn",
    "q_behavior_profile",
    "q_longest_streak",
    "q_rolling_active_users",
    "q_decile_stats",
    # r12: the per-group median broadcast claim — events is the fact side
    "q_mad_outliers",
}

BIG_LINEITEM_PATH = "/tmp/stress_lineitem_10x.parquet"

#: queries that read lineitem — replica shifts the join keys only, so
#: every value distribution (and hence rank/product structure) scales.
LINEITEM_QUERIES = {
    "q_spearman_matrix",
    "q_normal_equations",
    "q_corr_matrix",
    "q_profile_columns",
    "q_tpch_pricing",
    "q_tpch_forecast_revenue",
    "q_tpch_waiting_suppliers",
    "q_tpch_priority_check",
    "q_tpch_volume_shipping",
    "q_tpch_product_profit",
    "q_tpch_returned_items",
    "q_tpch_top_supplier",
    "q_tpch_small_qty_revenue",
    "q_acf_daily_revenue",
    "q_cusum_changepoint",
    "q_tpch_min_cost_supplier",
    "q_tpch_important_stock",
    "q_tpch_parts_supplier_counts",
    "q_tpch_excess_supply",
    "q_stl_decompose",
    "q_market_basket",
    "q_theil_sen",
    "q_rolling_median",
    "q_fulfillment_latency",
    "q_returns_rate_by_brand",
    "q_kendall_daily",
    "q_latency_moments",
    "q_periodogram_daily",
    "q_pacf_daily",
    # r12: one-pass-per-edge claim — lineitem is the doubly-edged fact
    # side (order + supplier edges); dims stay 1x as dims do, so the
    # replicated child keys land as orphans, which only exercises the
    # orphan-count branch harder
    "q_fk_integrity",
}

BIG_ORDERS_PATH = "/tmp/stress_orders_10x.parquet"

#: queries that read orders as their FACT side — order keys shifted,
#: custkeys preserved (the customer dim stays 1×, as dims do).
ORDERS_QUERIES = {
    "q_dpp_join_pruned",
    "q_anova_f",
    "q_tpch_customer_distribution",
    "q_tpch_sales_opportunity",
    "q_kaplan_meier",
    "q_temporal_split",
    "q_target_encoding",
    "q_hhi_by_segment",
    "q_new_vs_returning",
}

BIG_EMB_PATH = "/tmp/stress_embeddings_10x.parquet"

#: queries that scan embeddings globally (not per-label-pairwise) —
#: vec_ids shifted, vectors/labels preserved: row count scales 10×.
EMB_QUERIES = {
    "q_embedding_covariance",
    "q_embedding_dim_stats",
    "q_pca_top_component",
    "q_pca_by_label",
    "q_sim_search_kcell",
    "q_sim_search_ivf_pq",
    "q_ann_recall",
    "q_ann_recall_batch",
    "q_dim_truncation_recall",
    "q_quantization_recall",
}


def _disable_materialize_gates() -> None:
    """STRESS_GATE_OFF=1: push every size-dependent materialize gate to
    infinity so the operators take their BELOW-GATE (re-scan) shape at
    any input size — the exact pre-r12 operator sequence (each gate's
    below-threshold plan was verified operator-identical to the old
    code in OPTIMIZATION_r12). Lets the harness measure old-vs-new on
    the same tree, at the 10× replica where the gates actually fire."""
    import clusterforge_spark.operators.relational as REL
    import clusterforge_spark.operators.similarity as SIM
    import clusterforge_spark.operators.sketches as SKC
    import clusterforge_spark.operators.text as TXT

    huge = 1 << 62
    TXT.TEXT_MATERIALIZE_BYTES = huge
    REL.BASKET_MATERIALIZE_BYTES = huge

    def _patch_default(fn) -> None:
        fn.__defaults__ = tuple(
            huge if d == (8 << 20) else d for d in (fn.__defaults__ or ())
        )

    _patch_default(REL.spearman_matrix)
    _patch_default(SIM.dim_truncation_recall)
    _patch_default(SIM.quantization_recall)
    _patch_default(SKC.quantile_histogram_estimate)
    _patch_default(TXT.wasserstein_length_by_source)
    print("STRESS_GATE_OFF: materialize gates disabled (below-gate shapes)", flush=True)


def main() -> int:
    from clusterforge_spark.session import get_spark

    if os.environ.get("STRESS_GATE_OFF", "0") == "1":
        _disable_materialize_gates()

    names = sys.argv[1:] or DEFAULT_QUERIES
    # r8: point the artifact registry at a scratch dir so (a) the repo
    # registry never accumulates __stress10x__ artifacts and (b) both
    # sides of every ratio pay the same cold build — the stress table
    # measures the BUILD shape, not a warm parquet read
    import tempfile

    scratch_registry = tempfile.mkdtemp(prefix="cf_stress_models_")
    os.environ["SPARK_GRAFT_MODEL_DIR"] = scratch_registry
    spark = get_spark("clusterforge-stress")
    try:
        return _run(spark, names)
    finally:
        # r8 ADVICE: don't leak a populated scratch registry per run
        import shutil as _shutil

        _shutil.rmtree(scratch_registry, ignore_errors=True)
        spark.stop()


def _run(spark, names: list[str]) -> int:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    import clusterforge_spark.sources.readers as R
    from clusterforge_spark.sources.readers import load_table

    # drop stale optional replicas so the exists() checks in patched()
    # can't pick up a previous run's files for queries that don't want them
    import shutil

    for path, wanted in (
        (BIG_ORDERS_PATH, any(n in ORDERS_QUERIES for n in names)),
        (BIG_EMB_PATH, any(n in EMB_QUERIES for n in names)),
    ):
        if not wanted and os.path.exists(path):
            shutil.rmtree(path, ignore_errors=True)

    skew = os.environ.get("STRESS_SKEW", "0") == "1"
    # STRESS_IDENTICAL=1 (r11): the skew template cluster becomes
    # BYTE-IDENTICAL (no per-doc suffix) — the mega-cluster shape the
    # r11 exact-dup collapse routes around the banded join entirely
    # (pre-r11 this shape was unrunnable: Ω(m²) hot-bucket pairs with
    # full shingle arrays attached)
    identical = os.environ.get("STRESS_IDENTICAL", "0") == "1"
    #: the shared boilerplate template for skew mode — short (few
    #: shingles, so the template IS the whole shingle set) and constant
    #: across copies; the per-doc numeric suffix keeps docs distinct
    #: without moving their minhash minima
    template = (
        "server error the page you requested could not be found "
        "please contact the site administrator reference code"
    )
    base = load_table(spark, SF_DIR, "documents")
    parts = [base]
    for i in range(1, COPIES):
        rot = ALPHABET[i:] + ALPHABET[:i]
        dominant = skew and (i % 10 != 0)
        src = (
            F.col("source")  # dominant copies pile onto the ORIGINAL tags
            if dominant
            else F.concat(F.col("source"), F.lit(f"_c{i}")).alias("source")
        )
        text = F.translate(F.col("text"), ALPHABET, rot)
        if dominant:
            # suffix is distinct per (copy, doc) — 7919 and 9973 are
            # coprime, base doc_ids < 9973 — so the cluster is
            # NEAR-identical (template + one varying token), the
            # template-page shape, not an exact-dup cluster (r9 review:
            # a base-id-only suffix made dominant copies byte-identical)
            cluster_text = (
                F.lit(template)  # byte-identical mega-cluster (r11)
                if identical
                else F.concat(
                    F.lit(template + " "),
                    ((F.col("doc_id") + F.lit(i * 7919)) % 9973).cast("string"),
                )
            )
            text = F.when(F.col("doc_id") % 100 == 7, cluster_text).otherwise(text)
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * ID_STRIDE)).alias("doc_id"),
                text.alias("text"),
                "lang",
                src.alias("source"),
                "n_chars",
                *[c for c in base.columns if c not in
                  ("doc_id", "text", "lang", "source", "n_chars")],
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(BIG_PATH)
    big_n = spark.read.parquet(BIG_PATH).count()
    print(f"stress corpus: {big_n} docs ({COPIES}x of {SF_DIR})", flush=True)

    if any(n in EVENTS_QUERIES for n in names):
        ev = load_table(spark, SF_DIR, "events")
        eparts = [ev]
        for i in range(1, COPIES):
            eparts.append(
                ev.select(
                    (F.col("event_id") + F.lit(i * ID_STRIDE)).alias("event_id"),
                    "ts",
                    (F.col("user_id") + F.lit(i * ID_STRIDE)).alias("user_id"),
                    "event_type",
                    "value",
                    *[c for c in ev.columns if c not in
                      ("event_id", "ts", "user_id", "event_type", "value")],
                )
            )
        bige = eparts[0]
        for p in eparts[1:]:
            bige = bige.unionByName(p)
        bige.write.mode("overwrite").parquet(BIG_EVENTS_PATH)
        n_ev = spark.read.parquet(BIG_EVENTS_PATH).count()
        print(f"stress events: {n_ev} rows ({COPIES}x)", flush=True)

    if any(n in LINEITEM_QUERIES for n in names):
        li = load_table(spark, SF_DIR, "lineitem")
        lparts = [li]
        for i in range(1, COPIES):
            lparts.append(
                li.select(
                    (F.col("l_orderkey") + F.lit(i * ID_STRIDE)).alias("l_orderkey"),
                    *[c for c in li.columns if c != "l_orderkey"],
                )
            )
        bigl = lparts[0]
        for p in lparts[1:]:
            bigl = bigl.unionByName(p)
        bigl.write.mode("overwrite").parquet(BIG_LINEITEM_PATH)
        n_li = spark.read.parquet(BIG_LINEITEM_PATH).count()
        print(f"stress lineitem: {n_li} rows ({COPIES}x)", flush=True)

    if any(n in ORDERS_QUERIES for n in names):
        od = load_table(spark, SF_DIR, "orders")
        oparts = [od]
        for i in range(1, COPIES):
            oparts.append(
                od.select(
                    (F.col("o_orderkey") + F.lit(i * ID_STRIDE)).alias("o_orderkey"),
                    *[c for c in od.columns if c != "o_orderkey"],
                )
            )
        bigo = oparts[0]
        for p in oparts[1:]:
            bigo = bigo.unionByName(p)
        bigo.write.mode("overwrite").parquet(BIG_ORDERS_PATH)
        print(
            f"stress orders: {spark.read.parquet(BIG_ORDERS_PATH).count()} rows",
            flush=True,
        )

    if any(n in EMB_QUERIES for n in names):
        em = load_table(spark, SF_DIR, "embeddings")
        eparts = [em]
        for i in range(1, COPIES):
            eparts.append(
                em.select(
                    (F.col("vec_id") + F.lit(i * ID_STRIDE)).alias("vec_id"),
                    *[c for c in em.columns if c != "vec_id"],
                )
            )
        bige2 = eparts[0]
        for p in eparts[1:]:
            bige2 = bige2.unionByName(p)
        bige2.write.mode("overwrite").parquet(BIG_EMB_PATH)
        print(
            f"stress embeddings: {spark.read.parquet(BIG_EMB_PATH).count()} rows",
            flush=True,
        )

    queries = E.queries()
    orig_load = R.load_table

    # the streaming replay wrappers build their own readStream over
    # sf_dir/events.parquet (they never call load_table) — point them
    # at the 10x replica, which is a multi-part spark-written directory
    # (no pathGlobFilter; maxFilesPerTrigger high enough for ONE batch,
    # matching the single-batch semantics of the 1x replay)
    import clusterforge_spark.streaming.sessionize as SS

    orig_res = SS.read_events_stream

    def patched_res(spark_, sf_dir_):
        if sf_dir_ == "__stress10x__":
            from clusterforge_spark.sources.readers import TABLE_SCHEMAS

            return (
                spark_.readStream.schema(TABLE_SCHEMAS["events"])
                .option("maxFilesPerTrigger", 10_000)
                .parquet(BIG_EVENTS_PATH)
            )
        return orig_res(spark_, sf_dir_)

    SS.read_events_stream = patched_res

    def patched(spark_, sf_dir_, name_):
        if sf_dir_ == "__stress10x__":
            if name_ == "documents":
                return spark_.read.parquet(BIG_PATH)
            if name_ == "events":
                return spark_.read.parquet(BIG_EVENTS_PATH)
            if name_ == "lineitem":
                return spark_.read.parquet(BIG_LINEITEM_PATH)
            if name_ == "orders" and os.path.exists(BIG_ORDERS_PATH):
                return spark_.read.parquet(BIG_ORDERS_PATH)
            if name_ == "embeddings" and os.path.exists(BIG_EMB_PATH):
                return spark_.read.parquet(BIG_EMB_PATH)
            return orig_load(spark_, SF_DIR, name_)
        return orig_load(spark_, sf_dir_, name_)

    for name in names:
        fn = queries[name]
        row: dict = {"query": name}
        for label, sfdir in (("t1x", SF_DIR), (f"t{COPIES}x", "__stress10x__")):
            R.load_table = patched
            E.load_table = patched
            spark.catalog.clearCache()
            E._MEMO.clear()
            try:
                # first run = COLD: for registry-backed queries (the graph
                # tables, the ANN family) this is the BUILD shape — the
                # warm repeat below then measures the serve shape, since
                # the scratch registry is already populated
                tc = time.perf_counter()
                fn(spark, sfdir).write.mode("overwrite").format("noop").save()
                row[f"cold_{label}"] = round(time.perf_counter() - tc, 2)
                t0 = time.perf_counter()
                fn(spark, sfdir).write.mode("overwrite").format("noop").save()
                row[label] = round(time.perf_counter() - t0, 2)
            except Exception as exc:  # noqa: BLE001
                row[label] = None
                print(f"stress error in {name} @ {label}: {exc}", file=sys.stderr)
        R.load_table = orig_load
        E.load_table = orig_load
        t1, t10 = row.get("t1x"), row.get(f"t{COPIES}x")
        c1, c10 = row.get("cold_t1x"), row.get(f"cold_t{COPIES}x")
        ratio = round(t10 / max(t1, 1e-9), 1) if (t1 and t10) else None
        cratio = round(c10 / max(c1, 1e-9), 1) if (c1 and c10) else None
        print(
            f"{name}: 1x {t1}s  {COPIES}x {t10}s  ratio {ratio}  "
            f"| cold 1x {c1}s  {COPIES}x {c10}s  cold-ratio {cratio}",
            flush=True,
        )

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
