"""Physical-plan quality assertions: the plans we designed for are the
plans Catalyst actually produces.

Covers: parquet filter pushdown, column pruning, broadcast of small
dimensions, TakeOrderedAndProject for top-k, single-shuffle rollup and
sessionize plans, and the dedup pair joins executing WITHOUT a
hard-coded broadcast hint (small sides may still auto-broadcast from
statistics — that is the desired adaptive behavior; a hint would be
unconditional and OOM at scale).
"""

from __future__ import annotations

import pytest

from clusterforge_spark.operators import dedup as DD
from clusterforge_spark.operators import relational as R
from clusterforge_spark.plans import explain as X
from clusterforge_spark.sources.readers import load_table

from tests.conftest import SF_DIR


@pytest.fixture(autouse=True, scope="module")
def _uncached_scans(spark):
    """Pushdown/pruning assertions need REAL FileScans: if another module
    ran first and materialized the session fixtures' .cache(), the
    CacheManager substitutes InMemoryRelations into these plans and every
    scan-level assertion fails order-dependently. Clearing the cache at
    module entry makes the assertions order-independent (later modules
    simply re-materialize lazily)."""
    spark.catalog.clearCache()
    yield


def _t(spark, name):
    return load_table(spark, SF_DIR, name)


def test_filter_pushed_to_scan(spark):
    pushed = X.pushed_filters(R.filter_conjunctive(_t(spark, "lineitem")))
    assert "l_discount" in pushed and "l_quantity" in pushed


def test_scan_project_prunes_columns(spark):
    schema = X.read_schema(R.scan_project(_t(spark, "lineitem")))
    assert "l_extendedprice" in schema
    assert "l_shipdate" not in schema and "l_returnflag" not in schema


def test_top_k_uses_take_ordered(spark):
    df = R.top_k(_t(spark, "lineitem"), k=10)
    assert X.has_take_ordered(df)


def test_join_enrich_broadcasts_dims(spark):
    df = R.join_enrich(
        _t(spark, "lineitem"),
        _t(spark, "orders"),
        _t(spark, "customer"),
        _t(spark, "nation"),
    )
    assert X.has_broadcast_join(df)


def test_rollup_revenue_preagg_shape(spark):
    df = R.rollup_revenue(
        _t(spark, "lineitem"),
        _t(spark, "orders"),
        _t(spark, "customer"),
        _t(spark, "nation"),
    )
    # dims broadcast; exchange 1 aggregates facts at the finest
    # (nation, segment) granularity, exchange 2 rollups the ~125
    # partial rows — the Expand multiplies partials, not fact rows
    # (Catalyst's Expand sits below the partial aggregate, so a direct
    # rollup would 3x every fact row through it)
    assert X.exchange_count(df) == 2
    # pin the POSITION: in the optimized logical tree, an Aggregate must
    # sit between the Expand and the Join — i.e. the Expand consumes the
    # pre-aggregate, not the join output (a direct rollup reads
    # Aggregate ← Expand ← Join with no Aggregate in between)
    plan_text = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan_text.splitlines()
    i_expand = next((i for i, ln in enumerate(lines) if "Expand" in ln), None)
    assert i_expand is not None, plan_text
    i_join = next(
        (i for i, ln in enumerate(lines) if i > i_expand and "Join" in ln), None
    )
    assert i_join is not None, plan_text
    assert any("Aggregate" in ln for ln in lines[i_expand + 1 : i_join]), plan_text


def test_window_sessionize_single_shuffle(spark):
    df = R.window_sessionize(_t(spark, "events"))
    # the explicit user_id repartition serves both the (user_id, hour)
    # aggregate and the window's partitionBy — no second exchange
    assert X.exchange_count(df) == 1


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_dedup_ngram_join_no_broadcast_hint(spark):
    df = DD.dedup_ngram_jaccard(DD.docs_with_dups(_t(spark, "documents")))
    # the PAIR SIDES carry no broadcast hint: at scale the pair join
    # degrades to a blocked shuffle join instead of OOMing on a
    # full-shingle-table broadcast. (Stats-based auto-broadcast of the
    # small test corpus is fine and expected.) The ONE permitted hint is
    # the r5 skew-salting block-SIZE table — an aggregate whose
    # cardinality is the distinct block keys (metadata, not data); its
    # hinted subtree must be that aggregate, never the shingle table.
    analyzed = _analyzed(df)
    # one hinted size table, printed once per self-join side
    assert analyzed.count("ResolvedHint") == 2
    hinted = analyzed.split("ResolvedHint", 1)[1]
    assert "Aggregate" in hinted.split("Join", 1)[0]
    plan = X.plan_string(df, "simple")
    assert any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert df.count() > 0


def test_dedup_banded_verify_join_no_broadcast_hint(spark):
    df = DD.dedup_minhash_banded(DD.docs_with_dups(_t(spark, "documents")))
    assert "ResolvedHint" not in _analyzed(df)
    plan = X.plan_string(df, "simple")
    assert any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert df.count() > 0


def test_vocab_topk_take_ordered(spark):
    from clusterforge_spark.operators import text as TX

    df = TX.vocab_topk(_t(spark, "documents"), k=10)
    assert X.has_take_ordered(df)


def test_normalize_text_map_only(spark):
    from clusterforge_spark.operators import text as TX

    # pre-tokenization cleanup must stay a zero-shuffle projection
    assert X.exchange_count(TX.normalize_text(_t(spark, "documents"))) == 0


def test_batch_topk_single_shuffle(spark):
    from clusterforge_spark.operators import similarity as SIM

    # one scan scores all queries; the only exchange is the per-query window
    assert X.exchange_count(SIM.batch_topk(_t(spark, "embeddings"))) == 1


def test_window_funcs_single_shuffle_single_window(spark):
    # six window functions share one spec -> one exchange, one Window node
    df = R.window_funcs(_t(spark, "events"))
    assert X.exchange_count(df) == 1
    plan = X.plan_string(df, "simple")
    assert plan.count("Window") - plan.count("WindowGroupLimit") <= 2


def test_asof_join_single_shuffle(spark):
    # union + carry-forward window: one exchange on user_id, no join node
    df = R.asof_join_attribution(_t(spark, "events"))
    assert X.exchange_count(df) == 1
    plan = X.plan_string(df, "simple")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_is_equi_hash_join(spark):
    # bucketing turns the interval predicate into a hash-joinable key;
    # a BroadcastNestedLoopJoin here would be the O(n·bands) scale trap
    df = R.range_join_bands(_t(spark, "events"))
    plan = X.plan_string(df, "simple")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_pivot_single_shuffle(spark):
    # explicit pivot values: no distinct-values job, one aggregate exchange
    assert X.exchange_count(R.pivot_event_counts(_t(spark, "events"))) == 1


def test_unpivot_map_only(spark):
    # Expand-based melt: zero shuffles
    assert X.exchange_count(R.unpivot_part_metrics(_t(spark, "part"))) == 0


def test_pack_chunks_single_shuffle(spark):
    from clusterforge_spark.operators import packing as PK

    # one exchange on the shard key serves the running-sum window
    assert X.exchange_count(PK.pack_chunks(_t(spark, "documents"))) == 1


def test_chunk_sliding_map_only(spark):
    from clusterforge_spark.operators import packing as PK

    # sequence-explode + substring projection: a pure scan, zero exchanges
    assert X.exchange_count(PK.chunk_sliding(_t(spark, "documents"))) == 0


def test_hash_split_map_only_and_stable(spark):
    from clusterforge_spark.operators import packing as PK

    df = PK.hash_split(_t(spark, "documents"))
    assert X.exchange_count(df) == 0
    # split is a pure function of doc_id: repartitioning must not change it
    a = {r["doc_id"]: r["split"] for r in df.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in PK.hash_split(
            _t(spark, "documents").repartition(7, "source")
        ).collect()
    }
    assert a == b


def test_time_bucket_rollup_single_shuffle(spark):
    # the whole day/hour/5-min hierarchy is one Expand + one aggregate
    assert X.exchange_count(R.time_bucket_rollup(_t(spark, "events"))) == 1


def test_corr_subquery_decorrelated(spark):
    # Catalyst must rewrite both correlated scalar subqueries to
    # aggregate+join — a per-row subquery re-execution would show up as
    # a subquery node surviving into the physical plan
    df = R.corr_subquery(spark, _t(spark, "orders"))
    plan = X.plan_string(df, "simple")
    assert "Subquery" not in plan
    assert "Join" in plan


def test_redact_pii_map_only(spark):
    from clusterforge_spark.operators import text as TX

    df = TX.redact_pii(TX.docs_with_pii(_t(spark, "documents")))
    assert X.exchange_count(df) == 0


def test_stratified_sample_map_only(spark):
    from clusterforge_spark.operators import text as TX

    assert X.exchange_count(TX.stratified_sample(_t(spark, "documents"))) == 0


def test_funnel_single_shuffle(spark):
    # three stacked unbounded windows + final agg share one user_id
    # exchange; unbounded frames need no sort
    df = R.funnel(_t(spark, "events"))
    assert X.exchange_count(df) == 1
    # all three dependent windows ride the same partitioning: exactly one
    # grouping sort (Window's required child ordering), not one per stage
    plan = X.plan_string(df, "simple")
    assert plan.count("+- Sort ") == 1


def test_dedup_levenshtein_no_broadcast_hint(spark):
    df = DD.dedup_levenshtein(DD.docs_with_dups(_t(spark, "documents")))
    # two hints, one per salted side's block-size table (metadata-sized
    # aggregates — see the ngram test above); the pair join itself is
    # never hint-broadcast and never degenerates to a cross product
    analyzed = _analyzed(df)
    assert analyzed.count("ResolvedHint") == 2
    plan = X.plan_string(df, "simple")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_topn_per_group_window_group_limit(spark):
    # the rank filter must be pushed into a pre-shuffle WindowGroupLimit
    df = R.topn_per_group(_t(spark, "orders"))
    assert "WindowGroupLimit" in X.plan_string(df, "simple")


def test_embed_ops_map_only(spark):
    from clusterforge_spark.operators import similarity as SIM

    emb = _t(spark, "embeddings")
    assert X.exchange_count(SIM.embed_normalize(emb)) == 0
    assert X.exchange_count(SIM.embed_quantize(emb)) == 0


def test_grouping_sets_preagg_shape(spark):
    df = R.grouping_sets_revenue(
        spark,
        _t(spark, "lineitem"),
        _t(spark, "orders"),
        _t(spark, "customer"),
        _t(spark, "nation"),
    )
    # dims broadcast; pre-agg exchange + grouping-sets exchange over the
    # ~125 partial rows (see test_rollup_revenue_preagg_shape)
    assert X.exchange_count(df) == 2


def test_tpch_pricing_single_shuffle_and_pushdown(spark):
    df = R.tpch_pricing_summary(_t(spark, "lineitem"))
    # one partial-agg shuffle; the shipdate filter reaches the scan
    assert X.exchange_count(df) == 1
    assert "l_shipdate" in X.pushed_filters(df)


def test_tpch_local_volume_no_cartesian(spark):
    df = R.tpch_local_supplier_volume(
        _t(spark, "lineitem"),
        _t(spark, "orders"),
        _t(spark, "customer"),
        _t(spark, "supplier"),
        _t(spark, "nation"),
        _t(spark, "region"),
    )
    plan = X.plan_string(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # region/nation dims ride broadcast joins
    assert X.has_broadcast_join(df)
    # the o_orderdate range filter is pushed into the orders scan
    assert "o_orderdate" in X.pushed_filters(df)


def test_zorder_layout_disjoint_file_ranges(spark, tmp_path):
    """write_zordered range-partitions on the Morton key: each output
    file owns a contiguous, non-overlapping key span (parquet footer
    min/max), which is what makes multi-column filters prune files."""
    import glob

    import pyarrow.parquet as pq

    from clusterforge_spark.operators import layout as LY

    df = LY.zorder_events(_t(spark, "events"))
    out = str(tmp_path / "zordered")
    LY.write_zordered(df, out, n_files=4)
    spans = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = [c for c in range(len(md.schema))
               if md.schema.column(c).name == "zkey"][0]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            spans.append((min(mins), max(maxs)))
    spans.sort()
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # contiguous, non-overlapping Morton spans


def test_runtime_bloom_filter_on_selective_dim_join(spark):
    """Spark's runtime bloom-filter injection is ON for our sessions
    (session.py): a selective dimension filter joined to a large fact
    puts a bloom_filter_agg of the dim keys on the fact side's scan,
    cutting the shuffled fact volume before the join. The size
    thresholds only clear at real scale (application side > 10 GB), so
    the test lowers them to prove the plan shape; at 100 TB they clear
    naturally.
    """
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        # force a shuffle join: broadcast joins don't need a runtime filter
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = _t(spark, "orders")
        cust = _t(spark, "customer").filter(F.col("c_mktsegment") == "BUILDING")
        j = (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_tpch_q3_pushdown_broadcast_topk(spark):
    df = R.tpch_shipping_priority(
        _t(spark, "lineitem"), _t(spark, "orders"), _t(spark, "customer")
    )
    assert X.has_take_ordered(df)
    assert X.has_broadcast_join(df)
    pushed = X.pushed_filters(df)
    assert "l_shipdate" in pushed and "o_orderdate" in pushed


def test_tpch_q18_semi_aggregate_join(spark):
    df = R.tpch_large_volume_customer(
        _t(spark, "lineitem"), _t(spark, "orders"), _t(spark, "customer")
    )
    assert X.has_take_ordered(df)
    rows = df.collect()
    assert all(r.total_qty > 207.0 for r in rows)


def test_corr_matrix_single_aggregate_pass(spark):
    df = R.corr_matrix(_t(spark, "lineitem"))
    # all sufficient statistics from ONE scan: a single 1-row exchange
    assert X.exchange_count(df) <= 1


def test_grouped_linreg_single_shuffle(spark):
    df = R.grouped_linreg(_t(spark, "lineitem"))
    assert X.exchange_count(df) == 1


def test_event_transitions_two_keyed_shuffles(spark):
    from clusterforge_spark.sources.readers import load_table

    df = R.event_transitions(load_table(spark, SF_DIR, "events"))
    # one shuffle by user for the window, one by (prev,next) for the agg
    # (+ the tiny partition-total window reuses the agg partitioning)
    assert X.exchange_count(df) <= 3


def test_scd2_single_shuffle(spark):
    df = R.scd2_build(_t(spark, "orders"))
    assert X.exchange_count(df) == 1


def test_partition_pruning_on_partitioned_table(spark, tmp_path):
    """A filter on the partition column must become a PartitionFilter
    (pruned at planning — only matching directories are scanned), not a
    post-scan predicate."""
    from pyspark.sql import functions as F

    from clusterforge_spark.sources.readers import load_table

    path = str(tmp_path / "events_by_type")
    events = load_table(spark, SF_DIR, "events")
    events.write.partitionBy("event_type").parquet(path)
    df = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = X.plan_string(df)
    assert "PartitionFilters" in plan
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("event_type" in l for l in pf_lines), pf_lines
    got = df.count()
    want = events.filter(F.col("event_type") == "purchase").count()
    assert got == want


def test_pq_encode_map_only_and_topk_take_ordered(spark):
    from clusterforge_spark.operators import similarity as SIM

    emb = _t(spark, "embeddings")
    # encoding is a pure projection: zero exchanges
    assert X.exchange_count(SIM.pq_codes(emb)) == 0
    # candidate cut and rerank both plan as TakeOrderedAndProject
    assert X.has_take_ordered(SIM.pq_topk(emb))


def test_bm25_shuffle_free_scoring(spark):
    from clusterforge_spark.operators import text as TX

    df = TX.bm25_topk(_t(spark, "documents"))
    # per-term tf is a map-only size(filter(tokens, = term)) column — no
    # posting explode, so the ONLY hash exchanges are the spread
    # repartition (≤2: stats branch + scoring branch of the same scan);
    # the old posting-list form added groupBy(doc_id, token) /
    # groupBy(token) / per-doc aggregation exchanges on top (4+). Use
    # SIMPLE mode: formatted mode prints Exchange args on a separate
    # line, so the substring count would be vacuous there.
    plan = X.plan_string(df, mode="simple")
    assert plan.count("Exchange hashpartitioning") <= 2
    # and none of those exchanges is keyed on a token/term column
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "token" not in line
    assert X.has_take_ordered(df)


def test_frame_sample_and_resize_map_only(spark):
    from clusterforge_spark.operators import multimodal as MM

    frames = MM.attach_payload(_t(spark, "documents"))
    assert X.exchange_count(MM.frame_sample(frames)) == 0
    assert X.exchange_count(MM.resize_plan(frames)) == 0


def test_profile_columns_two_level_agg_single_unified_shuffle(spark):
    from clusterforge_spark.operators import validation as VA

    df = VA.profile_columns(_t(spark, "lineitem"))
    # one shuffle for the (column, value) level, one for the per-column
    # fold — and no (N+1)-way Expand anywhere
    plan = X.plan_string(df)
    assert "Expand" not in plan
    assert X.exchange_count(df) == 2


def test_tpch_q6_all_predicates_pushed(spark):
    df = R.tpch_forecast_revenue(_t(spark, "lineitem"))
    pushed = X.pushed_filters(df)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed
    schema = X.read_schema(df)
    assert "l_extendedprice" in schema and "l_returnflag" not in schema


def test_stats_family_plan_shapes(spark):
    from clusterforge_spark.operators import validation as VA

    ev = _t(spark, "events")
    # KS / Mann-Whitney: no cartesian products, no Expand — histogram +
    # window + broadcast-scalar joins only
    for df in (VA.ks_test_value(ev), VA.mannwhitney_value(ev)):
        plan = X.plan_string(df)
        assert "CartesianProduct" not in plan
        assert "Expand" not in plan
    # k-anonymity is a pure two-level aggregate: exactly 2 exchanges
    docs = _t(spark, "documents")
    assert X.exchange_count(VA.k_anonymity(docs)) == 2


def test_normal_equations_single_unified_aggregate(spark):
    from clusterforge_spark.operators.relational import normal_equations

    df = normal_equations(_t(spark, "lineitem"))
    plan = X.plan_string(df)
    # one explode + one hash aggregate — no Expand, a single exchange
    assert "Expand" not in plan
    assert X.exchange_count(df) == 1


def test_spearman_materializes_above_size_threshold(spark):
    """spearman_matrix's re-scan-vs-materialize choice is size-dependent:
    a forced-low threshold must route the 1+len(cols) base references
    through a (lazily local-checkpointed) materialized relation instead
    of repeated file scans; the default at test scale keeps the re-scan.
    Outputs of both branches are identical."""
    li = _t(spark, "lineitem")

    forced = R.spearman_matrix(li, materialize_bytes=0)
    plan_forced = forced._jdf.queryExecution().optimizedPlan().toString()
    assert "Checkpoint" in plan_forced or "LogicalRDD" in plan_forced

    default = R.spearman_matrix(li)
    plan_default = default._jdf.queryExecution().optimizedPlan().toString()
    assert "Checkpoint" not in plan_default and "LogicalRDD" not in plan_default

    assert sorted(map(tuple, forced.collect())) == sorted(
        map(tuple, default.collect())
    )


def test_partition_pruned_read_prunes_directories(spark, tmp_path):
    """The status predicate reaches the scan as a PartitionFilter: only
    the 'F' directory is read (1 of 3 partitions)."""
    from clusterforge_spark.sources.sinks import partition_pruned_read

    df = partition_pruned_read(_t(spark, "orders"), base_dir=str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    files = df._jdf.queryExecution().executedPlan().toString()
    # only the pruned partition's files are scanned
    scanned = [l for l in files.splitlines() if "o_orderstatus=" in l]
    assert all("o_orderstatus=F" in l or "o_orderstatus=" not in l for l in scanned)


def test_tpch_min_cost_supplier_broadcasts_dims_no_cartesian(spark):
    """The Q2 shape broadcasts every dim chain (part, supplier→nation→
    region) below the pair-min aggregate and never degenerates to a
    cartesian product; the per-part min join-back keys on (partkey,
    cost)."""
    df = R.tpch_min_cost_supplier(
        _t(spark, "lineitem"),
        _t(spark, "part"),
        _t(spark, "supplier"),
        _t(spark, "nation"),
        _t(spark, "region"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_pmi_collocations_topk_is_take_ordered(spark):
    """The PMI top-k cut compiles to a distributed TakeOrderedAndProject
    — no single-partition sort or window carries the collocation
    table."""
    from clusterforge_spark.operators import text as TX

    df = TX.pmi_collocations(_t(spark, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_mann_kendall_pair_join_is_broadcast_nested_loop(spark):
    """The O(days²) comparison joins two metadata-sized daily aggregates
    with a broadcast nested-loop join — the fact table is scanned for
    the daily aggregate only, never row-paired."""
    df = R.mann_kendall(_t(spark, "lineitem"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_late_round5_audit_ops_plan_shapes(spark):
    """The round-5 audit additions keep the shapes they were designed
    for: scaler/fence fits broadcast a metadata-sized params row back
    onto the data (no shuffle of the fact side beyond the fit
    aggregate); HHI joins the customer dim by broadcast; none of them
    produce a cartesian product or an Expand."""
    from clusterforge_spark.operators import features as FE
    from clusterforge_spark.operators import validation as VA

    ev = _t(spark, "events")
    rfm = FE.compute_rfm(ev)

    # robust_scaler: the 1-row params frame joins back as a broadcast
    # nested-loop (keyless cross of a single row) — never a shuffle
    sc = FE.robust_scaler(rfm)
    plan = X.plan_string(sc)
    assert "CartesianProduct" not in plan
    assert "Expand" not in plan
    assert "BroadcastExchange" in plan

    # tukey_fences: the per-type quartile frame joins back by key — a
    # broadcast HASH join
    tf = VA.tukey_fences(ev)
    plan = X.plan_string(tf)
    assert "CartesianProduct" not in plan
    assert "Expand" not in plan
    assert X.has_broadcast_join(tf)

    hhi = VA.hhi_by_segment(_t(spark, "orders"), _t(spark, "customer"))
    plan = X.plan_string(hhi)
    assert X.has_broadcast_join(hhi)
    assert "CartesianProduct" not in plan


def test_lorenz_deciles_no_global_row_sort(spark):
    """Lorenz decile ranks come from the two-level prefix sum: the only
    non-partitioned windows in the plan run over the k-row decile
    aggregate and the bucket-totals table — the per-user frame itself
    is never globally sorted (no ntile), and there is no cartesian
    product. The single-partition exchanges are exactly the three
    bounded ones: the prefix-sum bucket-totals table (≈ domain/2^16
    rows), the 1-row n_total aggregate, and the k-row decile window."""
    from clusterforge_spark.operators import validation as VA

    df = VA.lorenz_deciles(_t(spark, "events"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan.lower()
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange SinglePartition") <= 3


def test_interarrival_profile_single_user_shuffle(spark):
    """The gap window and nothing else touches row-level data: one
    hash exchange partitions by (user_id, event_type) for the lag, the
    per-type profile is a two-level hash aggregate above it, and no
    single-partition exchange carries row-level data."""
    df = R.interarrival_profile(_t(spark, "events"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_quantile_normalize_lookup_is_equi_join(spark):
    """The pooled order-statistic lookup executes as the bucket
    EQUI-join (spans exploded to fixed 2^12 rank buckets) — never a
    nested-loop range join, never a cartesian product."""
    from clusterforge_spark.operators import text as TX

    df = TX.quantile_normalize_lengths(_t(spark, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the sole nested-loop is the metadata-sized sources×1 n_total
    # attach; the row-data joins are all hash/sort-merge equi-joins
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# contract-wide single-partition-window sweep (r5 verdict item 1)
# --------------------------------------------------------------------------

#: Queries allowed to plan a partition-less window, with WHY its input is
#: bounded (never data-proportional). The prefix_sum_before bucket-offset
#: window (sort key `_b`, rows = #buckets) is exempted in the sweep itself.
PARTITIONLESS_WINDOW_ALLOWLIST = {
    # calendar-bounded daily/weekly series (rows = #days, never #events)
    "q_acf_daily_revenue",
    "q_bollinger_breaches",
    "q_cusum_changepoint",
    "q_gap_fill_daily",
    "q_kaplan_meier",  # ordered by survival time t in days — calendar-bounded
    "q_ljung_box",
    "q_order_backlog",
    "q_pacf_daily",
    "q_pettitt_changepoint",
    "q_rolling_median",
    "q_runs_test",
    "q_seasonal_naive",
    "q_stl_decompose",
    "q_temporal_split",
    "q_user_growth",
    # domain-bounded histograms (rows = #distinct domain values:
    # 2^12 rank buckets / bounded conversion minutes / discount-qty-tax
    # value domains / per-key count histogram above a hash agg)
    "q_quantile_sketch",
    "q_time_to_convert",
    "q_spearman_matrix",
    "q_key_skew_profile",
    # bounded-by-branch: the adaptive small regime's single-task sort is
    # capped at RFM_SEGMENTS_SMALL_N rows BY CONSTRUCTION; the large
    # regime is plan-pinned by test_rfm_segments_large_regime_plan
    "q_rfm_segments",
    # k-row / fixed-bucket frames (post-TakeOrderedAndProject or 10 deciles)
    "q_lorenz_deciles",
    "q_zipf_slope",
    "q_skyline_orders",
    "q_sim_search_topk",
    "q_sim_search_lsh",
    "q_sim_search_ivf",
    "q_sim_search_ivf_trained",
    "q_sim_search_kcell",  # post-limit k-row rank window (codebook serves from the registry)
    "q_sim_search_kcell_incremental",  # same k-row rank window
    # q_ann_recall / q_ann_recall_batch serve the persisted report — a
    # plain scan with NO windows (r8); they re-enter this list only if
    # the registry is cold, which the sweep never is
    # (q_dim_truncation_recall drops the rank column, so Catalyst prunes
    # its post-limit windows entirely — not an offender)
    "q_quantization_recall",  # 2 post-limit k-row rank windows (exact + quantized)
    "q_sim_search_pq",
    "q_sim_search_ivf_pq",  # two post-limit k-row windows (ADC cut + rerank)
    "q_sim_search_filtered",
}


def test_no_partitionless_window_over_data_proportional_input(spark):
    """Sweep EVERY contract query's optimized plan: a window with no
    PARTITION BY plans a single-partition exchange + one-task sort over
    its whole input — acceptable only when that input is bounded
    (calendar days, value domains, post-limit k rows). The allowlist is
    exact-equality so a new query can neither silently reintroduce a
    data-proportional global sort NOR keep a stale exemption.
    decile_stats / rfm_segments / vocabulary_growth were rebuilt on
    total_order_rank / prefix_sum_before in r6 precisely to leave this
    list."""
    import __spark_entry__ as E

    offenders = set()
    for name, fn in E.queries().items():
        if name.startswith("q_stream_"):
            # replay queries EXECUTE a streaming job at build time just
            # to produce their parquet-capture read — running 7 streams
            # to inspect trivial post-capture scan plans adds minutes
            # for nothing; their streaming plans are windowed aggs under
            # watermarks (bounded state by construction), and their
            # VALUES are oracle-gated per query
            continue
        df = fn(spark, SF_DIR)
        specs = [
            s
            for s in X.partitionless_window_specs(df)
            if not s.startswith("_b#")
        ]
        if specs:
            offenders.add(name)
    assert offenders == PARTITIONLESS_WINDOW_ALLOWLIST, (
        f"new data-proportional global sorts: "
        f"{sorted(offenders - PARTITIONLESS_WINDOW_ALLOWLIST)}; "
        f"stale allowlist entries: "
        f"{sorted(PARTITIONLESS_WINDOW_ALLOWLIST - offenders)}"
    )
    # r7 ADVICE: the sweep must run on the JVM walk, never the silent
    # text-parser fallback — a nonzero counter means py4j API drift
    # quietly reinstated the truncation-prone parser
    assert X.JVM_WALK_FALLBACKS == 0, (
        f"JVM plan walk fell back {X.JVM_WALK_FALLBACKS}× during the "
        "sweep — inspect the partitionless_window_specs warning logs"
    )


def test_rfm_segments_large_regime_plan(spark):
    """Forcing the distributed regime (small_n=0): no partition-less
    window over anything but the prefix-sum bucket offsets — the
    scale path never plans a data-proportional single-task sort."""
    from clusterforge_spark.operators.features import compute_rfm, rfm_segments
    from clusterforge_spark.sources.readers import load_table

    rfm = compute_rfm(load_table(spark, SF_DIR, "events"))
    df = rfm_segments(rfm, small_n=0)
    specs = [
        s for s in X.partitionless_window_specs(df) if not s.startswith("_b#")
    ]
    assert specs == [], f"data-proportional window in large regime: {specs}"


def test_rfm_segments_regimes_agree(spark):
    """Both regimes are exact ntile: identical rows either side of the
    branch on the same input."""
    from clusterforge_spark.operators.features import compute_rfm, rfm_segments
    from clusterforge_spark.sources.readers import load_table

    rfm = compute_rfm(load_table(spark, SF_DIR, "events")).cache()
    small = {r["user_id"]: r for r in rfm_segments(rfm).collect()}
    large = {r["user_id"]: r for r in rfm_segments(rfm, small_n=0).collect()}
    assert set(small) == set(large)
    for uid in small:
        a, b = small[uid], large[uid]
        assert (a["r_score"], a["f_score"], a["m_score"], a["segment"]) == (
            b["r_score"], b["f_score"], b["m_score"], b["segment"]
        )


def test_rfm_segments_regimes_agree_with_null_recency(spark):
    """NULL recency: the small regime's ntile window (recency DESC)
    places NULLs LAST; the large regime maps NULL -> -inf before
    total_order_rank so the distributed rank gives the identical
    placement (the r7 ADVICE fix — total_order_rank's key negation
    would otherwise rank NULLs FIRST and break bit-identity)."""
    from clusterforge_spark.operators.features import rfm_segments

    rows = [
        (
            i,
            float(i % 7) if i % 11 else None,
            float(1 + i % 5),
            float(10 + i % 13),
        )
        for i in range(60)
    ]
    rfm = spark.createDataFrame(
        rows, "user_id long, recency double, frequency double, monetary double"
    )
    small = {
        r["user_id"]: (r["r_score"], r["f_score"], r["m_score"], r["segment"])
        for r in rfm_segments(rfm).collect()
    }
    large = {
        r["user_id"]: (r["r_score"], r["f_score"], r["m_score"], r["segment"])
        for r in rfm_segments(rfm, small_n=0).collect()
    }
    assert small == large


def test_partitionless_window_detector_jvm_walk(spark, events):
    """The r7 JVM-walk detector: finds partition-less windows in the
    main plan AND inside subquery plans (where plan-string truncation
    could hide them from the old text parser), reports them in the
    text parser's spec format, and agrees with the text parser on a
    plain plan. A partitioned window is NOT flagged."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    flat = events.withColumn("rn", F.row_number().over(Window.orderBy("ts")))
    specs = X.partitionless_window_specs(flat)
    assert len(specs) == 1 and specs[0].endswith("ASC NULLS FIRST")
    assert X._partitionless_window_specs_text(flat) == specs

    part = events.withColumn(
        "rn", F.row_number().over(Window.partitionBy("user_id").orderBy("ts"))
    )
    assert X.partitionless_window_specs(part) == []

    events.createOrReplaceTempView("_pl_events")
    sub = events.sparkSession.sql(
        """select user_id from _pl_events where value >
           (select max(v) from (select value as v,
                row_number() over (order by ts) as rn from _pl_events)
            where rn < 5)"""
    )
    assert any(
        s.endswith("ASC NULLS FIRST") for s in X.partitionless_window_specs(sub)
    )


def test_dpp_join_pruned_plan(spark, orders):
    """Dynamic partition pruning (r7): joining the status-partitioned
    fact to a FILTERED broadcast dim on the partition column must plant
    a ``dynamicpruning#`` subquery into the fact scan's
    PartitionFilters — the mechanism that prunes a 100 TB
    date-partitioned fact down to the dim-selected dates at run time.
    The dim filter is opaque to static pruning, so only DPP can prune
    here; the value-level answer is oracle-gated by q_dpp_join_pruned."""
    from clusterforge_spark.sources.sinks import dpp_join_pruned

    df = dpp_join_pruned(orders)
    plan = X.plan_string(df)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    pf = [
        line.strip()
        for line in plan.splitlines()
        if "PartitionFilters" in line and "dynamicpruning" in line
    ]
    assert pf, "fact scan has no dynamic PartitionFilters"


def test_aqe_skew_join_split(spark, events):
    """AQE skew handling (r7): the UNSALTED twin of relational
    .salted_join under an adversarial hot key — one key holding ~93% of
    rows — must be split by AQE's OptimizeSkewedJoin at run time
    (SortMergeJoin(skew=true) in the executed plan), and the explicit
    salted_join must produce the identical row multiset. Preconditions
    the test arranges, as a real cluster would have naturally: several
    map tasks on the skewed side (a skewed reduce partition splits at
    MAPPER boundaries — one single-row-group local file is one mapper,
    so the input is spread first) and thresholds scaled to the local
    fixture's bytes."""
    from pyspark.sql import functions as F

    from clusterforge_spark.operators.relational import salted_join

    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        hot = (
            F.when(F.col("user_id") % 1500 < 1400, F.lit(0))
            .otherwise(F.col("user_id"))
        )
        left = events.repartition(8).select(
            hot.alias("k"), "value", "event_id", "props"
        )
        right = spark.range(1500).select(
            F.col("id").alias("rk"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, F.col("k") == F.col("rk")).select(
            "event_id", (F.col("value") * F.col("w")).alias("x")
        )
        rows = j.collect()
        ep = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in ep, ep[:2000]

        # the explicit salting path gives the identical row multiset
        s = salted_join(left, right, "k", "rk").select(
            "event_id", (F.col("value") * F.col("w")).alias("x")
        )
        srows = s.collect()
        assert len(rows) == len(srows)
        assert sorted((r["event_id"], r["x"]) for r in rows) == sorted(
            (r["event_id"], r["x"]) for r in srows
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_token_budget_mix_large_regime_no_serial_source_window(spark, documents):
    """r7 verdict item 5: forcing the distributed regime, every window
    in the fill plan is either keyed by ≥2 expressions (source + bucket
    / source + tie group) or is the per-source offset window over the
    TINY bucket-totals aggregate (its order key is the bucket id) — no
    window moves one full source's rows through one task."""
    from clusterforge_spark.operators import text as TX

    df = TX._greedy_fill_before(
        TX.quality_score(documents, passthrough=("source",)), small_n=0
    )
    bad = [
        (n, p, o)
        for n, p, o in X.window_spec_arities(df)
        if n < 2 and "_b#" not in o
    ]
    assert bad == [], f"serial per-source fill window in large regime: {bad}"
    # control: the small regime IS the single source-keyed fill window
    small = TX._greedy_fill_before(
        TX.quality_score(documents, passthrough=("source",)), small_n=10**9
    )
    assert any(
        n == 1 and "source" in p for n, p, o in X.window_spec_arities(small)
    )


def test_ivf_pq_serve_plan_scores_codes_not_vectors(spark):
    """r11 IVF-PQ hybrid serve shape, r12 artifact-backed: with the
    registry warm the plan probes the persisted codebook and reads the
    persisted cell-keyed CODES table (no corpus assignment fold, no
    per-query corpus encode — the r11 plan re-derived codes from the
    raw vectors on every call) — the only full-vector distance
    arithmetic is the exact rerank of the rerank·k survivors."""
    import __spark_entry__ as E

    df = E.queries()["q_sim_search_ivf_pq"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "array_min(transform(cells" not in plan, (
        "hybrid serve plan still assigns the corpus against the packed codebook"
    )
    assert "pq_codes" in plan, "ADC scoring must read the codes artifact"
    assert "slice(embedding" not in plan, (
        "hybrid serve plan still PQ-encodes the corpus per query"
    )
    rows = df.collect()
    assert 0 < len(rows) <= 10
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_flat_pq_serve_plan_reads_codes_artifact(spark):
    """r12: the contract's flat-PQ scan (q_sim_search_pq) serves its
    ADC pass from the persisted codes table too — the plan must not
    re-encode the corpus per query; raw vectors appear only in the
    rerank·k id-equi-join fetch."""
    import __spark_entry__ as E

    df = E.queries()["q_sim_search_pq"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "pq_codes" in plan, "ADC scan must read the codes artifact"
    assert "slice(embedding" not in plan, (
        "flat-PQ serve plan still encodes the corpus per query"
    )
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_kcell_serve_plan_uses_posting_lists_not_assignment_fold(spark):
    """r8 serve shape: with the registry warm, q_sim_search_kcell's plan
    probes the persisted inverted lists and fetches vectors by id — the
    per-vector × per-cell assignment fold (array_min over the packed
    codebook) must NOT appear; the only distance arithmetic left is the
    exact cosine rerank of the candidate set."""
    import __spark_entry__ as E

    df = E.queries()["q_sim_search_kcell"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "array_min(transform(cells" not in plan, (
        "serve plan still assigns the corpus against the packed codebook"
    )
    # the inverted lists are read from the registry parquet
    assert "kcell_assigned" in plan
    assert df.count() == 10


def test_banded_salted_plan_carries_salt_only_when_capped(spark, documents):
    """r9/r10: an explicit bucket_cap routes the banded bucket join
    through the 2-D salting (salt/probe columns + the per-bucket size
    table); the DEFAULT path is now the r10 auto profile, which on a
    uniform corpus (max (band,key) bucket 4-5 docs at contract scales)
    must come back salt-free AND free of any per-bucket size aggregate
    in the returned plan — the one eager profile pass is the whole tax,
    and it must not leak a second size-agg stage into the join plan."""
    from clusterforge_spark.operators.dedup import dedup_minhash_banded, docs_with_dups

    docs = docs_with_dups(documents)
    plain = dedup_minhash_banded(docs)._jdf.queryExecution().optimizedPlan().toString()
    salted = dedup_minhash_banded(docs, bucket_cap=64)._jdf.queryExecution().optimizedPlan().toString()
    forced_plain = dedup_minhash_banded(docs, bucket_cap=None)._jdf.queryExecution().optimizedPlan().toString()
    for p in (plain, forced_plain):
        assert "_salt" not in p and "_probe" not in p and "_m#" not in p
    assert "_salt" in salted and "_probe" in salted
