"""Relational operator semantics (plan-quality asserts: tests/test_plans.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from clusterforge_spark.operators import relational as R
from clusterforge_spark.sources.readers import load_table

from tests.conftest import SF_DIR


def test_filter_drops_expected_rows(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    out = R.filter_conjunctive(li)
    manual = li.filter(
        (F.col("l_quantity") > 0)
        & (F.col("l_extendedprice") > 0)
        & F.col("l_orderkey").isNotNull()
        & (F.col("l_discount") < 0.05)
    ).count()
    assert out.count() == manual


def test_top_k_semantics(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    rows = R.top_k(li, k=10).collect()
    assert len(rows) == 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_join_enrich_preserves_lineitem_total(spark):
    df = R.join_enrich(
        load_table(spark, SF_DIR, "lineitem"),
        load_table(spark, SF_DIR, "orders"),
        load_table(spark, SF_DIR, "customer"),
        load_table(spark, SF_DIR, "nation"),
    )
    rows = df.collect()
    assert len(rows) > 0
    total = sum(r.lineitem_count for r in rows)
    assert total == load_table(spark, SF_DIR, "lineitem").count()


def test_window_sessionize_ranks(events):
    out = R.window_sessionize(events)
    first = out.filter(F.col("busy_rank") == 1).groupBy("user_id").count().collect()
    assert all(r["count"] == 1 for r in first)


def test_having_filter_semantics(spark):
    orders = load_table(spark, SF_DIR, "orders")
    out = R.having_filter(orders).collect()
    for r in out:
        assert r.total_spend > 100000.0
        assert r.order_count > 1


def test_retail_csv_reader(spark, tmp_path):
    """Reference-native CSV path: schema, filtering-ready types, strict
    date mode (FIXTURES.md §1; data.rs:102-123)."""
    from clusterforge_spark.sources.readers import read_retail_csv

    csv = tmp_path / "retail.csv"
    csv.write_text(
        "InvoiceNo,StockCode,Description,Quantity,InvoiceDate,UnitPrice,CustomerID,Country\n"
        "536365,85123A,HOLDER,6,12/1/2010 8:26:00,2.55,17850,UK\n"
        "C536368,22960,CANCEL,-6,12/1/2010 9:00:00,3.75,17850,UK\n"
        "536366,71053,METAL,6,12/1/2010 8:28:00,3.39,,UK\n"
    )
    df = read_retail_csv(spark, str(csv))
    rows = df.collect()
    assert len(rows) == 3
    assert dict(df.dtypes)["InvoiceDate"] == "timestamp"
    assert dict(df.dtypes)["CustomerID"] == "bigint"
    kept = df.filter(
        (F.col("Quantity") > 0) & (F.col("UnitPrice") > 0) & F.col("CustomerID").isNotNull()
    ).collect()
    # cancellation (negative qty) and null-customer rows are filtered
    assert [r.InvoiceNo for r in kept] == ["536365"]


def test_salted_join_equals_plain_join(spark):
    """Salting must not change join semantics — same multiset of rows."""
    import pyspark.sql.functions as F

    # skewed left: one hot key with 500 rows, cold keys with 1 each
    left = spark.range(500).select(F.lit(1).alias("k"), F.col("id").alias("lv")).unionByName(
        spark.range(2, 50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("lv"))
    )
    right = spark.range(1, 50).select(F.col("id").alias("rk"), (F.col("id") + 100).alias("rv"))
    plain = left.join(right, left.k == right.rk).select("k", "lv", "rv")
    salted = R.salted_join(left, right, "k", "rk", n_salt=4).select("k", "lv", "rv")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_rolling_window_matches_pandas(spark, events):
    from clusterforge_spark.operators.relational import rolling_window_value

    got = {
        (r.user_id, r.event_id): (round(r.value_1h, 2), r.n_events_1h)
        for r in rolling_window_value(events).collect()
    }
    pdf = events.selectExpr(
        "user_id", "event_id", "unix_micros(ts) AS us", "value"
    ).toPandas()
    want = {}
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values("us")
        for _, row in g.iterrows():
            frame = g[(g.us >= row.us - 3_600_000_000) & (g.us <= row.us)]
            want[(row.user_id, row.event_id)] = (
                round(float(frame.value.round(2).sum()), 2),
                int(len(frame)),
            )
    assert got == want


def test_upsert_orders_semantics(spark, orders):
    from clusterforge_spark.operators.relational import (
        UPSERT_BUMP_MOD,
        UPSERT_NEW_OFFSET,
        upsert_orders,
    )

    base = {r.o_orderkey: r for r in orders.collect()}
    merged = {r.o_orderkey: r for r in upsert_orders(orders).collect()}
    bumped = {k for k in base if k % UPSERT_BUMP_MOD == 0}
    # row count: base + one insert per bumped key
    assert len(merged) == len(base) + len(bumped)
    for k, row in merged.items():
        if k >= UPSERT_NEW_OFFSET:  # inserted rows carry the bump
            assert row.o_orderpriority == "1-URGENT"
            assert k - UPSERT_NEW_OFFSET in bumped
        elif k in bumped:  # updated in place
            assert row.o_orderstatus == "P"
            assert abs(row.o_totalprice - base[k].o_totalprice * 1.1) < 0.011
        else:  # untouched
            assert row.o_totalprice == base[k].o_totalprice


def test_hll_mergeable_estimates_close_to_exact(spark, events):
    from pyspark.sql import functions as F

    from clusterforge_spark.operators.relational import hll_mergeable_distinct

    got = {r.event_type: r.approx_users for r in hll_mergeable_distinct(events).collect()}
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, est in got.items():
        assert abs(est - exact[et]) <= max(2, 0.05 * exact[et])


def test_interarrival_profile_closed_form(spark):
    """Gaps {1s, 2s}: mean 1.5e6 µs, p50 1.5e6 (interpolated),
    p90 1.9e6, CV = 5e5/1.5e6 → 0.3333 at 4dp. Cross-user gaps must
    NOT leak: the second user's lone event contributes no gap."""
    import datetime as dt

    from clusterforge_spark.operators.relational import interarrival_profile

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, "click", t0),
        (2, 1, "click", t0 + dt.timedelta(seconds=1)),
        (3, 1, "click", t0 + dt.timedelta(seconds=3)),
        (4, 2, "click", t0 + dt.timedelta(seconds=9)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = interarrival_profile(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_gaps == 2
    assert r.mean_gap_us == 1_500_000.0
    assert r.p50_gap_us == 1_500_000.0
    assert r.p90_gap_us == 1_900_000.0
    assert r.gap_cv == 0.3333


def test_event_transitions_counts_and_probs(spark, events):
    from pyspark.sql import functions as F

    from clusterforge_spark.operators.relational import event_transitions

    out = event_transitions(events)
    rows = out.collect()
    # every user's chain contributes len-1 transitions
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_events - n_users
    sums = (
        out.groupBy("prev_type").agg(F.sum("prob").alias("s")).collect()
    )
    for r in sums:
        assert abs(r.s - 1.0) < 5e-3  # 4dp rounding per cell


def test_corr_matrix_matches_numpy(spark, lineitem):
    import numpy as np
    import pytest

    from clusterforge_spark.operators.relational import CORR_COLS, corr_matrix

    got = {(r.col_a, r.col_b): r.corr for r in corr_matrix(lineitem).collect()}
    pdf = lineitem.select(*CORR_COLS).toPandas().astype(float)
    for (a, b), c in got.items():
        assert c == pytest.approx(np.corrcoef(pdf[a], pdf[b])[0, 1], abs=2e-4)


def test_session_paths_shape_and_order(spark, events):
    from clusterforge_spark.operators.relational import session_paths

    rows = session_paths(events, k=10).collect()
    assert 0 < len(rows) <= 10
    types = {r.event_type for r in events.select("event_type").distinct().collect()}
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert set(r.path.split(">")) <= types


def test_decile_stats_partition_value_range(spark, events):
    from clusterforge_spark.operators.relational import decile_stats

    rows = sorted(decile_stats(events).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n for r in rows) == events.count()
    # equal-frequency: bucket sizes differ by at most 1
    sizes = {r.n for r in rows}
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
        assert a.lo <= a.hi


def test_scd2_intervals_tile_without_overlap(spark, orders):
    from clusterforge_spark.operators.relational import scd2_build

    rows = scd2_build(orders).collect()
    assert len(rows) == orders.count()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for cust, versions in by_cust.items():
        versions.sort(key=lambda r: r.version)
        assert [r.version for r in versions] == list(range(1, len(versions) + 1))
        currents = [r for r in versions if r.is_current]
        assert len(currents) == 1 and currents[-1].version == len(versions)
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to_us == b.valid_from_us  # contiguous tiling


def test_ewma_matches_python_recurrence(spark, events):
    from clusterforge_spark.operators.relational import EWMA_ALPHA, ewma_per_user

    got = {r.user_id: (r.n_events, r.ewma) for r in ewma_per_user(events).collect()}
    pdf = events.selectExpr(
        "user_id", "unix_micros(ts) AS us", "event_id", "value"
    ).toPandas()
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        s = None
        for v in g.value:
            s = v if s is None else s * (1.0 - EWMA_ALPHA) + v * EWMA_ALPHA
        n, e = got[uid]
        assert n == len(g)
        assert abs(e - s) < 1e-6


def test_session_cooccurrence_counts_match_python(spark, events):
    import math
    from collections import Counter

    from clusterforge_spark.operators.relational import session_cooccurrence

    got = {(r.type_a, r.type_b): r for r in session_cooccurrence(events).collect()}
    pdf = events.selectExpr(
        "user_id", "unix_micros(ts) AS us", "event_id", "event_type"
    ).toPandas()
    gap = 30 * 60_000_000
    sessions = []
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        cur, last = None, None
        for _, row in g.iterrows():
            if last is None or row.us - last > gap:
                cur = set()
                sessions.append(cur)
            cur.add(row.event_type)
            last = row.us
    n_sess = len(sessions)
    singles = Counter(t for s in sessions for t in s)
    pairs = Counter(
        (a, b)
        for s in sessions
        for a in s
        for b in s
        if a < b
    )
    assert set(got) == set(pairs)
    for (a, b), n_ab in pairs.items():
        r = got[(a, b)]
        assert (r.n_ab, r.n_a, r.n_b) == (n_ab, singles[a], singles[b])
        want_pmi = math.log2(n_sess * n_ab / (singles[a] * singles[b]))
        assert abs(r.pmi - want_pmi) < 1e-5


def test_path_pattern_counts_match_python(spark, events):
    import re as _re

    from clusterforge_spark.operators.relational import (
        PATH_PATTERNS,
        _session_path_counts,
        path_pattern_match,
    )

    got = {r.pattern: (r.n_matched, r.pct) for r in path_pattern_match(events).collect()}
    paths = {r.path: r.n_sessions for r in _session_path_counts(events).collect()}
    total = sum(paths.values())
    assert set(got) == {name for name, _ in PATH_PATTERNS}
    any_matched = False
    for name, pat in PATH_PATTERNS:
        want = sum(n for p, n in paths.items() if _re.search(pat, p))
        assert got[name][0] == want
        any_matched = any_matched or want > 0
    assert any_matched  # patterns are live against the real event types


def test_user_growth_invariants(spark, events):
    from clusterforge_spark.operators.relational import user_growth

    rows = sorted(user_growth(events).collect(), key=lambda r: r.day)
    n_users = events.select("user_id").distinct().count()
    assert rows[-1].cum_users == n_users
    assert sum(r.new_users for r in rows) == n_users
    cum = 0
    for r in rows:
        assert r.active_users == r.new_users + r.returning_users
        assert r.returning_users >= 0
        cum += r.new_users
        assert r.cum_users == cum


def test_skyline_is_pareto_frontier(spark, orders):
    from clusterforge_spark.operators.relational import skyline_orders

    sky = {(r.o_orderkey) for r in skyline_orders(orders).collect()}
    rows = orders.selectExpr(
        "o_orderkey", "unix_micros(o_orderdate) AS d", "o_totalprice AS p"
    ).collect()
    # brute-force dominance: dominated iff another row is strictly newer
    # (or equal date, by the operator's sort tie-break) with >= price and
    # strictly better in at least one dim
    for r in rows:
        dominated = any(
            (o.d > r.d and o.p >= r.p) or (o.d == r.d and o.p > r.p)
            for o in rows
            if o.o_orderkey != r.o_orderkey
        )
        assert (r.o_orderkey not in sky) == dominated, r


def test_cohort_ltv_cumulative_monotone(spark, events):
    from clusterforge_spark.operators.relational import cohort_ltv

    rows = cohort_ltv(events).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    total = 0.0
    for cohort, cells in by_cohort.items():
        cells.sort(key=lambda r: r.week_offset)
        cum = 0.0
        for c in cells:
            cum += c.week_value
            assert abs(c.cum_value - cum) < 1e-6
        total += cum
    import pyspark.sql.functions as F

    want = events.agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    ).collect()[0][0]
    assert abs(total - want) < 1e-6


def test_order_reconciliation_deltas_exact(spark, orders, lineitem):
    from clusterforge_spark.operators.relational import order_reconciliation

    rows = order_reconciliation(orders, lineitem).collect()
    for r in rows[:50]:
        assert abs(r.delta - (r.o_totalprice - r.line_net)) < 1e-9
        assert r.delta != 0.0


def test_order_backlog_invariants(spark, orders):
    from clusterforge_spark.operators.relational import order_backlog

    rows = sorted(order_backlog(orders).collect(), key=lambda r: r.week)
    assert sum(r.n_orders for r in rows) == orders.count()
    n_filled = orders.filter("o_orderstatus = 'F'").count()
    assert rows[-1].open_backlog == orders.count() - n_filled
    for r in rows:
        assert 0 <= r.n_filled <= r.n_orders


def test_spearman_matrix_matches_numpy_rank_pearson(spark):
    """Spearman via histogram ranks == Pearson over scipy-style average
    ranks computed in numpy, including ties."""
    import numpy as np

    from clusterforge_spark.operators.relational import spearman_matrix

    rng = [
        (1.00, 10.00, 0.05, 0.01),
        (2.00, 20.00, 0.05, 0.02),
        (2.00, 15.00, 0.00, 0.02),
        (3.00, 30.00, 0.10, 0.03),
        (4.00, 25.00, 0.10, 0.00),
        (4.00, 40.00, 0.05, 0.04),
        (5.00, 35.00, 0.00, 0.04),
    ]
    df = spark.createDataFrame(
        rng,
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double",
    )
    got = {(r.col_a, r.col_b): r.rho for r in spearman_matrix(df).collect()}

    def avg_ranks(x):
        x = np.asarray(x)
        order = np.argsort(x, kind="stable")
        ranks = np.empty(len(x), dtype=np.float64)
        i = 0
        sorted_x = x[order]
        while i < len(x):
            j = i
            while j + 1 < len(x) and sorted_x[j + 1] == sorted_x[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    cols = list(zip(*rng))
    names = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    R = {n: avg_ranks(c) for n, c in zip(names, cols)}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            ra, rb = R[a], R[b]
            want = np.corrcoef(ra, rb)[0, 1]
            # operator output is 6dp-rounded
            assert abs(got[(a, b)] - want) < 5e-7, (a, b, got[(a, b)], want)


def test_dow_seasonality_shares_and_index(spark, events):
    from clusterforge_spark.operators.relational import dow_seasonality

    rows = dow_seasonality(events).collect()
    assert rows and all(0 <= r.dow <= 6 for r in rows)
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        assert abs(sum(r.share_of_type for r in rs) - 1.0) < 1e-3
        # weighted mean of value_index is ~1 by construction
        n = sum(r.n_events for r in rs)
        widx = sum(r.value_index * r.n_events for r in rs) / n
        assert abs(widx - 1.0) < 1e-3


def test_time_to_convert_deciles_monotone(spark, events):
    from clusterforge_spark.operators.relational import time_to_convert

    rows = sorted(time_to_convert(events).collect(), key=lambda r: r.pct)
    assert [r.pct for r in rows] == [d * 10 for d in range(1, 10)]
    vals = [r.minutes_to_convert for r in rows]
    assert vals == sorted(vals)
    assert all(v >= 0 for v in vals)


def test_normal_equations_solve_matches_numpy_lstsq(spark, lineitem):
    """Solving the distributed sufficient statistics on the driver
    recovers the same coefficients as numpy.lstsq on the raw data."""
    import numpy as np

    from clusterforge_spark.operators.relational import (
        MULTIREG_X,
        MULTIREG_Y,
        normal_equations,
    )

    stats = {
        (r.term_a, r.term_b): r.sum_e4 for r in normal_equations(lineitem).collect()
    }
    names = ["1", *MULTIREG_X]
    k = len(names)
    xtx = np.zeros((k, k))
    xty = np.zeros(k)
    for i, a in enumerate(names):
        for j, b in enumerate(names):
            key = (a, b) if (a, b) in stats else (b, a)
            xtx[i, j] = stats[key] / 1e4
        xty[i] = stats[(a, MULTIREG_Y)] / 1e4
    beta = np.linalg.solve(xtx, xty)

    pdf = lineitem.select(*MULTIREG_X, MULTIREG_Y).toPandas().astype(float)
    X = np.column_stack([np.ones(len(pdf)), *[pdf[c] for c in MULTIREG_X]])
    want, *_ = np.linalg.lstsq(X, pdf[MULTIREG_Y].to_numpy(), rcond=None)
    assert np.allclose(beta, want, rtol=1e-6, atol=1e-6)


def test_tpch_promo_revenue_shares(lineitem, spark):
    """Promo share stays within [0, 100] and revenue reconciles with the
    unconditioned join total per month."""
    from clusterforge_spark.operators.relational import tpch_promo_revenue
    from clusterforge_spark.sources.readers import load_table

    part = load_table(spark, "/root/testdata/sf0.001", "part")
    rows = tpch_promo_revenue(lineitem, part).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["promo_pct"] <= 100.0
        assert r["revenue"] > 0
        assert 190001 <= r["ship_month"] <= 210012


def test_tpch_brand_volume_matches_manual_filter(lineitem, spark):
    """Each band's row count equals the hand-evaluated disjunct."""
    import pyspark.sql.functions as F
    from clusterforge_spark.operators.relational import (
        TPCH_BRAND_BANDS,
        tpch_brand_volume,
    )
    from clusterforge_spark.sources.readers import load_table

    part = load_table(spark, "/root/testdata/sf0.001", "part")
    got = {r["band"]: r["n_lineitems"] for r in tpch_brand_volume(lineitem, part).collect()}
    j = lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
    for b, slo, shi, qlo, qhi in TPCH_BRAND_BANDS:
        want = j.filter(
            (F.col("p_brand") == b)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        ).count()
        assert got.get(b, 0) == want


def test_tpch_waiting_suppliers_hand_graph(spark):
    """Constructed orders: only the sole-late supplier on a
    multi-supplier order counts; single-supplier and multi-late orders
    are excluded."""
    import datetime as dt

    from clusterforge_spark.operators.relational import tpch_waiting_suppliers

    d0 = dt.datetime(2024, 1, 1)
    late = dt.datetime(2024, 6, 1)   # > 60 days after d0
    ok = dt.datetime(2024, 1, 15)
    li = spark.createDataFrame(
        [
            # order 1: suppliers 10 (late), 11 (on time) -> 10 culpable
            (1, 10, late), (1, 11, ok),
            # order 2: both late -> nobody culpable
            (2, 10, late), (2, 12, late),
            # order 3: single supplier, late -> excluded (needs >= 2)
            (3, 10, late),
            # order 4: suppliers 11 (late), 10 (on time) -> 11 culpable
            (4, 11, late), (4, 10, ok),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [(i, d0) for i in (1, 2, 3, 4)], "o_orderkey long, o_orderdate timestamp"
    )
    supplier = spark.createDataFrame(
        [(10, "S10"), (11, "S11"), (12, "S12")], "s_suppkey long, s_name string"
    )
    got = {
        r["s_suppkey"]: r["numwait"]
        for r in tpch_waiting_suppliers(li, orders, supplier).collect()
    }
    assert got == {10: 1, 11: 1}


def test_anova_f_closed_form(spark):
    """Two groups, hand-computable F: group A = {10, 20}, B = {40, 50}.
    Means 15/45, grand 30; SSB = 2·15² + 2·15² = 900; SSW = 50+50 = 100;
    F = (900/1)/(100/2) = 18."""
    rows = [("A", 10.0), ("A", 20.0), ("B", 40.0), ("B", 50.0)]
    df = spark.createDataFrame(rows, "o_orderpriority string, o_totalprice double")
    r = R.anova_f(df).collect()[0]
    assert (r["n_groups"], r["n_rows"]) == (2, 4)
    assert (r["df_between"], r["df_within"]) == (1, 2)
    assert abs(r["f_stat"] - 18.0) < 1e-9


def test_acf_alternating_series(spark):
    """A perfectly alternating daily series has ACF(1) = −1·(n−1)/n-ish;
    exactly: devs ±a, lag-1 products all −a², num/den = −(n−1)/n."""
    rows = []
    for t in range(10):
        # one line per day, revenue alternating 100.00 / 200.00, no discount
        rows.append((f"2000-01-{t+1:02d} 00:00:00", 100.0 if t % 2 == 0 else 200.0))
    df = spark.createDataFrame(rows, "ship string, l_extendedprice double").select(
        F.col("ship").cast("timestamp").alias("l_shipdate"),
        "l_extendedprice",
        F.lit(0.0).alias("l_discount"),
    )
    out = {r["lag"]: r["acf"] for r in R.acf_daily_revenue(df, max_lag=2).collect()}
    assert abs(out[1] - round(-9 / 10, 4)) < 1e-9
    assert abs(out[2] - round(8 / 10, 4)) < 1e-9


def test_cusum_finds_planted_level_shift(spark):
    """20 days at 100 then 20 days at 200: the CUSUM statistic peaks at
    the last day of the low regime (day 20)."""
    rows = []
    for t in range(40):
        d = f"2000-{1 + t // 28:02d}-{1 + t % 28:02d} 00:00:00"
        rows.append((d, 100.0 if t < 20 else 200.0))
    df = spark.createDataFrame(rows, "ship string, l_extendedprice double").select(
        F.col("ship").cast("timestamp").alias("l_shipdate"),
        "l_extendedprice",
        F.lit(0.0).alias("l_discount"),
    )
    r = R.cusum_changepoint(df).collect()[0]
    assert r["change_date"] == "2000-01-20"
    # |S_20 − 20/40·S_40| = |2000 − 3000| = 1000
    assert abs(r["cusum_stat"] - 1000.0) < 1e-9


def test_periodogram_planted_period_two(spark):
    """A perfectly alternating series concentrates ALL spectral power at
    period 2: C_2 = Σ dev·cos(πt) = ±n·a, S_2 = 0, so power_frac(2) =
    (na)²/(n·na²) = 1 exactly; every other candidate period gets less."""
    df = _daily_lineitem(spark, [100.0 if t % 2 == 0 else 200.0 for t in range(10)])
    out = {r["period_days"]: r["power_frac"] for r in R.periodogram_daily(df).collect()}
    assert abs(out[2] - 1.0) < 1e-9
    assert all(out[p] <= out[2] + 1e-12 for p in out)


def test_pacf_closed_form_lag2(spark):
    """Alternating 10-day series: r1 = −0.9, r2 = 0.8 (the ACF test's
    values), so phi_1_1 = r1 and phi_2_2 = (r2 − r1²)/(1 − r1²) =
    −0.01/0.19 — Durbin-Levinson by hand."""
    df = _daily_lineitem(spark, [100.0 if t % 2 == 0 else 200.0 for t in range(10)])
    out = {r["lag"]: r["pacf"] for r in R.pacf_daily(df, max_lag=2).collect()}
    assert abs(out[1] - (-0.9)) < 1e-9
    assert abs(out[2] - round(-0.01 / 0.19, 4)) < 2e-4


def test_ccf_planted_lead(spark):
    """Orders spike on day 5, revenue spikes on day 7 (2-day fulfillment
    lag): ccf(l) pairs revenue_t with orders_{t+l}, so the peak lands at
    lag −2."""
    import datetime as dt

    li = _daily_lineitem(spark, [300.0 if t == 7 else 100.0 for t in range(10)])
    d0 = dt.datetime(2024, 1, 1)
    orows = []
    k = 0
    for t in range(10):
        for _ in range(3 if t == 5 else 1):
            orows.append((k, d0 + dt.timedelta(days=t)))
            k += 1
    orders = spark.createDataFrame(
        orows, "o_orderkey long, o_orderdate timestamp"
    )
    rows = R.ccf_revenue_orders(li, orders, max_lag=3).collect()
    assert len(rows) == 7
    best = max(rows, key=lambda r: r["ccf"])
    assert best["lag"] == -2


def test_theil_sen_single_day_returns_null_row(spark):
    """< 2 distinct days → no pairwise slope exists; the report row
    carries null slope/intercept instead of crashing (ADVICE r5)."""
    df = _daily_lineitem(spark, [100.0])
    r = R.theil_sen(df).collect()[0]
    assert (r["n_days"], r["n_pairs"]) == (1, 0)
    assert r["slope_per_day"] is None and r["intercept"] is None


def test_tpch_q12_high_low_split(spark):
    """Hand-built rows hitting every predicate branch: only the
    MAIL/SHIP-mode, late (ship < commit < receipt), in-window lines
    count, split by order priority."""
    import datetime as dt

    from clusterforge_spark.operators.relational import (
        Q12_MODES,
        Q12_RECEIPT_DAYS,
        tpch_shipmode_priority,
    )

    d0 = dt.datetime(1970, 1, 1) + dt.timedelta(days=Q12_RECEIPT_DAYS[0])
    # pick orderkeys whose derived mode is MAIL or SHIP, and one that isn't
    def mode_of(ok, ln):
        return Q12_MODES[(31 * ok + ln) % 7]

    keys = [ok for ok in range(1, 200) if mode_of(ok, 1) in ("MAIL", "SHIP")]
    other = next(ok for ok in range(1, 200) if mode_of(ok, 1) not in ("MAIL", "SHIP"))
    # lateness: clag = (ok + 3) % 60 - 30 must be > 0 and rlag > clag
    def late(ok):
        clag = (ok + 3) % 60 - 30
        rlag = (5 * ok + 7) % 90 - 30
        return clag > 0 and rlag > clag

    hits = [ok for ok in keys if late(ok)][:4]
    assert len(hits) == 4, "need 4 qualifying keys for the fixture"
    li_rows = [(ok, 1, d0) for ok in hits] + [(other, 1, d0)]
    li = spark.createDataFrame(
        li_rows, "l_orderkey long, l_linenumber int, l_shipdate timestamp"
    )
    orders = spark.createDataFrame(
        [(hits[0], "1-URGENT"), (hits[1], "2-HIGH"), (hits[2], "5-LOW"),
         (hits[3], "3-MEDIUM"), (other, "1-URGENT")],
        "o_orderkey long, o_orderpriority string",
    )
    got = {
        r["l_shipmode"]: (r["high_line_count"], r["low_line_count"])
        for r in tpch_shipmode_priority(li, orders).collect()
    }
    assert sum(h for h, _ in got.values()) == 2
    assert sum(lo for _, lo in got.values()) == 2
    assert set(got) <= {"MAIL", "SHIP"}


def test_tpch_q13_counts_zero_order_customers(spark):
    """A customer with only excluded-priority orders lands in the
    c_count = 0 bucket — the left-join semantics Q13 exists to test."""
    cust = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey long")
    orders = spark.createDataFrame(
        [(10, 1, "5-LOW"), (11, 1, "5-LOW"), (12, 2, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    got = {
        r["c_count"]: r["custdist"]
        for r in R.tpch_customer_distribution(cust, orders).collect()
    }
    assert got == {2: 1, 0: 2}


def test_tpch_q15_returns_all_tied_top_suppliers(spark):
    """Two suppliers with identical exact revenue both surface — the
    equality is on exact e4 integers, not rounded doubles."""
    li = spark.createDataFrame(
        [
            (1, 100.0, 0.0, "1996-02-01 00:00:00"),
            (2, 50.0, 0.0, "1996-02-01 00:00:00"),
            (2, 50.0, 0.0, "1996-02-02 00:00:00"),
            (3, 99.0, 0.0, "1996-02-01 00:00:00"),
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, ship string",
    ).select("l_suppkey", "l_extendedprice", "l_discount", F.col("ship").cast("timestamp").alias("l_shipdate"))
    supp = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s3")], "s_suppkey long, s_name string"
    )
    got = sorted(r["s_suppkey"] for r in R.tpch_top_supplier(li, supp).collect())
    assert got == [1, 2]


def test_tpch_min_cost_supplier_region_size_and_ties(spark):
    """Q2-shape hand case: out-of-region offers and wrong-size parts are
    excluded, the min unit cost is over ALL of a supplier's lineitems,
    and cost ties keep every tied supplier."""
    from clusterforge_spark.operators.relational import tpch_min_cost_supplier

    region = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey long, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "N0", 0), (1, "N1", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    supplier = spark.createDataFrame(
        [(10, "S10", 0, 5.0), (11, "S11", 0, 7.5), (12, "S12", 1, 1.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    part = spark.createDataFrame(
        [(100, "P100", 15), (101, "P101", 9)],
        "p_partkey long, p_name string, p_size long",
    )
    li = spark.createDataFrame(
        [
            (100, 10, 10.0, 2.0),   # unit 500 cents
            (100, 10, 30.0, 10.0),  # unit 300 -> S10 min
            (100, 11, 3.0, 1.0),    # unit 300 -> ties S10
            (100, 12, 0.5, 1.0),    # cheapest but ASIA -> excluded
            (101, 10, 0.01, 1.0),   # wrong size -> excluded
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_quantity double",
    )
    got = sorted(
        (r["p_partkey"], r["s_suppkey"], r["min_unit_cost"])
        for r in tpch_min_cost_supplier(li, part, supplier, nation, region).collect()
    )
    assert got == [(100, 10, 3.0), (100, 11, 3.0)]


def test_tpch_important_stock_mean_multiple_threshold(spark):
    """Q11-shape hand case: threshold is mean_mult x the mean per-part
    value over the nation's supply -- values 100/10/10 with mult 2 keep
    only the 100 (300 > 240; 30 <= 240)."""
    from clusterforge_spark.operators.relational import tpch_important_stock

    nation = spark.createDataFrame(
        [(0, "NX", 0), (1, "NY", 0)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    supplier = spark.createDataFrame(
        [(10, 0), (11, 1)], "s_suppkey long, s_nationkey long"
    )
    li = spark.createDataFrame(
        [
            (1, 10, 100.0, 0.0),
            (2, 10, 10.0, 0.0),
            (3, 10, 10.0, 0.0),
            (4, 11, 999.0, 0.0),  # other nation -> out of scope
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    rows = tpch_important_stock(li, supplier, nation, nation_name="NX").collect()
    assert [(r["p_partkey"], r["stock_value"]) for r in rows] == [(1, 100.0)]


def test_tpch_parts_supplier_counts_excludes_complainers_and_brand(spark):
    """Q16-shape hand case: duplicate supply pairs collapse, negative-
    balance suppliers drop via anti join, the excluded brand never
    groups, and the count is distinct suppliers per (brand, type, size)."""
    from clusterforge_spark.operators.relational import tpch_parts_supplier_counts

    supplier = spark.createDataFrame(
        [(10, 5.0), (11, -1.0), (12, 0.0)],
        "s_suppkey long, s_acctbal double",
    )
    part = spark.createDataFrame(
        [
            (100, "BrandA", "STANDARD", 5),
            (101, "Brand#23", "STANDARD", 5),
            (102, "BrandA", "STANDARD", 5),
        ],
        "p_partkey long, p_brand string, p_type string, p_size long",
    )
    li = spark.createDataFrame(
        [(100, 10), (100, 10), (100, 11), (100, 12), (101, 10), (102, 12)],
        "l_partkey long, l_suppkey long",
    )
    rows = tpch_parts_supplier_counts(li, part, supplier).collect()
    assert [
        (r["p_brand"], r["p_type"], r["p_size"], r["supplier_cnt"]) for r in rows
    ] == [("BrandA", "STANDARD", 5, 2)]


def test_tpch_excess_supply_window_concentration(spark):
    """Q20-shape hand case: only the (supplier, part) pair with more
    than half its quantity inside the window counts, non-PROMO parts are
    out of scope, and the per-supplier excess count/quantity aggregate
    is exact."""
    import datetime as dt

    from clusterforge_spark.operators.relational import tpch_excess_supply

    inside = dt.datetime(1995, 6, 1)
    outside = dt.datetime(1994, 6, 1)
    nation = spark.createDataFrame(
        [(0, "N0")], "n_nationkey long, n_name string"
    )
    supplier = spark.createDataFrame(
        [(10, "S10", 0), (11, "S11", 0)],
        "s_suppkey long, s_name string, s_nationkey long",
    )
    part = spark.createDataFrame(
        [(100, "PROMO"), (101, "PROMO"), (102, "ECONOMY")],
        "p_partkey long, p_type string",
    )
    li = spark.createDataFrame(
        [
            (100, 10, 6.0, inside), (100, 10, 4.0, outside),   # 12 > 10 -> excess
            (101, 10, 5.0, inside), (101, 10, 5.0, outside),   # 10 > 10 false
            (100, 11, 4.0, outside),                           # 0 in window
            (102, 11, 9.0, inside),                            # non-PROMO
        ],
        "l_partkey long, l_suppkey long, l_quantity double, l_shipdate timestamp",
    )
    rows = tpch_excess_supply(li, part, supplier, nation).collect()
    assert [
        (r["s_suppkey"], r["s_name"], r["n_name"], r["n_excess_parts"],
         r["excess_win_qty"])
        for r in rows
    ] == [(10, "S10", "N0", 1, 6)]


def test_stl_decompose_linear_ramp(spark):
    """Closed form: a linear daily-revenue ramp has trend == revenue
    (centered MA of a linear series is its center), so detrended,
    seasonal and residual are all exactly zero; edge days without a full
    7-point window are excluded."""
    import datetime as dt

    from clusterforge_spark.operators.relational import stl_decompose

    base = dt.datetime(1995, 1, 5)  # far from epoch edges
    rows = [
        (base + dt.timedelta(days=i), float(10 + i), 0.0) for i in range(14)
    ]
    li = spark.createDataFrame(
        rows, "l_shipdate timestamp, l_extendedprice double, l_discount double"
    )
    got = sorted(
        (r["revenue"], r["trend"], r["seasonal"], r["residual"])
        for r in stl_decompose(li).collect()
    )
    assert len(got) == 14 - 6  # 3 trimmed each side
    for rev, trend, seas, resid in got:
        assert trend == rev
        assert seas == 0.0 and resid == 0.0


def test_pmi_collocations_hand_counts(spark):
    """Closed form on one 6-token doc 'x y x y x y': PMI(x y) =
    log2(c_xy * N_uni^2 / (N_bi * c_x * c_y)) = log2(3*36/(5*9))."""
    import math

    from clusterforge_spark.operators.text import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "x y x y x y")], "doc_id long, text string"
    )
    rows = {
        r["bigram"]: r for r in pmi_collocations(docs, min_count=1, k=10).collect()
    }
    assert set(rows) == {"x y", "y x"}
    xy = rows["x y"]
    assert (xy["c_bigram"], xy["c_w1"], xy["c_w2"]) == (3, 3, 3)
    assert xy["pmi"] == round(
        math.floor(math.log2(3 * 36 / (5 * 9)) * 1e4 + 0.5) / 1e4, 4
    ) or abs(xy["pmi"] - math.log2(2.4)) < 1e-3


def test_mann_kendall_closed_form(spark):
    """Three strictly increasing days: S = 3, no ties, var = 66/18,
    z = 2/sqrt(66/18)."""
    import datetime as dt
    import math

    from clusterforge_spark.operators.relational import mann_kendall

    base = dt.datetime(1995, 1, 5)
    li = spark.createDataFrame(
        [(base + dt.timedelta(days=i), float(i + 1), 0.0) for i in range(3)],
        "l_shipdate timestamp, l_extendedprice double, l_discount double",
    )
    r = mann_kendall(li).collect()[0]
    assert (r["n_days"], r["s_stat"]) == (3, 3)
    var = 3 * 2 * 11 / 18.0
    assert r["var_s"] == round(math.floor(var * 1e4 + 0.5) / 1e4, 4)
    assert abs(r["z"] - 2.0 / math.sqrt(var)) < 1e-4


def test_mann_kendall_tie_correction(spark):
    """Two equal days among three: the tie group (t=2) subtracts
    t(t-1)(2t+5) = 18 from the variance numerator."""
    import datetime as dt

    from clusterforge_spark.operators.relational import mann_kendall

    base = dt.datetime(1995, 1, 5)
    li = spark.createDataFrame(
        [
            (base, 5.0, 0.0),
            (base + dt.timedelta(days=1), 5.0, 0.0),
            (base + dt.timedelta(days=2), 9.0, 0.0),
        ],
        "l_shipdate timestamp, l_extendedprice double, l_discount double",
    )
    r = mann_kendall(li).collect()[0]
    # pairs: (d0,d1) tie -> 0, (d0,d2) +1, (d1,d2) +1
    assert r["s_stat"] == 2
    assert r["var_s"] == round((66 - 18) / 18.0, 4)


def test_kaplan_meier_closed_form(spark):
    """Four customers, horizon day 200 → cut 110: two churn at t=10
    (S drops to 0.5), two censored (t=100, t=150) never drop it."""
    import datetime as dt

    from clusterforge_spark.operators.relational import kaplan_meier

    d0 = dt.datetime(1995, 1, 1)

    def o(cust, day):
        return (cust, d0 + dt.timedelta(days=day), 1.0)

    orders = spark.createDataFrame(
        [o(1, 0), o(1, 10), o(2, 0), o(2, 10), o(3, 0), o(3, 150),
         o(4, 100), o(4, 200)],
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    rows = {r["lifetime_days"]: r for r in kaplan_meier(orders).collect()}
    assert set(rows) == {10, 100, 150}
    assert (rows[10]["n_risk"], rows[10]["n_events"], rows[10]["n_censored"]) == (4, 2, 0)
    assert rows[10]["survival"] == 0.5
    assert (rows[100]["n_risk"], rows[100]["n_events"]) == (2, 0)
    assert rows[100]["survival"] == 0.5
    assert (rows[150]["n_risk"], rows[150]["n_censored"]) == (1, 1)
    assert rows[150]["survival"] == 0.5


def test_kaplan_meier_curve_hits_zero_without_ln0(spark):
    """When the last at-risk customer churns the curve is exactly 0.0
    (the zero-factor flag, not exp(ln(0)) → null/-inf)."""
    import datetime as dt

    from clusterforge_spark.operators.relational import kaplan_meier

    d0 = dt.datetime(1995, 1, 1)
    # both customers churn: lifetimes 10 and 20, horizon 300 → cut 210
    orders = spark.createDataFrame(
        [(1, d0, 1.0), (1, d0 + dt.timedelta(days=10), 1.0),
         (2, d0, 1.0), (2, d0 + dt.timedelta(days=20), 1.0),
         (3, d0 + dt.timedelta(days=300), 1.0)],
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    rows = {r["lifetime_days"]: r for r in kaplan_meier(orders).collect()}
    # t=20: n_risk=2 (cust2 + cust3 at t=0? no: cust3 lifetime 0, censored at t=0)
    assert rows[20]["survival"] == 0.0


def test_temporal_split_closed_form(spark):
    """Ten orders on ten distinct days → cutoff is day 8 (⌊10·4/5⌋):
    8 train / 2 test, exact DECIMAL revenue per side."""
    import datetime as dt

    from clusterforge_spark.operators.relational import temporal_split

    d0 = dt.datetime(1995, 1, 1)
    orders = spark.createDataFrame(
        [(i, d0 + dt.timedelta(days=i), float(i + 1)) for i in range(10)],
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    rows = {r["split"]: r for r in temporal_split(orders).collect()}
    assert rows["train"]["n_orders"] == 8
    assert rows["test"]["n_orders"] == 2
    assert rows["train"]["min_date"] == "1995-01-01"
    assert rows["train"]["max_date"] == "1995-01-08"
    assert rows["test"]["min_date"] == "1995-01-09"
    assert rows["train"]["total_price"] == sum(range(1, 9))
    assert rows["test"]["total_price"] == 9.0 + 10.0


def test_market_basket_closed_form(spark):
    """(p1,p2) co-occurs in 3 of 4 orders: support 3/4, confidence 3/4,
    lift 3·4/(4·3) = 1; the once-only pair is below min support."""
    import datetime as dt

    from clusterforge_spark.operators.relational import market_basket

    t = dt.datetime(1995, 1, 1)
    rows = []
    for ok in (1, 2, 3):
        rows += [(ok, 101, t), (ok, 202, t)]
    rows += [(4, 101, t), (4, 303, t)]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_shipdate timestamp"
    )
    out = market_basket(li).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["p1"], r["p2"], r["n_both"]) == (101, 202, 3)
    assert r["support"] == 0.75
    assert r["confidence"] == 0.75
    assert r["lift"] == 1.0


def test_rolling_median_daily_closed_form(spark):
    """Five days at 10,10,1000,10,10 (a one-day spike): the ±3-row
    frame spans the whole series for the middle days, so every med7 is
    10.0 and the spike's residual is exactly 990. Edge frames (first
    day sees 4 values 10,10,1000,10 → interpolated median 10)."""
    import datetime as dt

    from clusterforge_spark.operators.relational import rolling_median_daily

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i, rev in enumerate([10.0, 10.0, 1000.0, 10.0, 10.0]):
        rows.append((base + dt.timedelta(days=i), rev, 0.0))
    df = spark.createDataFrame(
        rows, "l_shipdate timestamp, l_extendedprice double, l_discount double"
    )
    out = {r.day: r for r in rolling_median_daily(df).collect()}
    assert len(out) == 5
    days = sorted(out)
    spike = out[days[2]]
    assert spike.revenue == 1000.0
    assert spike.med7 == 10.0
    assert spike.residual == 990.0
    assert all(out[d].med7 == 10.0 for d in days)
    assert all(out[d].residual == 0.0 for d in days if d != days[2])


def test_weekly_churn_closed_form(spark):
    """Users {1,2,3} active in week 0; only {1,2} return in week 1;
    only {1} in week 2 → week-0 churn 1/3, week-1 churn 1/2; week 2
    (the max week) is excluded — no lookahead exists for it."""
    import datetime as dt

    from clusterforge_spark.operators.relational import weekly_churn

    t0 = dt.datetime(1970, 1, 1)  # epoch-week 0 by construction
    rows = []
    eid = 0
    for wk, users in enumerate([[1, 2, 3], [1, 2], [1]]):
        for u in users:
            eid += 1
            rows.append((eid, u, t0 + dt.timedelta(weeks=wk)))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r.wk: r for r in weekly_churn(df).collect()}
    assert sorted(out) == [0, 1]
    assert out[0].n_active == 3 and out[0].n_retained == 2
    assert out[0].n_churned == 1 and out[0].churn_rate == 0.3333
    assert out[1].n_active == 2 and out[1].n_retained == 1
    assert out[1].churn_rate == 0.5


def test_user_behavior_profile_closed_form(spark):
    """User 1: 3 clicks + 1 view → top 'click' 0.75, H = 0.811278
    (= −¾log2¾ − ¼log2¼). User 2: tie 2-2 between 'view' and 'click'
    → lexicographic tie-break picks 'click'; H = 1."""
    import datetime as dt

    from clusterforge_spark.operators.relational import user_behavior_profile

    t = dt.datetime(2024, 1, 1)
    rows = [(i, 1, et, t) for i, et in enumerate(["click"] * 3 + ["view"])]
    rows += [(10 + i, 2, et, t) for i, et in enumerate(["view", "click", "view", "click"])]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r.user_id: r for r in user_behavior_profile(df).collect()}
    assert out[1].top_type == "click" and out[1].top_share == 0.75
    assert out[1].type_entropy == 0.811278
    assert out[2].top_type == "click" and out[2].top_share == 0.5
    assert out[2].type_entropy == 1.0


def test_fulfillment_latency_closed_form(spark):
    """Latencies {1,2,10} days for one priority: mean 4.3333, p50 2,
    p90 = 2 + 0.8·8 = 8.4, max 10."""
    import datetime as dt

    from clusterforge_spark.operators.relational import fulfillment_latency

    d0 = dt.date(2024, 1, 1)
    orders = spark.createDataFrame(
        [(k, d0, "1-URGENT") for k in (1, 2, 3)],
        "o_orderkey long, o_orderdate date, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(1, d0 + dt.timedelta(days=1)), (2, d0 + dt.timedelta(days=2)),
         (3, d0 + dt.timedelta(days=10))],
        "l_orderkey long, l_shipdate date",
    )
    r = fulfillment_latency(li, orders).collect()[0]
    assert r.n_lineitems == 3
    assert r.mean_days == 4.3333
    assert r.p50_days == 2.0
    assert r.p90_days == 8.4
    assert r.max_days == 10


def test_longest_streak_closed_form(spark):
    """User 1 active on days {0,1,2,5,6}: runs {3,2} → longest 3,
    2 streaks, 5 active days. User 2: single day → 1/1/1. Duplicate
    events on one day must not split runs."""
    import datetime as dt

    from clusterforge_spark.operators.relational import longest_streak

    d0 = dt.datetime(1970, 1, 1)
    rows = [(i, 1, "click", d0 + dt.timedelta(days=d))
            for i, d in enumerate([0, 1, 2, 5, 6, 2])]  # day 2 twice
    rows.append((99, 2, "view", d0 + dt.timedelta(days=10)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r.user_id: r for r in longest_streak(df).collect()}
    assert out[1].n_active_days == 5
    assert out[1].n_streaks == 2
    assert out[1].longest_streak == 3
    assert out[2].n_active_days == 1 and out[2].longest_streak == 1


def test_rolling_active_users_closed_form(spark):
    """Users {1,2} on day 0, user 1 on day 2, nobody days 1,3:
    spine = [0,2]; day0 dau=2 wau=2; day1 dau=0 wau=2 (trailing
    window covers day 0); day2 dau=1 wau=2, stickiness 0.5."""
    import datetime as dt

    from clusterforge_spark.operators.relational import rolling_active_users

    d0 = dt.datetime(1970, 1, 1)
    rows = [(1, 1, "c", d0), (2, 2, "c", d0),
            (3, 1, "c", d0 + dt.timedelta(days=2))]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r.epoch_day: r for r in rolling_active_users(df).collect()}
    assert sorted(out) == [0, 1, 2]
    assert out[0].dau == 2 and out[0].wau_7d == 2 and out[0].stickiness == 1.0
    assert out[1].dau == 0 and out[1].wau_7d == 2 and out[1].stickiness == 0.0
    assert out[2].dau == 1 and out[2].wau_7d == 2 and out[2].stickiness == 0.5


def test_returns_rate_by_brand_closed_form(spark):
    """Brand A: 2 lines (one returned), revenue 10+20=30, returned 20
    → rate 0.5, returned_revenue 20.0. Brand B: no returns."""
    from clusterforge_spark.operators.relational import returns_rate_by_brand

    li = spark.createDataFrame(
        [(1, 100, 1, 10.0, 0.0, "N"), (1, 100, 2, 20.0, 0.0, "R"),
         (2, 200, 1, 5.0, 0.0, "N")],
        "l_orderkey long, l_partkey long, l_linenumber int, "
        "l_extendedprice double, l_discount double, l_returnflag string",
    )
    part = spark.createDataFrame(
        [(100, "A"), (200, "B")], "p_partkey long, p_brand string"
    )
    out = {r.p_brand: r for r in returns_rate_by_brand(li, part).collect()}
    assert out["A"].n_lines == 2 and out["A"].n_returned == 1
    assert out["A"].return_rate == 0.5
    assert out["A"].revenue == 30.0 and out["A"].returned_revenue == 20.0
    assert out["B"].n_returned == 0 and out["B"].returned_revenue == 0.0


def test_kendall_daily_closed_form(spark):
    """Three days with (rev, qty) = (10,1), (20,3), (30,2): pairs
    (1,2) concordant, (1,3) concordant, (2,3) discordant → tau_b =
    (2−1)/sqrt(3·3) = 0.333333, no ties."""
    import datetime as dt

    from clusterforge_spark.operators.relational import kendall_daily

    d0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 10.0, 0.0, 1.0, d0),
        (2, 20.0, 0.0, 3.0, d0 + dt.timedelta(days=1)),
        (3, 30.0, 0.0, 2.0, d0 + dt.timedelta(days=2)),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_extendedprice double, l_discount double, "
        "l_quantity double, l_shipdate timestamp",
    )
    r = kendall_daily(df).collect()[0]
    assert r.n_days == 3 and r.n_pairs == 3
    assert r.concordant == 2 and r.discordant == 1
    assert r.ties_rev == 0 and r.ties_qty == 0
    assert r.tau_b == 0.333333


def test_latency_moments_vs_numpy(spark):
    """Exact power-sum moments equal numpy's population moments on the
    same integer latencies (scipy-convention skew/excess kurtosis)."""
    import datetime as dt

    import numpy as np

    from clusterforge_spark.operators.relational import latency_moments

    lats = [1, 2, 2, 3, 10, 40]
    d0 = dt.date(2024, 1, 1)
    orders = spark.createDataFrame(
        [(k, d0, "1-URGENT") for k in range(len(lats))],
        "o_orderkey long, o_orderdate date, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(k, d0 + dt.timedelta(days=int(v))) for k, v in enumerate(lats)],
        "l_orderkey long, l_shipdate date",
    )
    r = latency_moments(li, orders).collect()[0]
    x = np.array(lats, dtype=float)
    m2 = ((x - x.mean()) ** 2).mean()
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    assert r.n == 6
    assert abs(r.mean_days - x.mean()) < 1e-6
    assert abs(r.var_pop - m2) < 1e-5
    assert abs(r.skewness - m3 / m2**1.5) < 1e-5
    assert abs(r.kurtosis_excess - (m4 / m2**2 - 3)) < 1e-5


def test_new_vs_returning_closed_form(spark):
    """Cust 1 orders in Jan (first) and Feb; cust 2 only Feb. Jan:
    1 new order 100.00. Feb: cust 1 returning 50.00 + cust 2 new
    25.00 → new_rev_share = 25/75 = 0.3333."""
    import datetime as dt

    from clusterforge_spark.operators.relational import new_vs_returning

    rows = [
        (1, 1, 100.0, dt.date(2024, 1, 5)),
        (2, 1, 50.0, dt.date(2024, 2, 10)),
        (3, 2, 25.0, dt.date(2024, 2, 20)),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate date"
    )
    out = {r.ym: r for r in new_vs_returning(df).collect()}
    assert out[202401].n_new == 1 and out[202401].n_returning == 0
    assert out[202401].rev_new == 100.0 and out[202401].new_rev_share == 1.0
    assert out[202402].n_new == 1 and out[202402].n_returning == 1
    assert out[202402].rev_new == 25.0 and out[202402].rev_returning == 50.0
    assert out[202402].new_rev_share == 0.3333


def _daily_lineitem(spark, values, start=None):
    """One lineitem row per day with l_extendedprice = value: the daily
    e4 revenue series is exactly value*1e4·100... i.e. value*100 cents
    × 100 = value·1e4 e4-units, so the series is proportional to the
    input values (discount 0)."""
    import datetime as dt

    d0 = start or dt.datetime(2024, 1, 1)
    rows = [
        (i, float(v), 0.0, 1.0, d0 + dt.timedelta(days=i))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_extendedprice double, l_discount double, "
        "l_quantity double, l_shipdate timestamp",
    )


def test_seasonal_naive_vs_numpy(spark):
    import numpy as np

    from clusterforge_spark.operators.relational import seasonal_naive_mase

    vals = [10, 12, 9, 14, 11, 13, 10, 11, 13, 8, 15, 12, 12, 11, 10, 14]
    r = seasonal_naive_mase(_daily_lineitem(spark, vals)).collect()[0]
    x = np.array(vals, dtype=float)
    mae7 = np.abs(x[7:] - x[:-7]).mean()
    mae1 = np.abs(x[1:] - x[:-1]).mean()
    assert r.n_days == len(vals)
    assert abs(r.mae_seasonal - mae7) < 1e-9
    assert abs(r.mae_naive - mae1) < 1e-9
    assert abs(r.mase - mae7 / mae1) < 1e-4


def test_pettitt_matches_sign_bruteforce(spark):
    """The midrank identity must reproduce the literal
    U_t = ΣΣ sgn(x_j − x_i) definition, ties included."""
    import numpy as np

    from clusterforge_spark.operators.relational import pettitt_changepoint

    vals = [5, 7, 5, 6, 9, 12, 11, 12, 13, 12]  # shift up at index 4, ties
    x = np.array(vals, dtype=float)
    n = len(x)
    u = [
        sum(np.sign(x[j] - x[i]) for i in range(t + 1) for j in range(t + 1, n))
        for t in range(n - 1)
    ]
    k_exp = int(max(abs(v) for v in u))
    t_best = min(t for t, v in enumerate(u) if abs(v) == k_exp)
    r = pettitt_changepoint(_daily_lineitem(spark, vals)).collect()[0]
    assert r.k_stat == k_exp
    assert r.change_date == f"2024-01-{1 + t_best:02d}"
    p = min(1.0, 2.0 * np.exp(-6.0 * k_exp * k_exp / (n**3 + n**2)))
    assert abs(r.p_approx - p) < 1e-6


def test_bollinger_breaches_closed_form(spark):
    """Flat series + one huge spike on a full-window day: exactly one
    upper breach; the first 6 days (incomplete window) are excluded."""
    from clusterforge_spark.operators.relational import bollinger_breaches

    vals = [10.0] * 9 + [100.0] + [10.0] * 5
    out = {r.ym: r for r in bollinger_breaches(_daily_lineitem(spark, vals)).collect()}
    jan = out["2024-01"]
    assert jan.n_days == len(vals) - 6
    assert jan.n_upper == 1
    # the post-spike days have the spike inside their window (huge σ) —
    # a flat 10 is not below mean − 2σ there, and the flat tail windows
    # containing only 10s have σ = 0 with x = mean
    assert jan.n_lower == 0


def test_ljung_box_vs_numpy(spark):
    import numpy as np

    from clusterforge_spark.operators.relational import ljung_box

    vals = [10, 12, 9, 14, 11, 13, 10, 11, 13, 8, 15, 12, 12, 11, 10, 14, 9, 13]
    x = np.array(vals, dtype=float)
    n = len(x)
    dev = x - x.mean()
    den = (dev * dev).sum()
    q = 0.0
    for k in range(1, 8):
        r_k = (dev[k:] * dev[:-k]).sum() / den
        q += r_k * r_k / (n - k)
    q *= n * (n + 2)
    r = ljung_box(_daily_lineitem(spark, vals)).collect()[0]
    assert r.n_days == n and r.m_lags == 7
    assert abs(r.q_stat - q) < 1e-3


def test_runs_test_closed_form(spark):
    """Series 1,9,1,9,... strictly alternates around its median band:
    with values {1,9} the lower median is 1, equal-to-median days drop,
    leaving all the 9s = one run each... use a 3-level series instead
    where the median is unique."""
    import numpy as np

    from clusterforge_spark.operators.relational import runs_test

    # median (lower, of 7) = 5; drops the one 5; signs: 1,9,1,9,9,1 →
    # runs: [1][9][1][9 9][1] = 5 runs, n1 (above)=3, n2=3
    vals = [1, 9, 1, 9, 5, 9, 1]
    r = runs_test(_daily_lineitem(spark, vals)).collect()[0]
    assert r.n_above == 3 and r.n_below == 3 and r.n_runs == 5
    n1, n2 = 3.0, 3.0
    nn = n1 + n2
    mu = 2.0 * n1 * n2 / nn + 1.0
    sig2 = 2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) / (nn * nn * (nn - 1.0))
    z = (5 - mu) / np.sqrt(sig2)
    assert abs(r.z_stat - z) < 1e-4


def test_grubbs_vs_numpy(spark):
    import numpy as np

    from clusterforge_spark.operators.relational import grubbs_outlier

    vals = [10, 11, 10, 12, 11, 10, 50, 11, 12, 10]
    x = np.array(vals, dtype=float)
    g = np.max(np.abs(x - x.mean())) / x.std(ddof=1)
    r = grubbs_outlier(_daily_lineitem(spark, vals)).collect()[0]
    assert r.n_days == len(vals)
    assert r.outlier_date == "2024-01-07"
    assert abs(r.g_stat - g) < 1e-4
