"""Data validation & profiling operators."""

from __future__ import annotations

from clusterforge_spark.operators import validation as VA


def test_expectation_checks_all_pass(spark, orders):
    from clusterforge_spark.sources.readers import load_table

    from tests.conftest import SF_DIR

    customer = load_table(spark, SF_DIR, "customer")
    rows = {r.check: r for r in VA.expectation_checks(orders, customer).collect()}
    assert set(rows) == {"pk_unique", "fk_customer", "non_negative", "status_domain"}
    assert all(r.passed and r.n_violations == 0 for r in rows.values())


def test_expectation_checks_catch_violations(spark, orders):
    from pyspark.sql import functions as F

    # poison the feed: duplicate one key, negative price, bad status
    bad = orders.limit(1).select(
        "o_orderkey",
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        F.lit(-5.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    poisoned = orders.unionByName(bad)
    rows = {r.check: r for r in VA.expectation_checks(poisoned, orders.select(
        F.col("o_custkey").alias("c_custkey")).distinct()).collect()}
    assert rows["pk_unique"].n_violations == 2  # both copies of the dup key
    assert rows["non_negative"].n_violations == 1
    assert rows["status_domain"].n_violations == 1


def test_snapshot_diff_classifies_planted_changes(spark, orders):
    base = {r.o_orderkey for r in orders.select("o_orderkey").collect()}
    got = {}
    for r in VA.snapshot_diff(orders, VA.orders_v2(orders)).collect():
        got.setdefault(r.change_type, set()).add(r.o_orderkey)
    want_removed = {k for k in base if k % VA.SNAP_DROP_MOD == 0}
    want_added = {
        k + VA.SNAP_NEW_OFFSET for k in base if k % VA.SNAP_NEW_MOD == 0
    }
    want_changed = {
        k
        for k in base
        if k % VA.SNAP_BUMP_MOD == 0 and k % VA.SNAP_DROP_MOD != 0
    }
    assert got.get("removed", set()) == want_removed
    assert got.get("added", set()) == want_added
    assert got.get("changed", set()) == want_changed


def test_profile_matches_pandas(spark, orders):
    import math

    from clusterforge_spark.sources.readers import load_table

    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem")
    prof = {r.column: r for r in VA.profile_columns(li).collect()}
    pdf = li.select(*VA.PROFILE_COLS).toPandas()
    for c in VA.PROFILE_COLS:
        assert prof[c].n_rows == len(pdf)
        assert prof[c].n_nulls == int(pdf[c].isna().sum())
        assert prof[c].n_distinct == int(pdf[c].nunique())
        assert math.isclose(prof[c].min_v, float(pdf[c].min()))
        assert math.isclose(prof[c].max_v, float(pdf[c].max()))


def test_mad_outliers_match_numpy(spark, events):
    import numpy as np

    from clusterforge_spark.operators.validation import (
        MAD_CONSISTENCY,
        MAD_K,
        mad_outliers,
    )

    got = {(r.event_type, r.event_id) for r in mad_outliers(events).collect()}
    pdf = events.select("event_id", "event_type", "value").toPandas()
    expected = set()
    for etype, grp in pdf.groupby("event_type"):
        v = grp.value.to_numpy()
        med = np.median(v)
        mad = np.median(np.abs(v - med))
        if mad > 0:
            mask = np.abs(v - med) / (MAD_CONSISTENCY * mad) > MAD_K
            expected |= {(etype, int(e)) for e in grp.event_id.to_numpy()[mask]}
    assert got == expected


def test_hhi_by_segment_closed_form(spark):
    """Monopoly segment (one customer) → HHI 1, normalized NULL;
    two-equal-customer segment → HHI 0.5, normalized 0; whale+minnow
    (90/10) → HHI 0.82, normalized 0.64."""
    from clusterforge_spark.operators.validation import hhi_by_segment

    orders = spark.createDataFrame(
        [
            (1, 100.0),
            (2, 50.0), (3, 50.0),
            (4, 90.0), (5, 10.0),
        ],
        "o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(1, "MONO"), (2, "EQUAL"), (3, "EQUAL"), (4, "WHALE"), (5, "WHALE")],
        "c_custkey long, c_mktsegment string",
    )
    rows = {r["c_mktsegment"]: r for r in hhi_by_segment(orders, customer).collect()}
    assert rows["MONO"].hhi == 1.0 and rows["MONO"].hhi_normalized is None
    assert rows["EQUAL"].hhi == 0.5 and rows["EQUAL"].hhi_normalized == 0.0
    assert rows["WHALE"].hhi == 0.82 and rows["WHALE"].hhi_normalized == 0.64
    assert rows["WHALE"].total_spend == 100.0


def test_lorenz_deciles_closed_form(spark):
    """10 users spending 1..10: decile d holds exactly user d, so
    cum_share(d) = d(d+1)/2 ÷ 55. Ties: 4 equal users land in deciles
    {1,3,6,8} via the integer-rank rule, share 0.25 each."""
    from clusterforge_spark.operators.validation import lorenz_deciles

    df = spark.createDataFrame(
        [(u, u, float(u)) for u in range(1, 11)],
        "user_id long, event_id long, value double",
    )
    rows = {r.decile: r for r in lorenz_deciles(df).collect()}
    assert sorted(rows) == list(range(1, 11))
    assert all(rows[d].n_users == 1 for d in rows)
    import math
    for d in (1, 5, 10):
        want = math.floor(d * (d + 1) / 2 / 55 * 1e6 + 0.5) / 1e6
        assert rows[d].cum_share == want
    assert rows[10].cum_share == 1.0

    ties = spark.createDataFrame(
        [(u, u, 5.0) for u in range(1, 5)],
        "user_id long, event_id long, value double",
    )
    trows = {r.decile: r for r in lorenz_deciles(ties).collect()}
    assert sorted(trows) == [1, 3, 6, 8]
    assert all(r.spend_share == 0.25 for r in trows.values())


def test_tukey_fences_match_numpy(spark, events):
    import numpy as np

    from clusterforge_spark.operators.validation import TUKEY_K, tukey_fences

    out = tukey_fences(events).collect()
    got = {(r.event_type, r.event_id): r.side for r in out}
    pdf = events.select("event_id", "event_type", "value").toPandas()
    expected = {}
    for etype, grp in pdf.groupby("event_type"):
        v = grp.value.to_numpy()
        # mirror the operator's 6dp-rounded linear-interpolation quartiles
        q1 = np.floor(np.quantile(v, 0.25) * 1e6 + 0.5) / 1e6
        q3 = np.floor(np.quantile(v, 0.75) * 1e6 + 0.5) / 1e6
        lo, hi = q1 - TUKEY_K * (q3 - q1), q3 + TUKEY_K * (q3 - q1)
        for e, x in zip(grp.event_id.to_numpy(), v):
            if x < lo:
                expected[(etype, int(e))] = "low"
            elif x > hi:
                expected[(etype, int(e))] = "high"
    assert got == expected


def test_winsorize_matches_numpy_nearest_rank(spark, events):
    import math

    from clusterforge_spark.operators.validation import (
        WINSOR_HI,
        WINSOR_LO,
        winsorize,
    )

    got = {r.event_id: r for r in winsorize(events).collect()}
    pdf = events.select("event_id", "event_type", "value").toPandas()
    assert len(got) == len(pdf)
    for etype, grp in pdf.groupby("event_type"):
        v = sorted(grp.value)
        lo = v[math.ceil(WINSOR_LO * len(v)) - 1]
        hi = v[math.ceil(WINSOR_HI * len(v)) - 1]
        for _, row in grp.iterrows():
            r = got[row.event_id]
            assert (r.lo, r.hi) == (lo, hi)
            assert r.value_winsorized == min(max(row.value, lo), hi)


def test_chi_square_matches_pandas(spark, events):
    import numpy as np

    from clusterforge_spark.operators.validation import chi_square_independence

    row = chi_square_independence(events).collect()[0]
    pdf = events.selectExpr("event_type", "dayofweek(ts) AS dow").toPandas()
    ct = pdf.groupby(["event_type", "dow"]).size().unstack(fill_value=0)
    o = ct.to_numpy().astype(float)
    rt = o.sum(axis=1, keepdims=True)
    c = o.sum(axis=0, keepdims=True)
    e = rt @ c / o.sum()
    mask = o > 0  # only observed cells enter the operator's sum
    chi2 = (((o - e) ** 2 / e)[mask]).sum()
    assert abs(row.chi2 - chi2) < 1e-3
    assert row.dof == (ct.shape[0] - 1) * (ct.shape[1] - 1)


def test_ab_test_matches_python(spark, events):
    import math

    from clusterforge_spark.operators.validation import ab_test_proportions

    row = ab_test_proportions(events).collect()[0]
    # recompute conversion on the operator's own session definition
    from clusterforge_spark.operators.relational import sessionize_gap

    sess = sessionize_gap(events).collect()
    # sessionize_gap emits per-session aggregates; conversion needs types —
    # recompute sessions directly instead
    pdf = events.selectExpr(
        "user_id", "unix_micros(ts) AS us", "event_id", "event_type"
    ).toPandas()
    arms = {"A": [0, 0], "B": [0, 0]}
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        arm = "A" if uid % 2 == 0 else "B"
        last, conv = None, False
        for _, r in g.iterrows():
            if last is None or r.us - last > 1_800_000_000:
                if last is not None:
                    arms[arm][0] += 1
                    arms[arm][1] += int(conv)
                conv = False
            conv = conv or (r.event_type == "purchase")
            last = r.us
        arms[arm][0] += 1
        arms[arm][1] += int(conv)
    (n_a, c_a), (n_b, c_b) = arms["A"], arms["B"]
    assert (row.n_a, row.conv_a, row.n_b, row.conv_b) == (n_a, c_a, n_b, c_b)
    p1, p2 = c_a / n_a, c_b / n_b
    pool = (c_a + c_b) / (n_a + n_b)
    z = (p1 - p2) / math.sqrt(pool * (1 - pool) * (1 / n_a + 1 / n_b))
    assert abs(row.z_stat - z) < 1e-3


def test_mannwhitney_matches_scipy_style_reference(spark):
    """U and tie-corrected z match a direct Python computation with
    average ranks (the scipy.stats.mannwhitneyu formulation)."""
    import math

    from clusterforge_spark.operators.validation import mannwhitney_value

    rows = []
    vals_a = [1.00, 2.00, 2.00, 5.00, 7.00]   # even user_ids
    vals_b = [2.00, 3.00, 4.00, 4.00]         # odd user_ids
    eid = 0
    for v in vals_a:
        rows.append((eid, 2 * eid, v)); eid += 1
    for v in vals_b:
        rows.append((eid, 2 * eid + 1, v)); eid += 1
    events = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    r = mannwhitney_value(events).collect()[0]

    allv = vals_a + vals_b
    sv = sorted(allv)
    def avg_rank(x):
        lo = sv.index(x) + 1
        hi = len(sv) - sv[::-1].index(x)
        return (lo + hi) / 2
    n_a, n_b = len(vals_a), len(vals_b)
    n = n_a + n_b
    r_a = sum(avg_rank(v) for v in vals_a)
    u_a = r_a - n_a * (n_a + 1) / 2
    mu = n_a * n_b / 2
    from collections import Counter
    tie_term = sum(t**3 - t for t in Counter(allv).values())
    var = (n_a * n_b / 12) * ((n + 1) - tie_term / (n * (n - 1)))
    z = (u_a - mu) / math.sqrt(var)
    assert r.n_a == n_a and r.n_b == n_b
    assert abs(r.u_a - u_a) < 1e-9
    assert abs(r.z_u - z) < 5e-5


def test_benford_check_shares_and_chi2(spark, orders):
    import math

    from clusterforge_spark.operators.validation import benford_check

    rows = benford_check(orders).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 1e-3
    for r in rows:
        want = math.log10(1.0 + 1.0 / r.digit)
        assert abs(r.benford_share - want) < 1e-6
        assert r.chi2_term >= 0


def test_gini_concentration_bounds_and_uniform_case(spark):
    from clusterforge_spark.operators.validation import gini_concentration

    # perfectly uniform values -> gini == 0 exactly
    uni = spark.createDataFrame(
        [(i, i, 10.00) for i in range(50)], "event_id long, user_id long, value double"
    )
    r = gini_concentration(uni).collect()[0]
    assert r.n_users == 50
    assert r.gini == 0.0
    # one whale holding all value -> gini -> (n-1)/n
    whale = spark.createDataFrame(
        [(0, 0, 1000.00)] + [(i, i, 0.00) for i in range(1, 10)],
        "event_id long, user_id long, value double",
    )
    r2 = gini_concentration(whale).collect()[0]
    assert abs(r2.gini - 0.9) < 1e-6


def test_ks_test_matches_scipy_style_reference(spark):
    import math

    from clusterforge_spark.operators.validation import ks_test_value

    vals_a = [1.00, 2.00, 2.00, 5.00, 7.00]
    vals_b = [2.00, 3.00, 4.00, 4.00, 9.00]
    rows = []
    eid = 0
    for v in vals_a:
        rows.append((eid, 2 * eid, v)); eid += 1
    for v in vals_b:
        rows.append((eid, 2 * eid + 1, v)); eid += 1
    events = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    r = ks_test_value(events).collect()[0]

    xs = sorted(set(vals_a + vals_b))
    def cdf(vs, x):
        return sum(1 for v in vs if v <= x) / len(vs)
    d = max(abs(cdf(vals_a, x) - cdf(vals_b, x)) for x in xs)
    lam = d * math.sqrt(len(vals_a) * len(vals_b) / (len(vals_a) + len(vals_b)))
    assert r.n_a == 5 and r.n_b == 5
    assert abs(r.d_stat - d) < 1e-9
    assert abs(r.ks_lambda - lam) < 5e-5


def test_cramers_v_bounds_and_independence(spark):
    from clusterforge_spark.operators.validation import cramers_v_association

    # perfectly independent 2x2 grid replicated => V == 0
    import datetime

    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)  # a Monday
    for day in range(2):          # two distinct dows
        for et in ("click", "view"):
            for _ in range(10):   # equal cell counts -> independence
                rows.append((eid, base + datetime.timedelta(days=day), eid, et, 1.0))
                eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = cramers_v_association(events).collect()[0]
    assert r.n_rows == 2 and r.n_cols == 2
    assert r.chi2 == 0.0 and r.cramers_v == 0.0

    # perfectly dependent: each type on its own day => V == 1
    rows2 = []
    eid = 0
    for day, et in ((0, "click"), (1, "view")):
        for _ in range(10):
            rows2.append((eid, base + datetime.timedelta(days=day), eid, et, 1.0))
            eid += 1
    events2 = spark.createDataFrame(
        rows2, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r2 = cramers_v_association(events2).collect()[0]
    assert abs(r2.cramers_v - 1.0) < 1e-6


def test_psi_ab_zero_on_identical_and_positive_on_shift(spark):
    from clusterforge_spark.operators.validation import psi_ab

    # identical per-arm distributions -> PSI ~ 0 (exactly 0 at equal shares)
    rows = []
    eid = 0
    for v in (50.0, 150.0, 250.0, 350.0):
        for _ in range(10):
            rows.append((eid, 2 * eid, v)); eid += 1       # arm A
            rows.append((eid, 2 * eid + 1, v)); eid += 1   # arm B
    events = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    r = psi_ab(events).collect()[0]
    assert r.n_a == r.n_b == 40
    assert r.psi == 0.0

    # shifted arm B -> clearly positive PSI
    rows2 = [(i, 2 * i, 50.0) for i in range(40)] + [
        (100 + i, 2 * i + 1, 950.0) for i in range(40)
    ]
    events2 = spark.createDataFrame(rows2, "event_id long, user_id long, value double")
    r2 = psi_ab(events2).collect()[0]
    assert r2.psi > 1.0  # disjoint buckets: massive drift


def test_record_linkage_finds_planted_pairs(spark):
    """Every planted dirty copy links back to its source record; the big
    balance drift lands in 'possible', the small one in 'match'."""
    from clusterforge_spark.operators.validation import (
        LINK_DIRTY_MOD,
        LINK_DIRTY_OFFSET,
        customers_with_dirty,
        record_linkage,
    )
    from clusterforge_spark.sources.readers import load_table

    customer = load_table(spark, "/root/testdata/sf0.001", "customer")
    out = record_linkage(customers_with_dirty(customer)).collect()
    by_dirty = {r["dirty_id"]: r for r in out}
    n_dirty = customer.filter(f"c_custkey % {LINK_DIRTY_MOD} = 0").count()
    assert len(by_dirty) == n_dirty
    for r in out:
        assert r["clean_id"] == r["dirty_id"] - LINK_DIRTY_OFFSET
        want = (
            "possible"
            if (r["dirty_id"] - LINK_DIRTY_OFFSET) % (3 * LINK_DIRTY_MOD) == 0
            else "match"
        )
        assert r["tier"] == want


def test_key_skew_profile_hand_computed(spark):
    """Constructed skew: key 1 x 6 rows, key 2 x 3, key 3 x 1, NULL x 2."""
    import pyspark.sql.functions as F
    from clusterforge_spark.operators.validation import key_skew_profile

    rows = [(1,)] * 6 + [(2,)] * 3 + [(3,)] * 1 + [(None,)] * 2
    df = spark.createDataFrame(rows, "l_partkey long")
    r = key_skew_profile(df).collect()[0]
    assert r["n_rows"] == 12
    assert r["n_keys"] == 4
    assert r["max_cnt"] == 6
    assert r["heavy_key"] == 1
    assert abs(r["mean_cnt"] - 3.0) < 1e-9
    assert r["p99_cnt"] == 6
    assert abs(r["skew_ratio"] - 2.0) < 1e-9


def test_l_diversity_hand_classes(spark):
    """One QI class with a single priority value (l=1, violating) and
    one with three distinct priorities (l=3, compliant)."""
    from clusterforge_spark.operators.validation import l_diversity

    customer = spark.createDataFrame(
        [(1, 0, "A"), (2, 0, "A"), (3, 1, "B")],
        "c_custkey long, c_nationkey long, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [
            (10, 1, "1-URGENT"), (11, 2, "1-URGENT"), (12, 1, "1-URGENT"),
            (20, 3, "1-URGENT"), (21, 3, "2-HIGH"), (22, 3, "3-MEDIUM"),
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    got = {
        r["is_violating"]: (r["n_classes"], r["n_rows"], r["min_l"], r["max_l"])
        for r in l_diversity(orders, customer).collect()
    }
    assert got == {True: (1, 3, 1, 1), False: (1, 3, 3, 3)}


def test_fk_integrity_planted_orphans(spark):
    """Two orphan lineitem rows on one missing order key, one null
    custkey order: each shows up on exactly its own edge."""
    import datetime as dt

    from clusterforge_spark.operators.validation import fk_integrity

    t = dt.datetime(1995, 1, 1)
    orders = spark.createDataFrame(
        [(1, 10, t), (2, 20, t), (3, None, t)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [(1, 500, t), (1, 500, t), (2, 500, t), (99, 500, t), (99, 500, t)],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    customer = spark.createDataFrame(
        [(10, 0), (20, 0)], "c_custkey long, c_nationkey int"
    )
    supplier = spark.createDataFrame([(500,)], "s_suppkey long")
    nation = spark.createDataFrame([(0, 0)], "n_nationkey int, n_regionkey int")
    region = spark.createDataFrame([(0,)], "r_regionkey int")
    rows = {
        r["edge"]: r
        for r in fk_integrity(
            lineitem, orders, customer, supplier, nation, region
        ).collect()
    }
    li_ord = rows["lineitem.l_orderkey->orders"]
    assert (li_ord["n_child"], li_ord["n_orphan"], li_ord["n_null_key"]) == (5, 2, 0)
    oc = rows["orders.o_custkey->customer"]
    assert (oc["n_child"], oc["n_orphan"], oc["n_null_key"]) == (3, 0, 1)
    assert rows["lineitem.l_suppkey->supplier"]["n_orphan"] == 0


def test_exact_kth_smallest_matches_sorted(spark):
    from clusterforge_spark.functions.partitioning import exact_kth_smallest

    vals = [5.0, -1.5, 3.25, 3.25, 0.0, 99.0, -7.0, 2.5]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    ordered = sorted(vals)
    for k in (1, 2, 4, len(vals)):
        assert exact_kth_smallest(df, "v", k) == ordered[k - 1]
    assert exact_kth_smallest(df, "v", 0) is None
    assert exact_kth_smallest(df, "v", len(vals) + 1) is None


def test_conformal_interval_matches_python_replica(spark):
    """End-to-end split-conformal on synthetic orders vs a pure-Python
    replica of the same hash split / train mean / order statistic /
    coverage arithmetic."""
    import hashlib
    import math

    from clusterforge_spark.operators.validation import (
        CONFORMAL_ALPHA,
        conformal_interval,
    )

    rows = [(i, "1-URGENT", float(i % 97) + 10.0) for i in range(1, 401)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )

    def split(okey):
        return int(hashlib.md5(str(okey).encode()).hexdigest()[:15], 16) % 4

    y = {i: math.floor(p * 100 + 0.5) for i, _, p in rows}
    train = [i for i, _, _ in rows if split(i) <= 1]
    calib = [i for i, _, _ in rows if split(i) == 2]
    test = [i for i, _, _ in rows if split(i) == 3]
    yhat = sum(y[i] for i in train) / float(len(train))
    scores = sorted(abs(y[i] - yhat) for i in calib)
    k = min(int(math.ceil((len(calib) + 1) * (1 - CONFORMAL_ALPHA))), len(calib))
    qhat = scores[k - 1]
    covered = sum(1 for i in test if abs(y[i] - yhat) <= qhat)

    r = conformal_interval(orders).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_test"] == len(test)
    assert row["n_covered"] == covered
    assert abs(row["yhat"] - math.floor(yhat / 100.0 * 1e4 + 0.5) / 1e4) < 1e-9
    assert abs(row["hi"] - row["lo"] - 2 * qhat / 100.0) < 1e-3
    # the conformal guarantee: realized coverage near 1 - alpha
    assert row["coverage"] >= 1 - CONFORMAL_ALPHA - 0.1


def test_calibration_bins_planted(spark):
    """Hand-built docs with known signal hits and labels: bin counts,
    frac_positive, and the exact-integer Brier per bin."""
    from clusterforge_spark.operators.validation import calibration_bins

    docs = [
        # hits = 4 (all signals), en
        (1, " the  a window " + "x" * 400, "en", 416),
        # hits = 4, fr  -> bin 4: 1 pos of 2
        (2, " the  a window " + "y" * 400, "fr", 416),
        # hits = 1 (only ' the '), en
        (3, " the cat", "en", 8),
        # hits = 0, zh
        (4, "abc", "zh", 3),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, n_chars long")
    got = {r["score_bin"]: r for r in calibration_bins(df).collect()}
    assert set(got) == {0, 1, 4}
    assert (got[4]["n"], got[4]["frac_positive"]) == (2, 0.5)
    # bin 4 Brier: en term (4-4)^2=0, fr term (4-0)^2=16 -> 16/(16*2)=0.5
    assert abs(got[4]["brier_bin"] - 0.5) < 1e-9
    assert (got[1]["n"], got[1]["frac_positive"]) == (1, 1.0)
    # bin 1, en: (1-4)^2/16 = 9/16
    assert abs(got[1]["brier_bin"] - 9.0 / 16.0) < 1e-9
    assert (got[0]["n"], got[0]["frac_positive"]) == (1, 0.0)
    assert abs(got[0]["brier_bin"] - 0.0) < 1e-9


def test_conformal_interval_null_prices_oracle_parity(spark):
    """NULL o_totalprice rows land in every split; both engines must
    exclude the resulting NULL nonconformity scores from n_cal AND the
    order statistic. Before the r7 fix, Spark counted NULL scores into
    n_cal (k could exceed the non-null population -> empty report) while
    the DuckDB oracle returned rows — a parity divergence on NULL-price
    data. Runs the real oracle SQL side-by-side on the same frame."""
    import duckdb
    import pandas as pd

    from clusterforge_spark import oracle_sql as OSQL

    rows = [
        (i, "P%d" % (i % 3), float(100 + (i * 37) % 500) if i % 13 else None)
        for i in range(400)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    got = (
        VA.conformal_interval(orders)
        .orderBy("o_orderpriority")
        .toPandas()
    )
    assert len(got) == 3  # non-empty despite NULL-bearing calibration
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(rows, columns=["o_orderkey", "o_orderpriority", "o_totalprice"]),
    )
    ora = con.execute(
        OSQL.q_conformal_interval() + " ORDER BY o_orderpriority"
    ).df()
    assert list(got.columns) == list(ora.columns)
    for c in got.columns:
        assert got[c].tolist() == ora[c].tolist(), c


def test_bucket_order_stats_refinement_and_fallbacks(spark):
    """The r12 shuffle-free selection: refinement levels, degenerate
    (all-equal) ranges, duplicate-heavy domains, and the non-finite
    fallback all return the exact sorted-order element."""
    import math
    import random

    from pyspark.sql import functions as F

    from clusterforge_spark.functions.partitioning import (
        _bucket_order_stats,
        exact_kth_smallest,
        exact_quantile,
    )

    rng = random.Random(7)
    # heavy ties + a huge outlier squeezing most mass into one bucket,
    # forcing at least one refinement level past the first histogram
    vals = (
        [1.0] * 500
        + [1.0 + i * 1e-12 for i in range(200)]
        + [rng.uniform(0, 1e-9) for _ in range(300)]
        + [1e18]
    )
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    ordered = sorted(vals)
    col = df.select(F.col("v").cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    ).cache()
    try:
        n, out = _bucket_order_stats(
            col, lambda m: [0, 1, 499, 500, 501, m - 2, m - 1]
        )
        assert n == len(vals) and out is not None
        for k, v in out.items():
            assert v == ordered[k], (k, v, ordered[k])
    finally:
        col.unpersist()
    # all-equal column resolves through the lo == hi degenerate branch
    eq = spark.createDataFrame([(2.5,)] * 40, "v double")
    assert exact_kth_smallest(eq, "v", 17) == 2.5
    assert exact_quantile(eq, "v", 0.5) == 2.5
    # ±inf bounds must take the range-partition fallback, same answers
    inf_vals = [float("-inf"), -2.0, 0.5, 3.0, float("inf")]
    inf_df = spark.createDataFrame([(v,) for v in inf_vals], "v double")
    assert exact_kth_smallest(inf_df, "v", 2) == -2.0
    assert exact_quantile(inf_df, "v", 0.5) == 0.5
    assert math.isinf(exact_kth_smallest(inf_df, "v", 5))
