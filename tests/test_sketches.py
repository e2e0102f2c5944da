"""Sketch guarantees: Count-Min never underestimates; Bloom has no
false negatives; both match brute-force on known corpora."""

from __future__ import annotations

from clusterforge_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    bloom_membership,
    countmin_build,
    countmin_estimate,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_countmin_never_underestimates_and_is_tight_here(spark):
    docs = _docs(
        spark,
        [
            (1, "hash hash hash join", "en", "s", 20),
            (2, "join spark hash", "en", "s", 15),
            (3, "scan filter row", "en", "s", 15),
        ],
    )
    got = {r.token: r for r in countmin_estimate(docs).collect()}
    truth = {"hash": 4, "join": 2, "spark": 1, "zanzibar": 0, "quetzalcoatl": 0}
    for tok, want in truth.items():
        assert got[tok].true_count == want
        assert got[tok].est >= want          # the CMS guarantee
        assert got[tok].overestimate == got[tok].est - want
    # 7 distinct tokens in a 4x1024 sketch: collisions are implausible,
    # so the estimates should be exact on this corpus
    assert all(r.overestimate == 0 for r in got.values())


def test_countmin_sketch_mass_conserved(spark):
    docs = _docs(spark, [(1, "a b c a b a", "en", "s", 11)])
    sk = countmin_build(docs).collect()
    # every hash row absorbs the full token mass (6 occurrences)
    by_row: dict = {}
    for r in sk:
        by_row[r.row] = by_row.get(r.row, 0) + r.counter
    assert set(by_row) == set(range(CMS_D))
    assert all(v == 6 for v in by_row.values())
    assert all(0 <= r.bucket < CMS_W for r in sk)


def test_bloom_no_false_negatives(spark):
    docs = _docs(
        spark,
        [
            (1, "hash join", "en", "s", 9),
            (2, "spark streams", "en", "s", 13),
        ],
    )
    got = {r.token: r for r in bloom_membership(docs).collect()}
    # every actually-present probe MUST be in the filter
    for tok in ("hash", "join", "spark"):
        assert got[tok].actually_present
        assert got[tok].in_filter
        assert not got[tok].is_false_positive
    # absent probes: either correctly out, or flagged as false positives
    for tok in ("zanzibar", "quetzalcoatl"):
        assert not got[tok].actually_present
        assert got[tok].is_false_positive == got[tok].in_filter


def test_quantile_histogram_error_contract(spark, events):
    """est_hi >= exact always, and the gap is at most one bucket width —
    the histogram sketch's error contract."""
    from clusterforge_spark.operators.sketches import (
        QH_WIDTH_CENTS,
        quantile_histogram_estimate,
    )

    rows = quantile_histogram_estimate(events).collect()
    assert {r["pct"] for r in rows} == {50, 90, 99}
    for r in rows:
        assert r["est_hi"] >= r["exact"]
        assert r["abs_err"] <= QH_WIDTH_CENTS / 100.0
        assert r["abs_err"] >= 0.0


def test_quantile_histogram_known_small_input(spark):
    """1..100 dollars: p50 exact = 50, bucket estimate = upper edge of
    the bucket holding rank 50."""
    from clusterforge_spark.operators.sketches import quantile_histogram_estimate

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "value double"
    )
    got = {r["pct"]: r for r in quantile_histogram_estimate(df, pcts=(50,)).collect()}
    assert got[50]["exact"] == 50.0
    # bucket width $1: rank-50 cent value 5000 sits in bucket 50 → hi edge 51
    assert got[50]["est_hi"] == 51.0


def test_quantile_histogram_materialized_matches_rescan(spark):
    """The size-gated vhist materialization (materialize_bytes=0 forces
    the localCheckpoint path a >8 MB source would take) must be
    row-identical to the re-scan plan the small regime uses."""
    from clusterforge_spark.operators.sketches import quantile_histogram_estimate
    from clusterforge_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")  # uncached: real file scan
    base = sorted(map(tuple, quantile_histogram_estimate(ev).collect()))
    ckpt = sorted(
        map(tuple, quantile_histogram_estimate(ev, materialize_bytes=0).collect())
    )
    assert ckpt == base


def test_kmv_exact_when_under_k(spark):
    """With fewer distinct users than k every sketch is the full set, so
    every estimate equals the exact answer."""
    import datetime as dt

    from clusterforge_spark.operators.sketches import kmv_set_ops

    t = dt.datetime(2024, 1, 1)
    rows = [(i, t, i, "A", 1.0, "{}") for i in range(1, 11)]
    rows += [(100 + i, t, i, "B", 1.0, "{}") for i in range(5, 15)]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = kmv_set_ops(events).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["s1"], r["s2"]) == ("A", "B")
    assert (r["exact_a"], r["exact_b"]) == (10, 10)
    assert r["exact_inter"] == 6
    assert r["exact_union"] == 14
    assert r["est_a"] == 10.0 and r["est_b"] == 10.0
    assert r["est_union"] == 14.0
    assert r["est_inter"] == 6.0


def test_kmv_disjoint_pair_reports_zero_intersection(spark):
    """A type pair with NO shared users must still appear in the report
    with exact_inter = 0 (ADVICE r5: the inner join on inter_exact
    silently dropped exactly the disjoint pairs)."""
    import datetime as dt

    from clusterforge_spark.operators.sketches import kmv_set_ops

    t = dt.datetime(2024, 1, 1)
    rows = [(i, t, i, "A", 1.0, "{}") for i in range(1, 11)]
    rows += [(100 + i, t, 1000 + i, "B", 1.0, "{}") for i in range(1, 11)]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = kmv_set_ops(events).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["s1"], r["s2"]) == ("A", "B")
    assert r["exact_inter"] == 0
    assert r["exact_union"] == 20
    assert r["est_inter"] == 0.0


def test_kmv_full_sketch_matches_python_md5(spark):
    """Forced tiny k: the (k−1)·2⁶⁰/h_k estimate reproduces the value
    computed from Python's own md5 of the same user ids."""
    import datetime as dt
    import hashlib
    import math

    from clusterforge_spark.operators.sketches import KMV_DOMAIN, kmv_set_ops

    K = 4
    users_a = list(range(1, 31))
    users_b = list(range(20, 50))
    t = dt.datetime(2024, 1, 1)
    rows = [(i, t, u, "A", 1.0, "{}") for i, u in enumerate(users_a)]
    rows += [(1000 + i, t, u, "B", 1.0, "{}") for i, u in enumerate(users_b)]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )

    def h(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    ha = sorted(h(u) for u in set(users_a))
    expected_a = (K - 1) * float(KMV_DOMAIN) / float(ha[K - 1])
    r = kmv_set_ops(events, k=K).collect()[0]
    assert r["est_a"] == math.floor(expected_a * 1e4 + 0.5) / 1e4
    # union sketch = K smallest of merged per-type bottom-K
    hb = sorted(h(u) for u in set(users_b))
    merged = sorted(set(ha[:K]) | set(hb[:K]))[:K]
    expected_u = (K - 1) * float(KMV_DOMAIN) / float(merged[K - 1])
    assert r["est_union"] == math.floor(expected_u * 1e4 + 0.5) / 1e4


def test_kmv_prefilter_regime_matches_small_regime(spark, monkeypatch):
    """The candidate-prefilter (large) regime and the full-window (small)
    regime must produce IDENTICAL reports — the prefilter only trims rows
    provably above the k-th smallest hash. Forces the large regime by
    shrinking the regime threshold, including a starved-guard-eligible
    skew (one type with few distinct users)."""
    import datetime as dt

    from clusterforge_spark.operators import sketches as SK

    t = dt.datetime(2024, 1, 1)
    rows = [(i, t, i % 400, "A", 1.0, "{}") for i in range(1200)]
    rows += [(10_000 + i, t, i % 350 + 100, "B", 1.0, "{}") for i in range(900)]
    rows += [(20_000 + i, t, i % 3, "C", 1.0, "{}") for i in range(30)]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    small = sorted(map(tuple, SK.kmv_set_ops(events, k=64).collect()))
    monkeypatch.setattr(SK, "KMV_PREFILTER_MIN_DISTINCT", 10)
    large = sorted(map(tuple, SK.kmv_set_ops(events, k=64).collect()))
    assert small == large
