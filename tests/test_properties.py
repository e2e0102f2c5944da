"""Property-based tests (hypothesis) — the reference has none
(SURVEY.md §5.3); these pin the engine's determinism machinery.

The Spark-side properties run on small generated frames; the pure-Python
properties validate the cross-engine contracts (deterministic rounding,
hash parity) against DuckDB directly, which is cheap enough to fuzz.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@given(x=finite_doubles, scale=st.integers(min_value=0, max_value=6))
@settings(max_examples=300, deadline=None)
def test_round_det_matches_duckdb(x, scale, duck):
    """floor(x·10ⁿ+0.5)/10ⁿ in Python IEEE == the same SQL in DuckDB —
    the exact expression both the Spark operators and the oracle use."""
    from clusterforge_spark.oracle_sql import flit

    s = float(10**scale)
    expected = math.floor(x * s + 0.5) / s
    # flit: string-cast literal → exact strtod double semantics (a bare
    # decimal literal parses as DECIMAL, whose scaled-int conversion can
    # land 1 ulp off Python's/Spark's value — found by this very test)
    got = duck.execute(
        f"SELECT floor({flit(x)} * {flit(s)} + 0.5) / {flit(s)}"
    ).fetchone()[0]
    assert got == expected


@given(t=st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_token_hash_parity_python_duckdb(t, duck):
    """60-bit md5 token hash: python int(hexdigest[:15],16) == DuckDB
    ('0x'||substr(md5,1,15))::BIGINT — the shared fingerprint function."""
    import hashlib

    expected = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
    got = duck.execute(
        "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [t]
    ).fetchone()[0]
    assert got == expected


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@given(
    vals=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, min_value=-1e3, max_value=1e3),
        min_size=2,
        max_size=20,
    )
)
@settings(max_examples=50, deadline=None)
def test_scaler_properties_numpy(vals):
    """Population-σ z-scoring: mean→0; σ-floor handles constants."""
    import numpy as np

    x = np.array(vals)
    mu = x.mean()
    sd = max(x.std(), 1e-8)
    z = (x - mu) / sd
    # Relative tolerance: a 1-ulp error in the float mean is |mu|*eps, and
    # dividing by the floored sd amplifies it to |mu|*eps/sd — for a constant
    # column like [683.255...]*3 that is ~1.1e-5, far above an absolute 1e-6.
    tol = 1e-6 * max(1.0, abs(mu) / sd)
    assert abs(z.mean()) < tol
    if x.std() > 1e-6:
        assert abs(z.std() - 1.0) < 1e-6


@given(
    a=st.lists(st.integers(0, 50), min_size=1, max_size=30, unique=True),
    b=st.lists(st.integers(0, 50), min_size=1, max_size=30, unique=True),
)
@settings(max_examples=100, deadline=None)
def test_jaccard_formula_properties(a, b):
    """inter/(|A|+|B|−inter) ∈ [0,1]; 1 iff equal sets; symmetric."""
    sa, sb = set(a), set(b)
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    j = inter / union
    assert 0.0 <= j <= 1.0
    assert (j == 1.0) == (sa == sb)
    inter2 = len(sb & sa)
    assert inter2 / (len(sb) + len(sa) - inter2) == j


def test_simhash_order_invariant(spark):
    """simhash over distinct tokens is permutation-invariant (votes are
    a sum) — shuffled text yields the same fingerprint."""
    from clusterforge_spark.operators.dedup import simhash_fingerprints

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "epsilon delta gamma beta alpha")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.simhash for r in simhash_fingerprints(df).collect()}
    assert out[1] == out[2]


def test_lsh_bucket_stable_under_scaling(spark):
    """Sign-LSH buckets depend only on direction: scaling a vector by a
    positive constant keeps its bucket."""
    from clusterforge_spark.functions import vector as V

    base = [0.1 * ((i % 7) - 3) for i in range(V.DIM)]
    scaled = [4.0 * x for x in base]
    df = spark.createDataFrame([(1, base), (2, scaled)], "id long, embedding array<float>")
    out = {r.id: r.b for r in df.select("id", V.lsh_bucket("embedding").alias("b")).collect()}
    assert out[1] == out[2]


@given(
    lengths=st.lists(st.integers(min_value=0, max_value=700), min_size=1, max_size=8),
    chunk_size=st.integers(min_value=2, max_value=300),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
@settings(max_examples=12, deadline=None)
def test_chunk_sliding_reconstructs_text(spark, lengths, chunk_size, overlap_frac):
    """Chunks must tile the document exactly: taking the first `stride`
    chars of every chunk plus the last chunk's tail reconstructs the
    original text, for any chunk_size/overlap and any length mix."""
    from clusterforge_spark.operators.packing import chunk_sliding

    overlap = min(int(chunk_size * overlap_frac), chunk_size - 1)
    stride = chunk_size - overlap
    rows = [
        (i, "".join(chr(ord("a") + (i + j) % 26) for j in range(n)))
        for i, n in enumerate(lengths)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_sliding(docs, chunk_size=chunk_size, overlap=overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, text in rows:
        if not text:
            assert i not in by_doc
            continue
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        # contiguous indices starting at 0; starts spaced by stride
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        assert all(c.chunk_start == c.chunk_idx * stride for c in chunks)
        rebuilt = "".join(c.chunk_text[:stride] for c in chunks[:-1])
        rebuilt += chunks[-1].chunk_text
        assert rebuilt == text


def test_suggest_agg_partitions_clamps(spark):
    """File-size heuristic: small scans → floor, huge byte counts → conf
    cap, non-file inputs (in-memory frames, CACHED scans — the session
    fixtures cache the testdata tables, which empties inputFiles()) →
    None, i.e. the caller keeps the conf default."""
    from clusterforge_spark.functions.partitioning import suggest_agg_partitions

    conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # schema-free direct read: a DIFFERENT plan from any cached fixture
    # table, so CacheManager never substitutes an InMemoryRelation here
    ev = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    n = suggest_agg_partitions(ev)
    assert n == min(4, conf)  # kilobyte-scale file → the floor
    # tiny bytes_per_partition simulates a huge input: clamps at the conf
    n_big = suggest_agg_partitions(ev, bytes_per_partition=1)
    assert n_big == conf
    # in-memory frame: no files → None
    local = spark.createDataFrame([(1,)], "x long")
    assert suggest_agg_partitions(local) is None
    # cached scan: file provenance hidden → None (conf default applies)
    cached = spark.read.parquet("/root/testdata/sf0.001/region.parquet").cache()
    try:
        cached.count()
        again = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
        assert suggest_agg_partitions(again) is None
    finally:
        cached.unpersist()


@given(
    toks_a=st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=12),
    toks_b=st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=12),
)
@settings(max_examples=100, deadline=None)
def test_minhash_estimate_in_unit_range_and_exact_on_equal_sets(toks_a, toks_b):
    """k-permutation minhash over any two shingle-hash sets: the match
    fraction is in [0,1] and equals 1 exactly when the sets are equal —
    the algebraic guarantees the banded-LSH candidate logic leans on."""
    import hashlib

    from clusterforge_spark.functions.hashing import MINHASH_COEFFS, MINHASH_P

    def hset(toks):
        return {
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks
        }

    def sig(hs):
        if not hs:
            return None
        return [
            min((a * (h % MINHASH_P) + b) % MINHASH_P for h in hs)
            for a, b in MINHASH_COEFFS
        ]

    sa, sb = sig(hset(toks_a)), sig(hset(toks_b))
    if sa is None or sb is None:
        return
    matches = sum(1 for x, y in zip(sa, sb) if x == y)
    assert 0 <= matches <= len(MINHASH_COEFFS)
    if hset(toks_a) == hset(toks_b):
        assert matches == len(MINHASH_COEFFS)


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=50).map(lambda c: c / 10.0),
        min_size=2,
        max_size=40,
    )
)
@settings(max_examples=60, deadline=None)
def test_gini_matches_bruteforce_definition(spark, vals):
    """Histogram-rank Gini == the O(n²) mean-absolute-difference
    definition G = Σᵢⱼ|xᵢ−xⱼ| / (2n²·x̄) for any value multiset."""
    from clusterforge_spark.operators.validation import gini_concentration

    events = spark.createDataFrame(
        [(i, i, v) for i, v in enumerate(vals)],
        "event_id long, user_id long, value double",
    )
    r = gini_concentration(events).collect()[0]
    n = len(vals)
    total = sum(vals)
    if total == 0:
        return  # undefined mean: operator yields whatever 0-sum algebra gives
    mad = sum(abs(a - b) for a in vals for b in vals)
    want = mad / (2.0 * n * n * (total / n))
    assert abs(r.gini - want) < 1e-4


@given(
    n_frames=st.integers(min_value=1, max_value=40),
    n_bytes=st.integers(min_value=0, max_value=500),
    stride=st.integers(min_value=1, max_value=7),
)
@settings(max_examples=80, deadline=None)
def test_frame_window_arithmetic_tiles_exactly(n_frames, n_bytes, stride):
    """The frame byte-window formula partitions [0, n_bytes) exactly for
    ANY (frames, bytes) combination — pure-Python twin of the SQL."""
    starts = [k * n_bytes // n_frames for k in range(n_frames)]
    ends = [(k + 1) * n_bytes // n_frames for k in range(n_frames)]
    assert starts[0] == 0 and ends[-1] == n_bytes
    for s, e, s2 in zip(starts, ends, starts[1:] + [None]):
        assert e >= s
        if s2 is not None:
            assert e == s2
    sampled = list(range(0, n_frames, stride))
    assert all(0 <= k < n_frames for k in sampled)


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.integers(min_value=1, max_value=1000),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    shift=st.integers(min_value=0, max_value=48),
)
@settings(max_examples=25, deadline=None)
def test_prefix_sum_before_matches_serial(spark, vals, shift):
    """The distributed two-level prefix sum equals the serial exclusive
    prefix for any histogram and any bucket shift (including shift=0,
    one value per bucket, and shift=48, everything in ~one bucket)."""
    from clusterforge_spark.functions.partitioning import prefix_sum_before

    df = spark.createDataFrame(vals, "v long, cnt long")
    got = {
        r["v"]: r["cum_cnt"]
        for r in prefix_sum_before(df, "v", ["cnt"], bucket_shift=shift).collect()
    }
    ordered = sorted(vals)
    run = 0
    for v, cnt in ordered:
        assert got[v] == run
        run += cnt


@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-(2**40), max_value=2**40),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),
    ),
    shift=st.integers(min_value=0, max_value=48),
)
@settings(max_examples=25, deadline=None)
def test_prefix_sum_before_partitioned_matches_serial(spark, vals, shift):
    """With part_cols the prefix restarts per group and still equals the
    serial per-group exclusive prefix for any histogram/shift (r8 — the
    token_budget_mix per-source fill machinery)."""
    from clusterforge_spark.functions.partitioning import prefix_sum_before

    df = spark.createDataFrame(vals, "g string, v long, cnt long")
    got = {
        (r["g"], r["v"]): r["cum_cnt"]
        for r in prefix_sum_before(
            df, "v", ["cnt"], bucket_shift=shift, part_cols=("g",)
        ).collect()
    }
    assert len(got) == len(vals)
    for g in {t[0] for t in vals}:
        run = 0
        for gv, v, cnt in sorted(t for t in vals if t[0] == g):
            assert got[(g, v)] == run, (g, v)
            run += cnt


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=60
    ),
    k=st.integers(min_value=1, max_value=10),
    desc=st.booleans(),
)
@settings(max_examples=10, deadline=None)
def test_total_order_rank_ntile_matches_window(spark, vals, k, desc):
    """total_order_rank + ntile_from_rank is bit-identical to
    ``ntile(k) OVER (ORDER BY value [DESC], id)`` for any value list
    (heavy ties included) and any k — including k > n."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from clusterforge_spark.functions.partitioning import (
        ntile_from_rank,
        total_order_rank,
    )

    rows = [(i, float(v) / 4.0) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, value double")
    ordv = F.col("value").desc() if desc else F.col("value").asc()
    w = Window.orderBy(ordv, F.col("id").asc())
    want = {
        r["id"]: r["nt"]
        for r in df.select("id", F.ntile(k).over(w).cast("long").alias("nt")).collect()
    }
    ranked = total_order_rank(df, "value", "id", descending=desc)
    n_df = F.broadcast(df.agg(F.count(F.lit(1)).cast("long").alias("_n")))
    got = {
        r["id"]: r["nt"]
        for r in ranked.crossJoin(n_df)
        .select("id", ntile_from_rank(F.col("_rank"), F.col("_n"), k).alias("nt"))
        .collect()
    }
    assert got == want


@given(
    counts=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=8),
    cap=st.integers(min_value=1, max_value=50),
)
@settings(max_examples=200, deadline=None)
def test_salt_pair_cover_exactly_once(counts, cap):
    """The 2-D salt rendezvous (a.salt == b.probe AND a.probe == b.salt)
    covers every unordered pair of a block EXACTLY once, for any block
    size and cap — the invariant dedup's skew salting rests on.
    Pure-Python model of dedup._salted_for_join's join condition."""
    import hashlib

    for block_id, m in enumerate(counts):
        s = max(1, -(-m // cap))
        ids = [block_id * 1000 + i for i in range(m)]
        salt = {
            i: int(hashlib.md5(str(i).encode()).hexdigest(), 16) % s for i in ids
        }
        seen = {}
        for a in ids:
            for pa in range(s):
                for b in ids:
                    for pb in range(s):
                        if a < b and salt[a] == pb and pa == salt[b]:
                            seen[(a, b)] = seen.get((a, b), 0) + 1
        expected = {(a, b) for a in ids for b in ids if a < b}
        assert set(seen) == expected
        assert all(v == 1 for v in seen.values())


@given(
    present=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=1, max_value=10**6),
        ),
        min_size=2,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=100, deadline=None)
def test_gap_fill_interpolation_model(present):
    """Linear interpolation invariants of the gap-fill formula: filled
    values lie within [min, max] of the bracketing observations, and a
    gap day exactly halfway between equal-valued brackets equals them.
    Pure-Python model of gap_fill_daily_revenue's arithmetic."""
    obs = dict(sorted(present))
    days = sorted(obs)
    lo, hi = days[0], days[-1]
    for day in range(lo, hi + 1):
        if day in obs:
            continue
        prev_d = max(d for d in days if d < day)
        next_d = min(d for d in days if d > day)
        pv, nv = float(obs[prev_d]), float(obs[next_d])
        filled = pv + (nv - pv) * (day - prev_d) / (next_d - prev_d)
        assert min(pv, nv) - 1e-9 <= filled <= max(pv, nv) + 1e-9
        if pv == nv:
            assert filled == pv


@given(
    groups=st.lists(
        st.lists(st.integers(min_value=0, max_value=10**6), min_size=2, max_size=20),
        min_size=2,
        max_size=5,
    )
)
@settings(max_examples=100, deadline=None)
def test_anova_f_nonnegative_and_zero_for_identical_groups(groups):
    """F ≥ 0 always; F == 0 when every group has the same mean.
    Pure-Python model of anova_f's sufficient-statistics formula."""
    stats = [(len(g), sum(g), sum(x * x for x in g)) for g in groups]
    k = len(stats)
    n = sum(s[0] for s in stats)
    if n <= k:
        return
    ssw = sum(sq - sm * sm / ng for ng, sm, sq in stats)
    sqm = sum(sm * sm / ng for ng, sm, sq in stats)
    tot = sum(sm for _, sm, _ in stats)
    ssb = sqm - tot * tot / n
    if ssw <= 1e-9:
        return
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert f >= -1e-9
    mean0 = stats[0][1] / stats[0][0]
    if all(abs(sm / ng - mean0) < 1e-12 for ng, sm, _ in stats):
        assert abs(f) < 1e-6


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=500).map(lambda c: c / 100.0),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=25, deadline=None)
def test_lorenz_deciles_curve_invariants(spark, vals):
    """For any spend multiset: every user lands in exactly one decile,
    cumulative share is nondecreasing and ends at 1, and per-decile
    mean spend is nondecreasing in decile order (the curve is convex
    by construction)."""
    from clusterforge_spark.operators.validation import lorenz_deciles

    events = spark.createDataFrame(
        [(i, i, v) for i, v in enumerate(vals)],
        "event_id long, user_id long, value double",
    )
    rows = sorted(lorenz_deciles(events).collect(), key=lambda r: r.decile)
    assert sum(r.n_users for r in rows) == len(vals)
    if sum(vals) == 0:
        assert all(r.cum_share is None for r in rows)
        return
    cums = [r.cum_share for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(cums, cums[1:]))
    assert cums[-1] == 1.0
    means = [r.decile_spend / r.n_users for r in rows]
    assert all(b >= a - 1e-6 for a, b in zip(means, means[1:]))


@given(
    spends=st.lists(
        st.integers(min_value=1, max_value=10_000).map(lambda c: c / 100.0),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=25, deadline=None)
def test_hhi_bounds_and_equal_case(spark, spends):
    """HHI ∈ [1/n, 1] for any positive spend vector; an equal-spend
    segment sits exactly at 1/n with normalized 0."""
    from clusterforge_spark.operators.validation import hhi_by_segment

    n = len(spends)
    orders = spark.createDataFrame(
        [(i, s) for i, s in enumerate(spends)]
        + [(1000 + i, 7.0) for i in range(n)],
        "o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(i, "VAR") for i in range(n)] + [(1000 + i, "EQ") for i in range(n)],
        "c_custkey long, c_mktsegment string",
    )
    rows = {r.c_mktsegment: r for r in hhi_by_segment(orders, customer).collect()}
    var, eq = rows["VAR"], rows["EQ"]
    assert 1.0 / n - 1e-6 <= var.hhi <= 1.0 + 1e-9
    assert abs(eq.hhi - 1.0 / n) < 1e-6
    if n > 1:
        assert abs(eq.hhi_normalized) < 1e-6
        assert -1e-9 <= var.hhi_normalized <= 1.0 + 1e-9


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=3600), min_size=1, max_size=30)
)
@settings(max_examples=25, deadline=None)
def test_interarrival_mean_is_span_over_count(spark, gaps):
    """One user, one type: mean gap == (last−first)/(n−1) exactly (the
    sufficient-statistics sum telescopes), and n_gaps == n−1."""
    import datetime as dt

    from clusterforge_spark.operators.relational import interarrival_profile

    t0 = dt.datetime(2024, 1, 1)
    ts = [t0]
    for g in gaps:
        ts.append(ts[-1] + dt.timedelta(seconds=g))
    df = spark.createDataFrame(
        [(i, 1, "click", t) for i, t in enumerate(ts)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    r = interarrival_profile(df).collect()[0]
    assert r.n_gaps == len(gaps)
    span_us = (ts[-1] - ts[0]).total_seconds() * 1e6
    assert r.mean_gap_us == math.floor(span_us / len(gaps) * 1e4 + 0.5) / 1e4


def test_total_order_rank_null_keys_rank_first(spark):
    """NULL order values form one tie group ranked FIRST — the same
    NULLS FIRST placement the replaced ASC window gave (review finding:
    a plain equi-join dropped them)."""
    from pyspark.sql import functions as F

    from clusterforge_spark.functions.partitioning import total_order_rank

    rows = [(1, None), (2, 5.0), (3, None), (4, 1.0)]
    df = spark.createDataFrame(rows, "id long, value double")
    got = {
        r["id"]: r["_rank"]
        for r in total_order_rank(df, "value", "id").collect()
    }
    assert len(got) == 4  # no row dropped
    assert {got[1], got[3]} == {1, 2}  # nulls first, id tie-break
    assert got[1] == 1 and got[3] == 2
    assert got[4] == 3 and got[2] == 4
