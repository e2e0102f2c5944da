"""Adversarial-input sweep: null/empty/unicode/giant documents must flow
through the text, dedup, and packing families without errors (ANSI mode).

Not value assertions — those live in the per-operator tests and the
DuckDB oracle; this pins "no crash, sane cardinality" for the input
shapes real corpora actually contain.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def adversarial_docs(spark):
    rows = [
        (1, None, "en", "s1", 0),  # null text
        (2, "", "en", "s1", 0),  # empty text
        (3, "héllo wörld ünïcode ✓ 漢字 emoji 🚀 test", "en", "s1", 40),
        (4, "a" * 50000, "en", "s2", 50000),  # one giant token
        (5, ("word " * 20000).strip(), "en", "s2", 99999),  # very long doc
        (6, "tab\tnewline\ncarriage\rmixed  spaces", "en", "s3", 35),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).cache()


def test_text_family_survives_adversarial_docs(adversarial_docs):
    from clusterforge_spark.operators import text as TX

    assert TX.token_counts(adversarial_docs).count() == 6
    assert TX.lang_id(adversarial_docs).count() == 6
    assert TX.quality_score(adversarial_docs).count() == 6
    assert TX.normalize_text(adversarial_docs).count() == 6
    assert TX.repetition_stats(adversarial_docs).count() == 6
    assert TX.source_mixing_weights(adversarial_docs).count() == 3
    # only same-source docs share shingles here → no cross-source rows
    assert TX.cross_source_contamination(adversarial_docs).count() == 0


def test_dedup_family_survives_adversarial_docs(adversarial_docs):
    from clusterforge_spark.operators import dedup as DD

    assert DD.dedup_exact(adversarial_docs).count() == 6
    assert DD.dedup_ngram_jaccard(adversarial_docs).count() == 0
    assert DD.dedup_levenshtein(adversarial_docs).count() == 0
    assert DD.minhash_estimate_error(adversarial_docs).count() == 0
    # r10 auto-salting: the eager bucket profile must survive degenerate
    # inputs — an EMPTY corpus (max over zero buckets is NULL → plain
    # join, no salt) and the adversarial shapes above
    assert DD.dedup_minhash_banded(adversarial_docs).count() == 0
    empty = adversarial_docs.filter("doc_id < 0")
    assert DD.dedup_minhash_banded(empty).count() == 0
    # null text and empty text both fingerprint to the no-content simhash
    # and pair as an (intentional) content-identical match
    pairs = DD.dedup_simhash(adversarial_docs).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}
    assert pairs[0].hamming == 0


def test_packing_family_survives_adversarial_docs(adversarial_docs):
    from clusterforge_spark.operators.packing import (
        chunk_sliding,
        hash_split,
        pack_chunks,
    )

    chunks = chunk_sliding(adversarial_docs).collect()
    # null + empty docs emit nothing; the 50k/100k docs dominate
    assert {r.doc_id for r in chunks} == {3, 4, 5, 6}
    assert all(1 <= r.chunk_len <= 200 for r in chunks)
    assert pack_chunks(adversarial_docs).count() == 6
    assert hash_split(adversarial_docs).count() == 6


def test_stats_family_null_on_zero_variance(spark):
    """Zero-variance / single-row inputs must yield NULL coefficients,
    not an ANSI DIVIDE_BY_ZERO (the same failure class the A/B z-test
    had on degenerate splits)."""
    from clusterforge_spark.operators import relational as R

    li1 = spark.createDataFrame(
        [(1, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", None)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    r = R.linreg_price_vs_qty(li1).collect()[0]
    assert r.n == 1 and r.slope is None and r.intercept is None
    g = R.grouped_linreg(li1).collect()[0]
    assert g.slope is None and g.intercept is None
    corr = {(x.col_a, x.col_b): x.corr for x in R.corr_matrix(li1).collect()}
    assert all(v is None or v == 0.0 for v in corr.values())


def test_more_zero_variance_paths_return_null(spark):
    """Zipf on a single-rank vocabulary, z-score on constant values, and
    L2-normalize on an all-zero vector: NULL / empty, never an ANSI
    DIVIDE_BY_ZERO."""
    from clusterforge_spark.operators import similarity as SIM
    from clusterforge_spark.operators import text as TX
    from clusterforge_spark.operators import validation as V

    docs1 = spark.createDataFrame(
        [(1, "word word word", "en", "s1", 14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    z = TX.zipf_slope(docs1).collect()[0]
    assert z.k == 1 and z.slope is None and z.intercept is None

    ev = spark.createDataFrame(
        [(i, None, 1, "click", 5.0, "{}") for i in range(10)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    assert V.zscore_outliers(ev).count() == 0  # NULL z is never an outlier

    embs = spark.createDataFrame(
        [(1, [0.0, 0.0], 0)], "vec_id long, embedding array<float>, label int"
    )
    rows = SIM.embed_normalize(embs).collect()
    assert len(rows) == 2 and all(r.nval is None for r in rows)


def test_round4_additions_survive_adversarial_docs(adversarial_docs):
    from clusterforge_spark.operators import multimodal as MM
    from clusterforge_spark.operators import text as TX

    # BM25: null/empty docs carry no query terms; giant docs must not blow up
    assert TX.bm25_topk(adversarial_docs).count() == 0  # no query terms present
    # bigram LM: null/empty/1-token docs excluded, the rest score
    bl = {r.doc_id for r in TX.bigram_logprob(adversarial_docs).collect()}
    assert 1 not in bl and 2 not in bl and 4 not in bl  # null, empty, one token
    assert 5 in bl and 6 in bl
    # frame/resize plumbing over fake payloads built from adversarial text
    frames = MM.attach_payload(adversarial_docs.filter("text IS NOT NULL"))
    fs = MM.frame_sample(frames).collect()
    assert all(r.byte_len >= 0 and r.byte_start >= 0 for r in fs)
    assert MM.resize_plan(frames).count() == 5


def test_pq_handles_zero_and_constant_vectors(spark):
    from clusterforge_spark.operators.similarity import pq_codes, pq_topk

    rows = [
        (1, [0.0] * 64, 0),           # zero vector: NaN cosine, still encodable
        (2, [1.0] * 64, 0),           # constant vector
        (3, [float(i) / 64 for i in range(64)], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    codes = pq_codes(emb).collect()
    assert len(codes) == 3
    for r in codes:
        for m in range(8):
            assert 0 <= getattr(r, f"code_{m}") <= 7
    out = pq_topk(emb, k=3).collect()
    # zero vector's cosine is NULL/NaN-free handling: it must not rank above
    # real vectors; the two non-degenerate vectors must be present
    ids = [r.vec_id for r in out]
    assert 2 in ids and 3 in ids


def test_stats_family_degenerate_arms_return_null_not_abort(spark):
    """Empty arms / single rows / all-zero values: every round-4
    statistic yields NULLs (or empty results) instead of ANSI aborts."""
    from clusterforge_spark.operators.validation import (
        gini_concentration,
        ks_test_value,
        mannwhitney_value,
    )

    one_arm = spark.createDataFrame(
        [(i, 2 * i, float(i)) for i in range(5)],  # all even user_ids -> arm A only
        "event_id long, user_id long, value double",
    )
    r = ks_test_value(one_arm).collect()
    assert len(r) == 1 and r[0].n_b == 0 and r[0].d_stat is None
    r2 = mannwhitney_value(one_arm).collect()
    assert len(r2) == 1 and r2[0].z_u is None

    single = spark.createDataFrame(
        [(0, 1, 3.0)], "event_id long, user_id long, value double"
    )
    r3 = mannwhitney_value(single).collect()
    assert len(r3) == 1  # tie-corrected variance undefined -> NULL z
    assert r3[0].z_u is None

    zeros = spark.createDataFrame(
        [(i, i, 0.0) for i in range(4)], "event_id long, user_id long, value double"
    )
    r4 = gini_concentration(zeros).collect()
    assert len(r4) == 1 and r4[0].gini is None

    empty = spark.createDataFrame([], "event_id long, user_id long, value double")
    assert ks_test_value(empty).collect() == []
    assert gini_concentration(empty).collect()[0].n_users == 0
