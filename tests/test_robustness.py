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
