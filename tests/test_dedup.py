"""Dedup strategies must find the planted duplicates (dedup.py corpus)."""

from __future__ import annotations

import pytest

from clusterforge_spark.operators.dedup import (
    EXACT_DUP_OFFSET,
    NEAR_DUP_OFFSET,
    dedup_embedding_cosine,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
    docs_with_dups,
    embs_with_dups,
    simhash_fingerprints,
)


@pytest.fixture(scope="module")
def dup_docs(documents):
    return docs_with_dups(documents, n_exact=20, n_near=10).cache()


def test_exact_dedup_finds_planted_copies(dup_docs, documents):
    out = dedup_exact(dup_docs).collect()
    n_docs = documents.count()
    dup_groups = [r for r in out if r.n_dups > 1]
    # every planted exact copy collapses onto its original, keeping min id
    assert len(dup_groups) >= 20
    for g in dup_groups:
        assert g.keep_id < EXACT_DUP_OFFSET
    # dedup never loses content: distinct texts preserved
    assert len(out) <= n_docs + 10  # near-copies may add new distinct texts


def test_ngram_jaccard_finds_near_dups(dup_docs):
    pairs = dedup_ngram_jaccard(dup_docs, threshold=0.2).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    # original ↔ its near copy (last token dropped) is highly similar
    near_hits = [p for p in found if p[1] >= NEAR_DUP_OFFSET and p[1] - NEAR_DUP_OFFSET == p[0]]
    assert len(near_hits) >= 8  # ≥80% of 10 planted near-dups
    for r in pairs:
        assert 0.0 <= r.jaccard <= 1.0


def test_simhash_near_dups_low_hamming(dup_docs):
    pairs = dedup_simhash(dup_docs, max_hamming=6).collect()
    found = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    exact_hits = [
        h
        for (a, b), h in found.items()
        if a < EXACT_DUP_OFFSET and b == a + EXACT_DUP_OFFSET
    ]
    assert len(exact_hits) >= 20  # exact copies ⇒ hamming 0
    assert all(h == 0 for h in exact_hits)


def test_simhash_deterministic(dup_docs):
    a = {r.doc_id: r.simhash for r in simhash_fingerprints(dup_docs).collect()}
    b = {r.doc_id: r.simhash for r in simhash_fingerprints(dup_docs).collect()}
    assert a == b
    assert all(0 <= v < (1 << 60) for v in a.values())


def test_minhash_lsh_finds_planted_copies(dup_docs):
    pairs = dedup_minhash_lsh(dup_docs, jaccard_dist_threshold=0.3).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    exact_hits = [p for p in found if p[1] - EXACT_DUP_OFFSET == p[0]]
    assert len(exact_hits) >= 18  # LSH is approximate; ≥90% of 20 planted
    for r in pairs:
        assert 0.0 <= r.jaccard_sim <= 1.0 + 1e-9


def test_embedding_cosine_dedup(embeddings):
    embs = embs_with_dups(embeddings, n_copy=20)
    pairs = dedup_embedding_cosine(embs, threshold=0.9).collect()
    found = {(r.vec_a, r.vec_b): r.cos_sim for r in pairs}
    copies = {(a, b): c for (a, b), c in found.items() if b - EXACT_DUP_OFFSET == a}
    assert len(copies) == 20
    for c in copies.values():
        assert c == pytest.approx(1.0, abs=1e-6)


def test_minhash_banded_bucket_cap_salting_is_value_identical(spark, dup_docs):
    """r9 hot-bucket escape hatch: with bucket_cap forcing the template
    cluster's (band, key) bucket into multiple salted sub-keys, the
    verified pair set must be row-identical to the unsalted join — the
    salting only changes the shuffle layout (SCALE.md r9 bound)."""
    from pyspark.sql import functions as F

    from clusterforge_spark.operators.dedup import dedup_minhash_banded

    # plant a 60-doc template cluster (shared text + a DISTINCT suffix
    # per doc — near-identical, not byte-identical, so the r11 exact-dup
    # collapse keeps all 60 as their own representatives) on top of the
    # standard dup corpus: members agree on whole band signatures, so
    # hot buckets hold tens of docs ≫ the cap below
    template = (
        "server error the page you requested could not be found "
        "please contact the site administrator reference code"
    )
    cluster = spark.range(60).select(
        (F.col("id") + 900_000).alias("doc_id"),
        F.concat(F.lit(template + " "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("tmpl").alias("source"),
        F.length(F.lit(template)).cast("long").alias("n_chars"),
    )
    docs = dup_docs.unionByName(cluster)

    plain = sorted(
        tuple(r) for r in dedup_minhash_banded(docs, threshold=0.2).collect()
    )
    salted = sorted(
        tuple(r)
        for r in dedup_minhash_banded(docs, threshold=0.2, bucket_cap=16).collect()
    )
    assert salted == plain
    # the cluster must actually exercise the hot-bucket path: its pairs
    # dominate the result (60 near-identical docs)
    n_cluster_pairs = sum(1 for a, b, _ in plain if a >= 900_000 and b >= 900_000)
    assert n_cluster_pairs >= 60 * 59 / 2 * 0.9


def test_minhash_banded_auto_engages_and_stays_value_identical(
    spark, dup_docs, monkeypatch
):
    """r10: bucket_cap="auto" (the default) profiles the banded table and
    engages the 2-D salting only when a bucket exceeds
    AUTO_BUCKET_ENGAGE — no operator knob. With the threshold lowered to
    the 60-doc planted cluster, auto must pick the salted plan AND stay
    row-identical to the forced-plain join; at the real threshold the
    same corpus must come back salt-free."""
    from pyspark.sql import functions as F

    from clusterforge_spark.operators import dedup as DD

    template = (
        "server error the page you requested could not be found "
        "please contact the site administrator reference code"
    )
    cluster = spark.range(60).select(
        (F.col("id") + 900_000).alias("doc_id"),
        F.concat(F.lit(template + " "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("tmpl").alias("source"),
        F.length(F.lit(template)).cast("long").alias("n_chars"),
    )
    docs = dup_docs.unionByName(cluster)

    plain = sorted(
        tuple(r)
        for r in DD.dedup_minhash_banded(docs, threshold=0.2, bucket_cap=None).collect()
    )
    # real threshold (2048): the 60-doc cluster is under it → plain plan
    auto_off = DD.dedup_minhash_banded(docs, threshold=0.2)
    off_plan = auto_off._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" not in off_plan and "_probe" not in off_plan
    assert sorted(tuple(r) for r in auto_off.collect()) == plain
    # lowered threshold: auto must engage (salt in plan) and stay identical
    monkeypatch.setattr(DD, "AUTO_BUCKET_ENGAGE", 16)
    monkeypatch.setattr(DD, "AUTO_BUCKET_CAP", 16)
    auto_on = DD.dedup_minhash_banded(docs, threshold=0.2)
    on_plan = auto_on._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in on_plan and "_probe" in on_plan
    assert sorted(tuple(r) for r in auto_on.collect()) == plain


def test_minhash_banded_collapses_identical_mega_bucket(spark, dup_docs, monkeypatch):
    """r11 mega-cluster routing: a planted cluster of BYTE-IDENTICAL
    texts is collapsed to one representative before shingling, so even
    with the auto-salting engage threshold dropped to 16 the banded
    table never sees a hot bucket (plan stays salt-free) — yet the pair
    output still contains every within-cluster pair at jaccard exactly
    1.0, plus the cluster's cross pairs against its near-dup source doc
    expanded to all members."""
    from pyspark.sql import functions as F

    from clusterforge_spark.operators import dedup as DD

    text = (
        "server error the page you requested could not be found "
        "please contact the site administrator reference code"
    )
    m = 80
    cluster = spark.range(m).select(
        (F.col("id") + 900_000).alias("doc_id"),
        F.lit(text).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("tmpl").alias("source"),
        F.lit(len(text)).cast("long").alias("n_chars"),
    )
    docs = dup_docs.unionByName(cluster)

    monkeypatch.setattr(DD, "AUTO_BUCKET_ENGAGE", 16)
    out = DD.dedup_minhash_banded(docs, threshold=0.2)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # 80 identical docs collapse to 1 rep: no hot bucket, no salting
    assert "_salt" not in plan and "_probe" not in plan
    rows = out.collect()
    within = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in rows
        if 900_000 <= r["doc_a"] < 900_000 + m
        and 900_000 <= r["doc_b"] < 900_000 + m
    }
    assert len(within) == m * (m - 1) // 2
    assert set(within.values()) == {1.0}


def test_minhash_banded_finds_planted_and_verifies_exactly(dup_docs):
    from clusterforge_spark.operators.dedup import dedup_minhash_banded, dedup_ngram_jaccard

    pairs = dedup_minhash_banded(dup_docs, threshold=0.2).collect()
    found = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    exact_hits = [
        j for (a, b), j in found.items()
        if a < EXACT_DUP_OFFSET and b == a + EXACT_DUP_OFFSET
    ]
    assert len(exact_hits) == 20  # identical docs agree on every band
    assert all(j == 1.0 for j in exact_hits)
    # verified-jaccard property: every emitted pair's jaccard equals the
    # exhaustive blocked n-gram computation for pairs both paths cover
    ngram = {(r.doc_a, r.doc_b): r.jaccard for r in
             dedup_ngram_jaccard(dup_docs, threshold=0.2).collect()}
    for key, j in found.items():
        if key in ngram:
            assert ngram[key] == j


def test_components_transitive_closure(spark):
    # A-B and B-C pairs (A-C never a candidate) must land in one component
    from clusterforge_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    out = {r.doc_id: (r.component, r.component_size) for r in dedup_components(pairs).collect()}
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[3] == (1, 3)
    assert out[10] == (10, 2) and out[11] == (10, 2)
    for d in (20, 21, 22, 23):
        assert out[d] == (20, 4)


def test_components_chain_needs_iterations(spark):
    # a 9-long path graph: min label must propagate the full diameter
    from clusterforge_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5, 13)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r.component for r in dedup_components(pairs).collect()}
    assert all(out[v] == 5 for v in range(5, 14))


def test_dedup_canonical_keeps_best_per_component(dup_docs):
    from clusterforge_spark.operators.dedup import (
        dedup_canonical,
        dedup_minhash_banded,
    )

    rows = dedup_canonical(dup_docs, dedup_minhash_banded(dup_docs)).collect()
    assert len(rows) == dup_docs.count()  # every doc gets a decision
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    multi = [g for g in by_comp.values() if len(g) > 1]
    assert multi  # planted dups produced real components
    for grp in by_comp.values():
        canon = [r for r in grp if r.is_canonical]
        assert len(canon) == 1  # exactly one keeper per component
        best = min(grp, key=lambda r: (-r.quality, r.doc_id))
        assert canon[0].doc_id == best.doc_id  # max quality, tie -> min id
        assert all(r.canonical_id == best.doc_id for r in grp)


def test_triangles_on_constructed_graph(spark):
    from clusterforge_spark.operators.dedup import dedup_triangles

    # K4 on {1,2,3,4} (4 triangles) + a chain 5-6-7 (no triangle)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 6), (6, 7)],
        "doc_a long, doc_b long",
    )
    tris = sorted(map(tuple, dedup_triangles(pairs).collect()))
    assert tris == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]


def test_component_size_stats_accounting(spark):
    from clusterforge_spark.operators.dedup import component_size_stats

    comps = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 30)],
        "doc_id long, component long",
    )
    rows = {r.size: r for r in component_size_stats(comps).collect()}
    assert rows[3].n_components == 1 and rows[3].docs_removed_if_deduped == 2
    assert rows[2].n_components == 1 and rows[2].docs_removed_if_deduped == 1
    assert rows[1].n_components == 1 and rows[1].docs_removed_if_deduped == 0


def test_dup_rate_by_source_accounting(spark):
    from clusterforge_spark.operators.dedup import dup_rate_by_source

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b")],
        "doc_id long, source string",
    )
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (4, 4)], "doc_id long, component long"
    )
    rows = {r.source: r for r in dup_rate_by_source(docs, comps).collect()}
    assert rows["a"].n_docs == 3 and rows["a"].n_in_dup_cluster == 2
    assert abs(rows["a"].dup_rate - 2 / 3) < 1e-4
    assert rows["b"].n_docs == 2 and rows["b"].n_in_dup_cluster == 1


def test_levenshtein_catches_bucket_straddling_pair(spark):
    """A near-dup pair whose lengths straddle a 100-char bucket edge
    (99 vs 101 chars → buckets 0 and 1) must still be found: the blocked
    join probes adjacent len_buckets, not just the doc's own."""
    from clusterforge_spark.operators.dedup import dedup_levenshtein

    rows = [
        (1, "a" * 99, "en", "src0", 99),
        (2, "a" * 101, "en", "src0", 101),
        (3, "b" * 350, "en", "src0", 350),  # non-adjacent bucket, dissimilar
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = dedup_levenshtein(df, threshold=0.2).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # adjacent-bucket probing must not double-emit a pair
    assert len(out) == len(pairs)


def test_grouped_components_equal_pair_table_components(spark, dup_docs):
    """r11 expansion-free build: dedup_components_grouped(docs) must be
    row-identical to dedup_components(dedup_minhash_banded(docs)) — on
    the standard dup corpus AND with a byte-identical cluster planted
    both in isolation (exact-dup clique with no cross-group near-dups →
    must still surface as a component via the rep self-edge) and
    bridged to a near-dup neighbour (cross-group pairs must merge the
    clique into the neighbour's component)."""
    from pyspark.sql import functions as F

    from clusterforge_spark.operators.dedup import (
        dedup_components,
        dedup_components_grouped,
        dedup_minhash_banded,
    )

    text = (
        "isolated boilerplate fragment repeated verbatim across mirrors "
        "of the same archive snapshot with no nearby variants anywhere"
    )
    clique = spark.range(7).select(
        (F.col("id") + 700_000).alias("doc_id"),
        F.lit(text).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("mirror").alias("source"),
        F.lit(len(text)).cast("long").alias("n_chars"),
    )
    # a near (not identical) variant bridging into the clique
    near = spark.range(1).select(
        F.lit(700_100).cast("long").alias("doc_id"),
        F.lit(text + " extra").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("mirror").alias("source"),
        F.lit(len(text) + 6).cast("long").alias("n_chars"),
    )
    docs = dup_docs.unionByName(clique).unionByName(near)

    via_pairs = {
        r.doc_id: (r.component, r.component_size)
        for r in dedup_components(dedup_minhash_banded(docs)).collect()
    }
    grouped = {
        r.doc_id: (r.component, r.component_size)
        for r in dedup_components_grouped(docs).collect()
    }
    assert grouped == via_pairs
    # the clique + bridge doc form one component labeled by the clique min
    assert grouped[700_000] == (700_000, 8)
    assert grouped[700_100][0] == 700_000


def test_star_components_equal_propagation(spark):
    """large/small-star must produce the identical component assignment
    as min-label propagation — on a long chain (adversarial diameter for
    propagation), on random graphs, and with multi-edge/self-ish input."""
    import random

    from clusterforge_spark.operators.dedup import (
        dedup_components,
        dedup_components_star,
    )

    rng = random.Random(7)
    # 200-node chain offset by 1000, plus two random graphs, plus a clique
    cases = []
    cases.append([(1000 + i, 1000 + i + 1) for i in range(200)])
    for _ in range(2):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(150)
        ]
        cases.append([(a, b) for a, b in edges if a != b])
    cases.append([(i, j) for i in range(20) for j in range(i + 1, 20)])

    for edges in cases:
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        prop = {
            r.doc_id: (r.component, r.component_size)
            for r in dedup_components(pairs).collect()
        }
        star = {
            r.doc_id: (r.component, r.component_size)
            for r in dedup_components_star(pairs).collect()
        }
        assert star == prop


def test_star_components_log_rounds_on_chain(spark):
    """The star loop must converge in far fewer than diameter rounds."""
    from clusterforge_spark.operators import dedup as DD

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "doc_a long, doc_b long"
    )
    out = DD.dedup_components_star(pairs, max_iter=10).collect()
    comps = {r.component for r in out}
    assert comps == {0}
    assert len(out) == 65


def test_minhash_estimate_tracks_exact_jaccard(dup_docs):
    """Signature estimate must be unbiased-ish on the planted exact dups
    (est = 1 when sets are identical) and within coarse LSH error
    (K=12 components) elsewhere."""
    from clusterforge_spark.operators.dedup import minhash_estimate_error

    rows = minhash_estimate_error(dup_docs).collect()
    assert rows, "banded candidates expected on the dup corpus"
    by_pair = {(r.doc_a, r.doc_b): r for r in rows}
    exact_copies = [
        r
        for (a, b), r in by_pair.items()
        if a < EXACT_DUP_OFFSET and b == a + EXACT_DUP_OFFSET
    ]
    assert exact_copies, "planted exact copies must be candidates"
    for r in exact_copies:
        assert r.exact_jaccard == 1.0
        assert r.est_jaccard == 1.0 and r.n_matching_components == 12
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert abs(r.abs_err - abs(r.est_jaccard - r.exact_jaccard)) < 2e-6


def test_pagerank_uniform_on_regular_graph(spark):
    """On a k-regular graph (triangle) PageRank is exactly uniform at
    every iteration — a closed-form check of the damped update."""
    from clusterforge_spark.operators.dedup import pagerank

    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.9), (1, 3, 0.9)], "doc_a long, doc_b long, jaccard double"
    )
    rows = {r["doc_id"]: r["pagerank"] for r in pagerank(pairs).collect()}
    assert set(rows) == {1, 2, 3}
    for v in rows.values():
        assert abs(v - 1.0 / 3.0) < 1e-6


def test_pagerank_mass_conserved_and_hub_ranked(spark):
    """Star graph: total mass ≈ 1 and the hub outranks every leaf."""
    from clusterforge_spark.operators.dedup import pagerank

    pairs = spark.createDataFrame(
        [(0, i, 0.5) for i in range(1, 6)], "doc_a long, doc_b long, jaccard double"
    )
    rows = {r["doc_id"]: r["pagerank"] for r in pagerank(pairs).collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-4
    hub = rows.pop(0)
    assert all(hub > leaf for leaf in rows.values())
    # leaves are symmetric — identical rank
    assert max(rows.values()) - min(rows.values()) < 1e-9


def test_dedup_incremental_classifies_planted_dups(spark):
    """A batch doc that copies an index doc's text → drop_exact; a
    near-copy (one token dropped) → drop_near; fresh text → keep."""
    from clusterforge_spark.operators.dedup import INCR_BATCH_MOD, dedup_incremental

    m = INCR_BATCH_MOD
    long_a = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
    long_b = " ".join(f"delta{i} epsilon{i} zeta{i}" for i in range(12))
    fresh = " ".join(f"unique{i} token{i} here{i}" for i in range(12))
    rows = [
        # index docs (id % m != 0)
        (1, long_a, "en", "web", len(long_a)),
        (2, long_b, "en", "web", len(long_b)),
        # batch: exact copy of 1, near copy of 2 (last token dropped), fresh
        (m, long_a, "en", "web", len(long_a)),
        (2 * m, long_b.rsplit(" ", 1)[0], "en", "web", len(long_b)),
        (3 * m, fresh, "en", "web", len(fresh)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["doc_id"]: r["decision"] for r in dedup_incremental(docs).collect()}
    assert out == {m: "drop_exact", 2 * m: "drop_near", 3 * m: "keep"}


def test_split_leakage_counts_cross_split_pairs(spark):
    from clusterforge_spark.operators.dedup import split_leakage

    pairs = spark.createDataFrame(
        [(1, 2, 0.8), (3, 4, 0.5), (5, 6, 0.9)],
        "doc_a long, doc_b long, jaccard double",
    )
    splits = spark.createDataFrame(
        [(1, "train"), (2, "val"), (3, "train"), (4, "train"), (5, "val"), (6, "train")],
        "doc_id long, split string",
    )
    rows = split_leakage(pairs, splits).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["split_lo"], r["split_hi"]) == ("train", "val")
    assert r["n_leaking_pairs"] == 2
    assert abs(r["max_jaccard"] - 0.9) < 1e-9
    assert abs(r["mean_jaccard"] - 0.85) < 1e-9


def test_cdc_chunk_dedup_finds_shared_passage(spark):
    """A passage shared between two otherwise-different docs chunks
    identically (content-defined boundaries) and is reported as
    duplicated sub-document content in BOTH docs; a doc without shared
    passages reports zero."""
    import hashlib

    from clusterforge_spark.operators.dedup import CDC_MOD, cdc_chunk_dedup

    def is_boundary(tok: str) -> bool:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % CDC_MOD == 0

    # two deterministic boundary tokens inside the shared passage → the
    # span between them chunks identically in any surrounding document
    bnd = [t for i in range(10_000) if is_boundary(t := f"tok{i}")][:2]
    mid = " ".join(f"shared{i} common{i} passage{i}" for i in range(10))
    shared = f"{bnd[0]} {mid} {bnd[1]} {mid}"
    a = "intro alpha " + shared + " outro alpha"
    b = "totally different beginning here " + shared + " and another ending"
    c = " ".join(f"unique{i} only{i}" for i in range(25))
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in cdc_chunk_dedup(docs).collect()}
    assert out[1]["n_dup_chunks"] >= 1
    assert out[2]["n_dup_chunks"] >= 1
    assert out[1]["dup_token_frac"] > 0.4
    assert out[3]["n_dup_chunks"] == 0
    assert out[3]["dup_token_frac"] == 0.0


class TestBlockSkewSalting:
    """One planted hot block (every doc in one lang/source/len_bucket;
    every embedding under one label): the salted plans must (a) bound
    per-task group/key size and (b) return the exact same pairs as the
    unsalted-equivalent huge-cap run — salting rearranges the shuffle,
    never the result."""

    @pytest.fixture(scope="class")
    def hot_docs(self, documents):
        from pyspark.sql import functions as F

        return (
            documents.limit(300)
            .select(
                "doc_id",
                "text",
                F.lit("xx").alias("lang"),
                F.lit("hot").alias("source"),
                F.lit(150).alias("n_chars"),
            )
            .cache()
        )

    @pytest.fixture(scope="class")
    def hot_embs(self, embeddings):
        from pyspark.sql import functions as F

        return (
            embeddings.limit(300)
            .select("vec_id", "embedding", F.lit(0).alias("label"))
            .cache()
        )

    def _sorted(self, df):
        return sorted(tuple(r) for r in df.collect())

    def test_ngram_salted_equals_unsalted(self, hot_docs):
        lo = dedup_ngram_jaccard(hot_docs, threshold=0.05, block_cap=40)
        hi = dedup_ngram_jaccard(hot_docs, threshold=0.05, block_cap=10**9)
        assert self._sorted(lo) == self._sorted(hi)

    def test_levenshtein_salted_equals_unsalted(self, hot_docs):
        from clusterforge_spark.operators.dedup import dedup_levenshtein

        lo = dedup_levenshtein(hot_docs, threshold=0.9, block_cap=40)
        hi = dedup_levenshtein(hot_docs, threshold=0.9, block_cap=10**9)
        rows = self._sorted(lo)
        assert rows == self._sorted(hi)
        assert len(rows) > 0  # the hot block really produces pairs

    def test_embedding_salted_equals_unsalted(self, hot_embs):
        lo = dedup_embedding_cosine(hot_embs, threshold=-1.0, block_cap=50)
        hi = dedup_embedding_cosine(hot_embs, threshold=-1.0, block_cap=10**9)
        rows = self._sorted(lo)
        assert rows == self._sorted(hi)
        # all-pairs at threshold 0: the full 300·299/2 pair set survives
        assert len(rows) == 300 * 299 // 2

    def test_join_side_key_size_bounded(self, hot_docs):
        """No (block, _salt, _probe) shuffle key on either join side of the
        salted ngram join exceeds ~cap rows — the m² hot task is gone."""
        from pyspark.sql import functions as F

        from clusterforge_spark.operators.dedup import (
            _salted_for_join,
            shingle_hash_table,
        )

        cap = 40
        sh = shingle_hash_table(hot_docs)
        salted = _salted_for_join(sh, ["lang", "source", "len_bucket"], "doc_id", cap)
        per_key = (
            salted.groupBy("lang", "source", "len_bucket", "_salt", "_probe")
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()[0]["mx"]
        )
        m = sh.count()
        assert m == 300  # the block really is hot (single block)
        # hash salting is uneven but each sub-block stays O(cap), far
        # below the unsalted m
        assert per_key <= 3 * cap
        # every row replicated s times, s = ceil(m / cap)
        s = -(-m // cap)
        assert salted.count() == m * s

    def test_embedding_group_size_bounded(self, hot_embs):
        from pyspark.sql import functions as F

        from clusterforge_spark.operators.dedup import _emb_salted_groups

        cap = 50
        g = _emb_salted_groups(hot_embs, cap)
        per_group = (
            g.groupBy("label", "_gi", "_gj")
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()[0]["mx"]
        )
        # a group holds at most two sub-blocks of ~cap vectors each
        assert per_group <= 3 * cap


def test_grouped_graph_family_matches_pair_table(spark, dup_docs):
    """r12 (verdict item 3): the grouped analytics family — k-core,
    PageRank, triangle count, degree histogram computed on the
    multiplicity-weighted representative graph — is row-identical to
    the pair-table twins on a corpus combining the fixture's planted
    m=2 exact-dup groups, a BRIDGED pair of byte-identical cliques
    (two templates one word apart → cross-group near-dup edges), and an
    ISOLATED byte-identical clique (no cross edges at all)."""
    from pyspark.sql import functions as F

    from clusterforge_spark.operators.dedup import (
        dedup_minhash_banded,
        dedup_triangles,
        kcore_grouped,
        kcore_peel,
        pagerank,
        pagerank_grouped,
        pair_degree_stats,
        pair_degree_stats_grouped,
        triangle_count_grouped,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill nearby every single day"
    )
    variant = base.replace("day", "evening")
    iso = (
        "completely unrelated isolated template page about server "
        "maintenance windows and scheduled downtime notices for users"
    )

    def clique(text, start, m):
        return spark.range(m).select(
            (F.col("id") + start).alias("doc_id"),
            F.lit(text).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("tmpl").alias("source"),
            F.lit(len(text)).cast("long").alias("n_chars"),
        )

    docs = (
        dup_docs.unionByName(clique(base, 900_000, 7))
        .unionByName(clique(variant, 910_000, 5))
        .unionByName(clique(iso, 920_000, 9))
    )
    pairs = dedup_minhash_banded(docs).cache()
    # the two one-word-apart cliques really are bridged (cross edges)
    assert (
        pairs.filter(
            (F.col("doc_a") >= 900_000)
            & (F.col("doc_a") < 910_000)
            & (F.col("doc_b") >= 910_000)
            & (F.col("doc_b") < 920_000)
        ).count()
        == 7 * 5
    )

    kc_pair = sorted((r.doc_id, r.degree) for r in kcore_peel(pairs).collect())
    kc_grp = sorted(
        (r.doc_id, r.degree) for r in kcore_grouped(docs).collect()
    )
    assert kc_grp == kc_pair and len(kc_pair) > 0

    pr_pair = {r.doc_id: r.pagerank for r in pagerank(pairs).collect()}
    pr_grp = {r.doc_id: r.pagerank for r in pagerank_grouped(docs).collect()}
    assert pr_grp == pr_pair

    n_tri = dedup_triangles(pairs).count()
    got = triangle_count_grouped(docs).collect()
    assert len(got) == 1 and got[0]["n_triangles"] == n_tri and n_tri > 0

    deg_pair = sorted(
        (r.degree, r.n_docs) for r in pair_degree_stats(pairs).collect()
    )
    deg_grp = sorted(
        (r.degree, r.n_docs) for r in pair_degree_stats_grouped(docs).collect()
    )
    assert deg_grp == deg_pair


def test_kcore_peel_semantics(spark):
    """k-core peel on a hand-built graph: a 4-clique (every vertex
    degree 3) survives a 2-core peel intact; a chain and a pendant
    vertex hanging off the clique peel away; residual degrees are the
    within-core degrees."""
    from pyspark.sql import functions as F

    from clusterforge_spark.operators.dedup import kcore_peel

    # clique {1,2,3,4} + pendant 5-1 + chain 6-7-8
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5), (6, 7), (7, 8)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["degree"] for r in kcore_peel(pairs, k=2, rounds=4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
