"""Similarity search: brute-force correctness vs numpy; LSH/IVF sanity."""

from __future__ import annotations

import numpy as np
import pytest

from clusterforge_spark.functions import vector as V
from clusterforge_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def emb_np(embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


def test_brute_force_matches_numpy(embeddings, emb_np):
    ids, mat = emb_np
    q = np.array(V.QUERY_VEC)
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))[:10]
    expected = list(ids[order])
    got = [r.vec_id for r in brute_force_topk(embeddings, k=10).collect()]
    assert got == expected


def test_topk_ranks_are_dense(embeddings):
    rows = brute_force_topk(embeddings, k=10).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, 11))
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_lsh_candidates_are_subset_quality(embeddings):
    """LSH top-k sims can never exceed brute-force sims rank-by-rank."""
    brute = [r.cos_sim for r in brute_force_topk(embeddings, k=10).orderBy("rank").collect()]
    lsh = [r.cos_sim for r in lsh_topk(embeddings, k=10).orderBy("rank").collect()]
    assert len(lsh) > 0
    for i, s in enumerate(lsh[: len(brute)]):
        assert s <= brute[i] + 1e-9


def test_ivf_cells_valid_and_topk_subset(embeddings):
    cells = ivf_assign(embeddings).select("cell").distinct().collect()
    assert all(0 <= r.cell < len(V.IVF_CENTROIDS) for r in cells)
    brute = [r.cos_sim for r in brute_force_topk(embeddings, k=10).orderBy("rank").collect()]
    ivf = [r.cos_sim for r in ivf_topk(embeddings, k=10).orderBy("rank").collect()]
    assert len(ivf) > 0
    for i, s in enumerate(ivf[: len(brute)]):
        assert s <= brute[i] + 1e-9


def test_dot_dynamic_matches_literal(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>")
    got = df.select(V.dot_dynamic("a", "b").alias("d")).collect()[0].d
    assert got == pytest.approx(32.0)


def test_batch_topk_matches_per_query_brute_force(embeddings):
    from clusterforge_spark.operators.similarity import BATCH_QUERIES, batch_topk, brute_force_topk

    out = batch_topk(embeddings, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cos_sim))
    assert set(by_q) == set(range(len(BATCH_QUERIES)))
    for qid, q in enumerate(BATCH_QUERIES):
        want = [
            (r.rank, r.vec_id, r.cos_sim)
            for r in brute_force_topk(embeddings, query=q, k=5).collect()
        ]
        assert sorted(by_q[qid]) == sorted(want)


def test_ivf_trained_assignment_matches_numpy(embeddings, emb_np):
    """The broadcast-model cell assignment == numpy argmin over the
    trained (label-mean, 4dp-rounded) centroids."""
    from clusterforge_spark.operators.similarity import (
        ivf_trained_cells,
        ivf_trained_topk,
    )

    cents = {r.label: np.array(r.cent) for r in ivf_trained_cells(embeddings).collect()}
    labels = sorted(cents)
    C = np.array([cents[l] for l in labels])
    ids, mat = emb_np
    d2 = ((mat[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    want = {int(v): labels[int(np.argmin(row))] for v, row in zip(ids, d2)}

    from pyspark.sql import functions as F

    packed_query = ivf_trained_topk(embeddings, k=10, nprobe=len(labels))
    # nprobe = all cells → trained IVF degrades to exact brute force
    brute = brute_force_topk(embeddings, k=10)
    assert [r.vec_id for r in packed_query.collect()] == [
        r.vec_id for r in brute.collect()
    ]

    # spot-check the argmin assignment itself on the full corpus
    from clusterforge_spark.operators.similarity import label_centroids  # noqa: F401
    import clusterforge_spark.operators.similarity as SIM_MOD

    cells = SIM_MOD.ivf_trained_cells(embeddings)
    packed = cells.agg(F.collect_list(F.struct("label", "cent")).alias("cells"))
    assigned = (
        embeddings.crossJoin(F.broadcast(packed))
        .select(
            "vec_id",
            F.array_min(
                F.transform(
                    F.col("cells"),
                    lambda c: F.struct(
                        F.aggregate(
                            F.zip_with(
                                F.col("embedding"),
                                c.getField("cent"),
                                lambda x, y: (x.cast("double") - y)
                                * (x.cast("double") - y),
                            ),
                            F.lit(0.0),
                            lambda a, v: a + v,
                        ).alias("d"),
                        c.getField("label").alias("l"),
                    ),
                )
            )
            .getField("l")
            .cast("long")
            .alias("cell"),
        )
    )
    got = {r.vec_id: r.cell for r in assigned.collect()}
    assert got == want


def test_filtered_topk_respects_label_and_subsets_brute_force(embeddings):
    from clusterforge_spark.operators.similarity import brute_force_topk, filtered_topk

    out = filtered_topk(embeddings, k=10, label=3).collect()
    assert 0 < len(out) <= 10
    assert all(r.label == 3 for r in out)
    # filtered result = brute-force ranking restricted to the label
    import pyspark.sql.functions as F

    from clusterforge_spark.functions import vector as V
    from clusterforge_spark.functions.rounding import round_det

    scored = {
        r.vec_id: r.s
        for r in embeddings.filter(F.col("label") == 3)
        .select("vec_id", round_det(V.cosine_lit("embedding", V.QUERY_VEC), 6).alias("s"))
        .collect()
    }
    want = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.vec_id, r.cos_sim) for r in out] == want


def test_embedding_dim_stats_matches_numpy(embeddings):
    import numpy as np

    from clusterforge_spark.operators.similarity import embedding_dim_stats

    got = {r.dim: r for r in embedding_dim_stats(embeddings).collect()}
    X = np.stack(
        embeddings.select("embedding").toPandas()["embedding"].to_numpy()
    ).astype(np.float64)
    micro = np.floor(X * 1e6 + 0.5)
    for d in range(X.shape[1]):
        r = got[d]
        assert r.n == X.shape[0]
        assert abs(r.mean_v - micro[:, d].sum() / 1e6 / X.shape[0]) < 1e-4
        assert r.min_v == micro[:, d].min() / 1e6
        assert r.max_v == micro[:, d].max() / 1e6


def test_pq_codes_match_numpy(embeddings, emb_np):
    import numpy as np

    from clusterforge_spark.operators.similarity import pq_codes

    ids, X = emb_np
    got = pq_codes(embeddings).orderBy("vec_id").collect()
    for r in got:
        x = X[list(ids).index(r.vec_id)]
        for m in range(V.PQ_M):
            sub = x[m * V.PQ_SUBDIM : (m + 1) * V.PQ_SUBDIM]
            d = [
                float(np.sum((sub - np.array(cb)) ** 2))
                for cb in V.PQ_CODEBOOKS[m]
            ]
            # strict-< tie-break: lowest code among minima
            want = min(range(len(d)), key=lambda c: (d[c], c))
            assert getattr(r, f"code_{m}") == want


def test_pq_topk_rerank_is_exact_cosine_on_candidates(embeddings):
    from clusterforge_spark.functions.rounding import round_det
    from clusterforge_spark.operators.similarity import pq_codes, pq_topk

    from pyspark.sql import functions as F

    out = pq_topk(embeddings, k=10, rerank=4).collect()
    assert len(out) == 10
    # ranks dense, ordering by (cos_sim desc, vec_id)
    assert [r.rank for r in out] == list(range(1, 11))
    keys = [(-r.cos_sim, r.vec_id) for r in out]
    assert keys == sorted(keys)
    # every returned cos_sim equals the exact cosine for that vector
    ids = [r.vec_id for r in out]
    exact = {
        r.vec_id: r.s
        for r in embeddings.filter(F.col("vec_id").isin(ids))
        .select(
            "vec_id",
            round_det(V.cosine_lit("embedding", V.QUERY_VEC), 6).alias("s"),
        )
        .collect()
    }
    for r in out:
        assert r.cos_sim == exact[r.vec_id]


def test_embedding_covariance_matches_numpy(spark, embeddings):
    """cov(i,j) equals numpy's biased covariance of the micro-quantized
    components, for a sample of entries including the diagonal."""
    import numpy as np

    from clusterforge_spark.operators.similarity import embedding_covariance

    sub = embeddings.limit(50).cache()
    got = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(sub).collect()}
    mat = np.array(
        [row["embedding"] for row in sub.select("embedding").collect()], dtype=np.float64
    )
    q = np.floor(mat * 1e6 + 0.5)  # the exact micro-quantization
    n, d = q.shape
    assert len(got) == d * (d + 1) // 2
    c = (q.T @ q / n - np.outer(q.sum(0) / n, q.sum(0) / n)) / 1e12
    for i, j in [(0, 0), (0, 1), (3, 17), (63, 63), (10, 60)]:
        assert abs(got[(i, j)] - round(c[i, j], 8)) < 1e-7


def test_pca_top_component_matches_numpy_eigvec(spark, embeddings):
    """The 12-step exact-integer power iterate aligns with numpy's
    dominant eigenvector of the same quantized covariance (|cos| close
    to 1; sign convention = first nonzero component positive)."""
    import numpy as np

    from clusterforge_spark.operators.similarity import pca_top_component

    got = {r["dim"]: r["loading"] for r in pca_top_component(embeddings).collect()}
    v = np.array([got[i] for i in range(len(got))])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4

    mat = np.array(
        [r["embedding"] for r in embeddings.select("embedding").collect()],
        dtype=np.float64,
    )
    q = np.floor(mat * 1e6 + 0.5)
    n = len(q)
    M = n * (q.T @ q) - np.outer(q.sum(0), q.sum(0))
    evals, evecs = np.linalg.eigh(M)
    top = evecs[:, -1]
    assert abs(abs(v @ top) - 1.0) < 1e-3
    nz = np.nonzero(v)[0][0]
    assert v[nz] > 0


def test_covariance_gramian_path_bit_identical(spark, embeddings):
    """The mapInPandas Gramian scale path returns exactly the explode
    form's rows — same exact-integer math, different plan."""
    from clusterforge_spark.operators.similarity import (
        embedding_covariance,
        embedding_covariance_gramian,
    )

    a = sorted(map(tuple, embedding_covariance(embeddings).collect()))
    b = sorted(map(tuple, embedding_covariance_gramian(embeddings).collect()))
    assert a == b and len(a) == 64 * 65 // 2


def test_exact_gram_is_exact_past_int64():
    """_exact_gram must stay exact when the Gramian cells exceed 2⁶³ —
    the silent-wraparound hazard of a plain int64 ``acc += q.T @ q`` on
    a large partition. Values near 2³¹ make even a 3-row block overflow
    int64, forcing the slice-and-Python-int accumulation path."""
    import numpy as np

    from clusterforge_spark.operators.similarity import _exact_gram

    q = np.array(
        [
            [2**31, -(2**31) + 5],
            [2**31 - 7, 2**31 - 1],
            [-(2**31), 2**31 - 3],
        ],
        dtype=np.int64,
    )
    g = _exact_gram(np, q)
    expect = [
        [
            sum(int(q[r][i]) * int(q[r][j]) for r in range(3))
            for j in range(2)
        ]
        for i in range(2)
    ]
    assert [[int(g[i][j]) for j in range(2)] for i in range(2)] == expect
    assert any(abs(v) >= 2**63 for row in expect for v in row)


def test_hi_lo_split_roundtrip():
    """The hi/lo int64 transport recombines exactly for values beyond
    int64 in both signs (hi·2⁶² + lo with lo ∈ [0, 2⁶²))."""
    import numpy as np

    from clusterforge_spark.operators.similarity import _hi_lo

    vals = [0, 1, -1, 2**62 - 1, 2**62, -(2**62), 2**75 + 12345,
            -(2**75) - 12345, 3**40, -(3**40)]
    hi, lo = _hi_lo(np, vals)
    assert all(0 <= int(l) < 2**62 for l in lo)
    got = [int(h) * 2**62 + int(l) for h, l in zip(hi, lo)]
    assert got == vals


def test_gramian_with_moments_matches_direct(spark, embeddings):
    """The single-pass with_moments stats equal the separately computed
    Gramian / first-moment / count aggregates (per label)."""
    from clusterforge_spark.operators.similarity import (
        _gramian_partials,
        _split_stat_rows,
    )

    rows = _gramian_partials(embeddings, by_label=True, with_moments=True).collect()
    spp, s, n = _split_stat_rows(rows, with_label=True)
    plain = _gramian_partials(embeddings, by_label=True).collect()
    want_spp = {}
    for r in plain:
        want_spp.setdefault(int(r["label"]), {})[(int(r["i"]), int(r["j"]))] = int(
            r["spp"]
        )
    assert {k: dict(v) for k, v in spp.items()} == want_spp
    # first moments + counts against a plain SQL aggregate
    from pyspark.sql import functions as F

    ref = (
        embeddings.select(
            F.col("label").cast("long").alias("label"),
            F.posexplode("embedding").alias("dim", "v"),
        )
        .select(
            "label",
            "dim",
            F.expr("cast(floor(cast(v as double) * 1e6 + 0.5) as bigint) as vm"),
        )
        .groupBy("label", "dim")
        .agg(F.sum(F.expr("cast(vm as decimal(38,0))")).alias("s"))
        .collect()
    )
    for r in ref:
        assert s[int(r["label"])][int(r["dim"])] == int(r["s"])
    counts = {
        int(r["label"]): int(r["c"])
        for r in embeddings.groupBy(F.col("label").cast("long").alias("label"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert dict(n) == counts


def test_kcell_codebook_and_topk(spark, embeddings):
    """k-cell trained index invariants: ⌈√n⌉ non-empty cells (a seed is
    always a member of its own cell), every vector assigned to exactly
    one cell, top-k equals the brute-force rerank of its own candidate
    set, and recall is monotone non-decreasing in nprobe."""
    import math

    from clusterforge_spark.operators.similarity import (
        _assign_packed,
        _pack_cells,
        ann_recall,
        ivf_kcell_cells,
        ivf_kcell_topk,
    )

    n = embeddings.count()
    nc = int(math.ceil(math.sqrt(n)))
    cells = ivf_kcell_cells(embeddings, nc)
    got = cells.collect()
    assert len(got) == nc
    assert sorted(r["cell"] for r in got) == list(range(nc))
    assigned = _assign_packed(embeddings, _pack_cells(cells))
    assert assigned.count() == n
    top = ivf_kcell_topk(embeddings, k=5).collect()
    assert len(top) == 5
    sims = [r["cos_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)
    rec = {r["strategy"]: r for r in ann_recall(embeddings, k=5).collect()}
    p_keys = sorted(
        (k for k in rec if k.startswith("kcell_p")),
        key=lambda s: int(s.split("p")[-1]),
    )
    recalls = [rec[k]["recall"] for k in p_keys]
    fanouts = [rec[k]["fanout"] for k in p_keys]
    assert recalls == sorted(recalls)
    assert fanouts == sorted(fanouts)
    for k2 in rec:
        r = rec[k2]
        assert 0.0 <= r["recall"] <= 1.0 and 0.0 < r["fanout"] <= 1.0


def test_ivf_pq_codes_table_serve_path_row_identical(embeddings):
    """r12 (verdict item 2): serving ivf_pq_topk from the persisted
    cell-keyed codes table (pq_codes_table) returns row-identical
    results to the cold path that encodes candidates from the raw
    vectors — at every probe width, including cells the codes table
    partitions unevenly. Also pins the codes-table schema the registry
    artifact stores."""
    import math

    from clusterforge_spark.operators.similarity import (
        _assign_packed,
        _pack_cells,
        ivf_kcell_cells,
        ivf_pq_topk,
        pq_codes_table,
    )

    n = embeddings.count()
    cells = ivf_kcell_cells(embeddings, int(math.ceil(math.sqrt(n)))).cache()
    assigned = _assign_packed(embeddings, _pack_cells(cells)).select(
        "vec_id", "cell"
    )
    codes = pq_codes_table(embeddings, assigned).cache()
    assert codes.columns == ["vec_id", "cell"] + [
        f"code_{m}" for m in range(V.PQ_M)
    ]
    assert codes.count() == n  # every vector coded exactly once
    for nprobe in (1, 4, 8):
        cold = ivf_pq_topk(
            embeddings, k=10, nprobe=nprobe, cells=cells, assigned=assigned
        ).collect()
        warm = ivf_pq_topk(
            embeddings, k=10, nprobe=nprobe, cells=cells, codes=codes
        ).collect()
        assert [tuple(r) for r in warm] == [tuple(r) for r in cold]
    # the flat-PQ scan serves from the same artifact (r12): ADC over
    # the codes table + id-join rerank ≡ inline encode path
    from clusterforge_spark.operators.similarity import pq_topk

    flat_cold = pq_topk(embeddings, k=10).collect()
    flat_warm = pq_topk(embeddings, k=10, codes=codes).collect()
    assert [tuple(r) for r in flat_warm] == [tuple(r) for r in flat_cold]


def test_kcell_seeds_dedupe_duplicate_vectors(spark):
    """Duplicate embedding vectors among the KMV bottom-k seeds collapse
    to one cell each (lowest hash wins), so the refined codebook has
    exactly one NON-EMPTY cell per distinct seed vector — the invariant
    ivf_kcell_cells claims. Before the dedupe, a duplicated seed left
    its higher-indexed cell empty (assignment ties break to the lowest
    cell), silently shrinking the codebook below its sizing claim."""
    from clusterforge_spark.operators.similarity import (
        _assign_packed,
        _pack_cells,
        ivf_kcell_cells,
    )

    # 30 vectors but only 3 distinct values -> any bottom-6 KMV sample
    # must contain duplicates
    dup = spark.createDataFrame(
        [(i, [float(i % 3)] * 8) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    cells = ivf_kcell_cells(dup, 6).collect()
    assert len(cells) == 3  # one cell per DISTINCT seed vector
    assert sorted(r["cell"] for r in cells) == [0, 1, 2]  # renumbered dense
    n_nonempty = (
        _assign_packed(dup, _pack_cells(ivf_kcell_cells(dup, 6)))
        .select("cell")
        .distinct()
        .count()
    )
    assert n_nonempty == 3  # every cell is non-empty


def test_planted_clustered_corpus_and_frontier_bend(spark, embeddings):
    """The r7 ANN demonstration: on the planted-cluster corpus
    (deterministic md5-noise clusters around PLANT_G literal centers)
    the trained k-cell index concentrates the query's true neighbors
    into few cells — recall@10 = 1.0 at ONE probe (~6% fan-out at
    n=500; 2% at sf0.1 with three probes) — while the same index on the
    driver's isotropic corpus stays in the flat recall ≈ fan-out regime.
    Also pins the corpus itself bit-exact against the Python replica."""
    from clusterforge_spark.functions import vector as V
    from clusterforge_spark.operators.similarity import (
        ann_recall_dual,
        planted_clustered,
    )

    pc = planted_clustered(embeddings)
    got = list(pc.filter("vec_id = 7").collect()[0]["embedding"])
    assert got == V.py_planted_embedding(7)  # bit-exact, both op orders

    rows = ann_recall_dual(embeddings).collect()
    rec = {(r["corpus"], r["strategy"]): r for r in rows}
    clu_p1 = rec[("clustered", "kcell_p1")]
    iso_p1 = rec[("isotropic", "kcell_p1")]
    # the bend: one probe finds every true neighbor on clustered data...
    assert clu_p1["recall"] >= 0.9
    assert clu_p1["fanout"] <= 0.10
    # ...while the isotropic control stays recall ≈ fanout (the
    # documented degenerate regime — ~0.1 at the same fan-out)
    assert iso_p1["recall"] <= 0.3
    # recall is monotone in probe depth on both corpora
    for corpus in ("clustered", "isotropic"):
        ps = sorted(
            (k2 for c, k2 in rec if c == corpus and k2.startswith("kcell_p")),
            key=lambda s: int(s.split("p")[-1]),
        )
        recalls = [rec[(corpus, k2)]["recall"] for k2 in ps]
        assert recalls == sorted(recalls)


def test_kcell_incremental_serve(spark, embeddings):
    """Incremental ANN serving (r7): the new-vector batch derives
    bit-deterministically from the base corpus, is assigned to the
    EXISTING codebook without retraining, and the top-k over base ∪
    batch contains new vectors ranked by the same exact cosine as their
    perturbed parents (INCR_EPS noise ⇒ near-identical similarity)."""
    from clusterforge_spark.operators.similarity import (
        INCR_ID_OFFSET,
        INCR_MOD,
        ivf_kcell_cells,
        ivf_kcell_incremental_topk,
        ivf_kcell_topk,
        kcell_incremental_batch,
        _kcell_n_cells,
    )

    batch = kcell_incremental_batch(embeddings)
    n_batch = batch.count()
    n = embeddings.count()
    # md5 selection: ~1/INCR_MOD of the base, all ids offset
    assert 0 < n_batch < n
    assert abs(n_batch - n / INCR_MOD) < n * 0.05
    assert batch.filter(f"vec_id < {INCR_ID_OFFSET}").count() == 0

    cells = ivf_kcell_cells(embeddings, _kcell_n_cells(embeddings)).cache()
    inc = ivf_kcell_incremental_topk(embeddings, k=10, cells=cells).collect()
    assert len(inc) == 10
    sims = [r["cos_sim"] for r in inc]
    assert sims == sorted(sims, reverse=True)
    # the base-only top-k through the same codebook is a sub-multiset:
    # adding vectors can only displace, never change base scores
    base_top = {
        r["vec_id"]: r["cos_sim"]
        for r in ivf_kcell_topk(embeddings, k=10, cells=cells).collect()
    }
    for r in inc:
        if not r["is_new"]:
            assert base_top.get(r["vec_id"]) == r["cos_sim"]
    # a perturbed copy of a probed top vector enters the report whenever
    # its parent was selected by md5 — check flag consistency
    for r in inc:
        assert r["is_new"] == (r["vec_id"] >= INCR_ID_OFFSET)


def test_planted_corpus_bit_parity_sample(spark, embeddings):
    """Spark vs the Python replica across a spread of vec_ids (not just
    one): every coordinate of the synthesized clustered corpus is
    bit-identical — the property the DuckDB oracle's exactness rests
    on (same md5 → same integer → one IEEE divide/multiply/add)."""
    from clusterforge_spark.functions import vector as V
    from clusterforge_spark.operators.similarity import planted_clustered

    from pyspark.sql import functions as F

    ids = [0, 1, 7, 49, 50, 51, 123, 250, 333, 449]
    rows = {
        r["vec_id"]: list(r["embedding"])
        for r in planted_clustered(embeddings)
        .filter(F.col("vec_id").isin(ids))
        .collect()
    }
    assert set(rows) == set(ids)
    for i in ids:
        assert rows[i] == V.py_planted_embedding(i), f"vec_id {i}"


def test_ann_recall_batch_bend_replicates_across_queries(spark, embeddings):
    """r8 (verdict item 6): the clustered frontier bend must hold for
    BOTH query vectors — recall ≥0.9 at ≤10% fan-out from ONE probed
    cell on the planted corpus, per query — while the isotropic control
    stays fan-out-bound. 2 corpora × 2 queries × 5 strategies."""
    from clusterforge_spark.operators import similarity as SIM

    rows = SIM.ann_recall_batch_dual(embeddings).collect()
    assert len(rows) == 20
    by = {(r.corpus, r.query, r.strategy): r for r in rows}
    for qid in ("q1", "q2"):
        clu = by[("clustered", qid, "kcell_p1")]
        assert clu.recall >= 0.9, (qid, clu)
        assert clu.fanout <= 0.1, (qid, clu)
        iso = by[("isotropic", qid, "kcell_p1")]
        # isotropic: recall tracks fan-out (no geometry to exploit)
        assert iso.recall <= clu.recall
    # every (corpus, query) pair reports the full strategy ladder
    assert {k[2] for k in by} == {"ivf", "lsh", "kcell_p1", "kcell_p3", "kcell_p8"}


def test_dim_truncation_recall_ladder(spark, embeddings):
    """Truncation recall is monotone non-decreasing in d and exact at
    full dimension; on the isotropic corpus the low-d rungs must lose
    recall (the control regime the docstring documents)."""
    from clusterforge_spark.operators import similarity as SIM

    rows = {r.dim: r.recall for r in SIM.dim_truncation_recall(embeddings).collect()}
    assert set(rows) == set(SIM.DIM_TRUNC_LADDER)
    ladder = [rows[d] for d in sorted(rows)]
    assert ladder == sorted(ladder), f"recall not monotone: {rows}"
    assert rows[64] == 1.0
    assert rows[8] < 1.0, "isotropic corpus cannot keep full recall at d=8"


def test_dim_truncation_recall_materialized_matches_rescan(spark):
    """The size-gated ladder materialization (materialize_bytes=0 forces
    the localCheckpoint path a >8 MB source would take: shared score
    projection + k-row truth as ExistingRDD leaves) must be
    row-identical to the per-rung re-scan plan the small regime uses."""
    from clusterforge_spark.operators import similarity as SIM
    from clusterforge_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")  # uncached: real file scan
    base = sorted(map(tuple, SIM.dim_truncation_recall(emb).collect()))
    ckpt = sorted(
        map(tuple, SIM.dim_truncation_recall(emb, materialize_bytes=0).collect())
    )
    assert ckpt == base


def test_quantization_recall_materialized_matches_rescan(spark):
    """The size-gated kmax-list materialization (materialize_bytes=0
    forces the localCheckpoint path a >8 MB source would take) must be
    row-identical to the per-depth re-scan plan the small regime uses."""
    from clusterforge_spark.operators import similarity as SIM
    from clusterforge_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")  # uncached: real file scan
    base = sorted(map(tuple, SIM.quantization_recall(emb).collect()))
    ckpt = sorted(
        map(tuple, SIM.quantization_recall(emb, materialize_bytes=0).collect())
    )
    assert ckpt == base


def test_quantization_recall_exact_roundtrip_semantics(spark, embeddings):
    """int8 reconstruction keeps the top-k on this corpus (codes are
    exact and the affine error ≪ neighbor gaps); every depth reports
    overlap ≤ k and recall = overlap/k."""
    from clusterforge_spark.operators import similarity as SIM

    rows = SIM.quantization_recall(embeddings).collect()
    assert {r.k for r in rows} == set(SIM.QUANT_RECALL_KS)
    for r in rows:
        assert 0 <= r.n_overlap <= r.k
        assert r.recall == pytest.approx(r.n_overlap / r.k, abs=1e-4)
    assert all(r.recall == 1.0 for r in rows), rows
