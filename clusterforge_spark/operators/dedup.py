"""Deduplication operators for LLM training-data pipelines.

Five strategies, each the Spark-idiomatic shape of a standard technique:

* exact        — hash group-by on normalized text (one shuffle on text)
* minhash LSH  — MLlib MinHashLSH banded candidate join (the production
                 path at 100 TB: candidates ∝ near-dups, not n²)
* simhash      — 60-bit md5-vote fingerprint + banded hamming join
                 (oracle-checkable: md5 is cross-engine identical)
* n-gram Jaccard — exact shingle similarity on blocked candidate pairs
* embedding    — cosine near-dup on label-blocked pairs

The driver's synthetic corpus has no real duplicates, so the query layer
plants deterministic ones (:func:`docs_with_dups`) — exact copies and
last-token-dropped near copies — and each strategy must find them.

Scale posture: nothing here is O(n²) on the full corpus. Every pairwise
step is blocked (lang/source/band/label) so candidate sets stay bounded;
the blocked self-joins shuffle on the block key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clusterforge_spark.functions.rounding import round_det

from clusterforge_spark.functions import hashing as H
from clusterforge_spark.functions.partitioning import spread_partitions as _spread

#: id offsets for planted duplicates (documented part of query semantics)
EXACT_DUP_OFFSET = 10_000_000
NEAR_DUP_OFFSET = 20_000_000

#: per-strategy block-size caps: any block larger than the cap is
#: salt-split so no single task ever sees more than ~cap² candidate
#: pairs, regardless of corpus skew (one dominant lang/source/label).
#: Sized by per-pair cost: levenshtein pays an O(LEV_PREFIX²) DP per
#: pair, ngram an O(|shingles|) set intersect, embedding a d-wide dot.
NGRAM_BLOCK_CAP = 4096
LEV_BLOCK_CAP = 2048
EMB_BLOCK_CAP = 4096


def _salted_for_join(
    tbl: DataFrame,
    block_cols: list,
    id_col: str,
    cap: int,
    count_tbl: DataFrame | None = None,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Attach 2-D skew salting to one side of a blocked pair self-join.

    Every row gains ``_salt = xxhash64(id) mod _s`` and is replicated
    once per ``_probe ∈ [0, _s)``, where ``_s = ceil(block_size / cap)``
    per block. Joining on the original block keys PLUS
    ``a._salt == b._probe AND a._probe == b._salt`` splits a block of m
    rows into s² independent shuffle keys of (m/s)² ≤ cap² candidate
    pairs each, while every unordered pair still meets on EXACTLY one
    replica combination — the pair set (and thus the oracle result) is
    bit-identical to the unsalted join; only the shuffle layout changes.
    Cost: each side replicated s× within an oversized block — linear,
    versus the m² hot-task blow-up it prevents. For blocks under the cap
    s = 1 and the plan degenerates to the plain blocked join.

    Only OVERSIZED blocks (size > cap) enter the broadcast size table —
    rows whose block is absent default to ``_s = 1`` via a left join, so
    the broadcast carries exactly the hot blocks, which are few by
    definition (r9 review: the banded call site blocks on (band, key),
    where distinct keys ≈ BANDS × corpus rows — broadcasting ALL block
    sizes there would grow with the corpus and defeat the feature at
    the very scale it targets; the oversized subset stays metadata-sized
    at any corpus scale).

    ``count_tbl`` lets a caller whose probe key differs from its row key
    (the levenshtein adjacent-bucket probe) supply the block-size table
    computed over the *probed* table. ``counts`` lets a caller that
    already aggregated the block sizes (the r10 auto-engage profile in
    :func:`dedup_minhash_banded`) hand them over so the size table is
    not recomputed.
    """
    if counts is None:
        counts = (count_tbl if count_tbl is not None else tbl).groupBy(*block_cols).agg(
            F.count("*").alias("_m")
        )
    sizes = counts.filter(F.col("_m") > int(cap)).select(
        *block_cols,
        F.ceil(F.col("_m") / F.lit(int(cap))).cast("int").alias("_s"),
    )
    t = tbl.join(F.broadcast(sizes), list(block_cols), "left").withColumn(
        "_s", F.coalesce(F.col("_s"), F.lit(1))
    )
    return t.select(
        "*",
        F.pmod(F.xxhash64(F.col(id_col)), F.col("_s")).cast("int").alias("_salt"),
        F.explode(F.sequence(F.lit(0), F.col("_s") - 1)).alias("_probe"),
    )


def docs_with_dups(documents: DataFrame, n_exact: int = 100, n_near: int = 50) -> DataFrame:
    """documents ∪ exact copies of first ``n_exact`` ∪ near copies
    (last whitespace token dropped, single-space rejoined) of first
    ``n_near``. Copies keep lang/source/n_chars so blocking keys agree.
    """
    base = documents.select("doc_id", "text", "lang", "source", "n_chars")
    exact = base.filter(F.col("doc_id") < n_exact).select(
        (F.col("doc_id") + EXACT_DUP_OFFSET).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    toks = H.tokens_col("text")
    near = base.filter(F.col("doc_id") < n_near).select(
        (F.col("doc_id") + NEAR_DUP_OFFSET).alias("doc_id"),
        F.array_join(F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(1))), " ").alias(
            "text"
        ),
        "lang",
        "source",
        "n_chars",
    )
    return base.unionByName(exact).unionByName(near)


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup: one row per distinct text, keeping the smallest id.

    groupBy(text) is a single hash-aggregate shuffle; at 100 TB group on
    md5(text) instead of the full text to cut shuffle width (both shown:
    text_hash is the shuffle-friendly key).
    """
    return docs.groupBy(F.md5(F.lower(F.col("text"))).alias("text_hash")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").alias("n_dups"),
    )


def dedup_minhash_lsh(
    docs: DataFrame,
    num_hash_tables: int = 3,
    jaccard_dist_threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHashLSH candidate pairs (MLlib) — the 100 TB-scale near-dup path.

    shingles → HashingTF (2^18 sparse space) → MinHashLSH banded join.
    approxSimilarityJoin emits only same-band candidates, so cost tracks
    the number of true near-dups. Seeded (deterministic), but MLlib's
    internal hash family differs from any SQL engine → rows-only check.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    # 5-gram shingles: distinctive enough that band collisions track real
    # similarity (3-grams over a small vocabulary collide constantly and
    # blow up the candidate-pair count). Emptiness filter phrased on the
    # token count (≥ 5 tokens ⟺ non-empty shingle set): a filter on the
    # shingle expression itself gets pushed below the spread exchange and
    # re-evaluates the whole shingling on the unspread scan partition
    # (see shingle_hash_table).
    shingled = _spread(
        docs.select("doc_id", H.tokens_col("text").alias("t")).filter(
            F.size("t") >= 5
        ),
        "doc_id",
    ).select("doc_id", H.shingles_from_tokens("t", n=5).alias("shingles"))
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    # cache: approxSimilarityJoin references the featurized frame twice
    feats = tf.transform(shingled).cache()
    lsh = MinHashLSH(inputCol="features", outputCol="bands", numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, jaccard_dist_threshold, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            round_det(1.0 - F.col("jaccard_dist"), 6).alias("jaccard_sim"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )


def shingle_hash_table(docs: DataFrame, n: int = 3) -> DataFrame:
    """Cached ``(doc_id, lang, source, len_bucket, sh)`` shingle-hash table.

    One md5 per shingle up front, then every downstream pairwise step
    intersects fixed-width int64 sets instead of re-hashing shingle
    strings per pair (Jaccard over distinct hash sets equals Jaccard over
    shingle sets; md5 collisions are negligible; the oracle applies the
    same transformation).

    Shared by the ngram / banded-minhash strategies: they build this
    exact sub-plan, so Spark's CacheManager resolves all of them to one
    InMemoryRelation and the shingle hashing runs once per corpus per
    session — the standard "materialize the fingerprint table once" step.

    The emptiness filter is phrased on the *token count*
    (size(tokens) ≥ n ⟺ shingle set non-empty): Catalyst pushes filters
    below the spread exchange into each union branch of the input, and a
    filter referencing the md5-shingle expression re-evaluates that whole
    expression there, on the unspread scan partitions — measured 13 s vs
    1 s at sf0.1. The token-count predicate is cheap to evaluate anywhere
    and keeps the expensive projection above the exchange, on all cores.
    """
    # Tokenize BELOW the spread exchange (one split per doc) and build
    # shingles from the materialized token column ABOVE it: the inline
    # H.shingles_col form re-runs the whole tokenization once per
    # element_at inside the projection — invisible on ~60-token testdata
    # docs, quadratic on the 10k-token documents real corpora contain
    # (a 20k-token doc took minutes inline vs seconds materialized).
    pre = docs.select(
        "doc_id", "lang", "source", "n_chars", H.tokens_col("text").alias("t")
    ).filter(F.size("t") >= n)
    return (
        _spread(pre, "doc_id")
        .select(
            "doc_id",
            "lang",
            "source",
            F.expr("cast(floor(n_chars / 100) as bigint) as len_bucket"),
            H.shingle_hashes_from_tokens("t", n=n).alias("sh"),
        )
        .cache()
    )


def dedup_ngram_jaccard(
    docs: DataFrame, n: int = 3, threshold: float = 0.2, block_cap: int = NGRAM_BLOCK_CAP
) -> DataFrame:
    """Exact word-n-gram Jaccard over (lang, source)-blocked pairs.

    jaccard = |A∩B| / (|A|+|B|−|A∩B|) on distinct shingle sets. The
    blocked self-join shuffles on the block key only; pair count is
    Σ_block m², bounded by the block design, never n².

    Block key includes a length bucket: near-identical docs have
    near-identical lengths, so the bucket keeps true pairs together
    while cutting candidate count ~5× vs (lang, source) alone.

    Blocks larger than ``block_cap`` are 2-D salt-split
    (:func:`_salted_for_join`): a hot block (all-English web text in one
    len_bucket) lands on s² shuffle keys of ≤ cap² pairs instead of one
    m² task — same pair set, same oracle result, bounded task size.

    No broadcast hint on either pair side: the equi-keys give a blocked
    shuffle join that degrades gracefully at any scale, and AQE promotes
    it to a broadcast join at runtime when a side is actually small —
    an unconditional hint would OOM executors at 100 TB.
    """
    sh = shingle_hash_table(docs, n=n)
    blk = ["lang", "source", "len_bucket"]
    # cached like shingle_hash_table: both join sides resolve to one
    # InMemoryRelation, so the size-table broadcast + salt replication
    # runs once per corpus per session instead of once per side per query
    salted = _salted_for_join(sh, blk, "doc_id", block_cap).cache()
    a, b = salted.alias("a"), salted.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a._salt") == F.col("b._probe"))
            & (F.col("a._probe") == F.col("b._salt"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            round_det(inter.cast("double") / union, 6).alias("jaccard"),
        )
        # pairs are unique, so this aggregate is a semantic no-op — but it
        # is a pushdown barrier: without it Catalyst folds the threshold
        # filter into the join condition, re-evaluating the array
        # intersection several times per candidate pair (measured ~4×
        # slower); with it, jaccard is computed once in a codegen'd
        # projection and the tiny pair set shuffles once.
        .groupBy("doc_a", "doc_b")
        .agg(F.max("jaccard").alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """Per-doc 60-bit simhash (+ distinct-token count).

    Vectorized formulation: explode the token hashes and compute the 60
    per-bit vote counts as codegen'd SUM aggregates in one hash-aggregate
    pass (map-side partial agg — the shuffle carries one 60-counter row
    per doc, not the tokens). Bit j is set iff 2·Σ bit_j(h) > n, exactly
    the vote-sign condition Σ(2b−1) > 0 — same result as the per-row
    fold :func:`clusterforge_spark.functions.hashing.simhash_col`, several
    times faster (primitive codegen sums vs interpreted array folds).
    """
    hashed = _spread(docs, "doc_id").select(
        "doc_id", H.token_hashes_col("text").alias("th")
    )
    ex = hashed.select("doc_id", F.explode_outer("th").alias("h"))
    # expression strings, not call-by-call Column trees: the 60 vote sums
    # and the 60-term bit assembly cost ~2.4 s of py4j round-trips per
    # query when built one operation at a time (see hashing.tokens_col)
    sums = [
        F.expr(f"sum(shiftright(h, {j}) & 1) as c{j}")
        for j in range(H.SIMHASH_BITS)
    ]
    counts = ex.groupBy("doc_id").agg(F.expr("count(h) as n"), *sums)
    simhash = F.expr(
        " + ".join(
            f"IF(c{j} * 2 > n, {1 << j}L, 0L)" for j in range(H.SIMHASH_BITS)
        )
    )
    return counts.select(
        "doc_id",
        simhash.cast("long").alias("simhash"),
        F.col("n").cast("long").alias("n_distinct_tokens"),
    )


def simhash_table(docs: DataFrame) -> DataFrame:
    """Cached per-doc simhash fingerprint table (doc_id, simhash).

    Same pattern as :func:`shingle_hash_table`: repeated invocations in
    a session build the identical sub-plan, Spark's CacheManager
    resolves them to one InMemoryRelation, and the fingerprint
    aggregation runs once per corpus per session. Two longs per doc —
    the smallest table in the family.
    """
    return simhash_fingerprints(docs).select("doc_id", "simhash").cache()


def dedup_simhash(
    docs: DataFrame, max_hamming: int = 6, bands: int = 4, band_bits: int = 15
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance ≤ ``max_hamming``.

    Banded blocking: two hashes within hamming h < bands must agree on
    ≥1 of the ``bands`` disjoint 15-bit bands (pigeonhole) — the
    candidate join is on (band_idx, band_value), never all-pairs.

    Two-level structure (hash-group, then doc): the join, hamming
    computation, and band-collision dedup all run on DISTINCT simhash
    values (≤ #docs, typically far fewer on dup-heavy corpora), and doc
    pairs are produced last by expanding each hash-pair against the two
    groups' doc-id lists via broadcast. On a corpus with near-identical
    cliques this removes the pairwise ``distinct()`` over the (quadratic)
    output — the only quadratic step left is emitting the answer itself.
    Scale note: the per-hash doc-id list is linear in the largest clique;
    the output is quadratic in it, so the list is never the bottleneck.
    """
    fp = simhash_table(docs)
    # localCheckpoint(eager): the group table is referenced five times
    # below (intra pairs, both sides of the banded join, two expansion
    # joins); unmaterialized, each reference re-runs the 60-sum
    # fingerprint aggregate. Eager checkpoint materializes it ONCE and —
    # unlike .cache(), which pins executor storage until an explicit
    # unpersist the lazy return value makes impossible to place — its
    # blocks are released by the ContextCleaner as soon as the returned
    # DataFrame is garbage collected, so repeated invocations in a
    # long-lived session don't accrue storage memory.
    groups = (
        fp.groupBy("simhash")
        .agg(F.collect_list("doc_id").alias("ids"))
        .localCheckpoint(eager=True)
    )

    # (a) identical-hash cliques: hamming 0, every band trivially equal.
    intra = (
        groups.filter(F.size("ids") >= 2)
        .select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(0).cast("long").alias("hamming"))
    )

    # (b) distinct-hash pairs through the banded join.
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright("simhash", i * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("val"),
            )
            for i in range(bands)
        ]
    )
    banded = groups.select("simhash", F.explode(band_arr).alias("bv")).select(
        "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    hash_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.simhash") < F.col("b.simhash")),
        )
        .select(
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
            ham.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # hash-level: tiny vs the doc-pair set
    )
    # No broadcast hints on the expansion joins: on a low-duplication
    # corpus the distinct-hash group table is ~corpus-sized, and a forced
    # broadcast of it would OOM driver and executors at 100 TB. Plain
    # equi-joins let AQE broadcast at runtime only when the table is
    # actually small.
    inter = (
        hash_pairs.join(
            groups.select(F.col("simhash").alias("h_a"), F.col("ids").alias("ids_a")),
            "h_a",
        )
        .join(
            groups.select(F.col("simhash").alias("h_b"), F.col("ids").alias("ids_b")),
            "h_b",
        )
        .select(F.explode("ids_a").alias("da"), "ids_b", "hamming")
        .select("da", F.explode("ids_b").alias("db"), "hamming")
        # h_a != h_b ⇒ each doc pair appears exactly once; canonicalize order.
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "hamming",
        )
    )
    return intra.unionByName(inter)


def embs_with_dups(embeddings: DataFrame, n_copy: int = 100) -> DataFrame:
    """embeddings ∪ exact copies of the first ``n_copy`` vectors."""
    base = embeddings.select("vec_id", "embedding", "label")
    copies = base.filter(F.col("vec_id") < n_copy).select(
        (F.col("vec_id") + EXACT_DUP_OFFSET).alias("vec_id"), "embedding", "label"
    )
    return base.unionByName(copies)


def dedup_embedding_cosine(
    embs: DataFrame, threshold: float = 0.9, block_cap: int = EMB_BLOCK_CAP
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold within label blocks.

    Label blocking stands in for a coarse-quantizer bucket (IVF cell /
    LSH bucket) — the production pattern that keeps the pairwise stage
    off the full cross product.

    Within a block the all-pairs cosine runs as a vectorized numpy batch
    per block (`applyInPandas`, Arrow transfer) — the FAISS-style
    "dense math inside the cell" layout. A DataFrame self-join emits the
    m² pair rows through a shuffle whose byte size AQE sees as tiny, so
    the interpreted 64-wide fold runs on 1-2 coalesced tasks (measured
    7.1 s at sf0.1); the pandas form moves only the m vectors per block
    and parallelizes across blocks (0.9 s). Numerics match the SQL
    oracle bit-for-bit: the dot/norm accumulate in index order (the same
    left-to-right fold), f32→f64 widening before multiply, and the
    deterministic floor-rounding — all IEEE-identical in numpy.
    Zero-norm vectors yield NaN cosine and are dropped (no such vectors
    in the corpus; Spark's NaN-is-largest comparison would instead keep
    them).

    Skew bound: a label block of m > ``block_cap`` vectors is split into
    s = ceil(m/cap) deterministic sub-blocks by ``xxhash64(vec_id) mod
    s``; each unordered sub-block pair (gi ≤ gj) becomes its own pandas
    group holding only the two sub-blocks' vectors, so per-task memory
    is O((m/s)·d + (m/s)²) ≤ O(cap²) no matter how dominant one label
    is. Every vector pair lands in exactly one (gi, gj) group, so the
    pair set — and the oracle result — is identical to the unsalted
    form; blocks under the cap keep s = 1 and the single-group layout.
    """
    import numpy as np
    import pandas as pd

    thr = float(threshold)

    def _block_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cos_sim": pd.Series([], dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        m, d = mat.shape
        # norms and dots accumulate over k in index order: ((0+t0)+t1)+…,
        # the exact association of the Spark fold and the oracle's
        # explicit sum chain (0.0+t0 vs t0 only flips a zero's sign,
        # collapsed by the floor-rounding).
        acc = np.zeros(m)
        for k in range(d):
            acc = acc + mat[:, k] * mat[:, k]
        norms = np.sqrt(acc)
        gi = int(pdf["_gi"].iloc[0])
        gj = int(pdf["_gj"].iloc[0])
        if gi == gj:
            ii, jj = np.triu_indices(m, 1)
        else:
            # cross pairs between the two sub-blocks; ids are disjoint
            # and output is ordered (min, max) below
            sa = (pdf["_salt"].to_numpy() == gi).nonzero()[0]
            sb = (pdf["_salt"].to_numpy() == gj).nonzero()[0]
            if len(sa) == 0 or len(sb) == 0:
                return empty
            ii = np.repeat(sa, len(sb))
            jj = np.tile(sb, len(sa))
        dot = np.zeros(len(ii))
        for k in range(d):
            dot = dot + mat[ii, k] * mat[jj, k]
        cos = dot / (norms[ii] * norms[jj])
        # round_det: floor(x·1e6 + 0.5)/1e6, bit-identical across engines
        cos_r = np.floor(cos * 1e6 + 0.5) / 1e6
        keep = cos_r >= thr
        if not keep.any():
            return empty
        va, vb = ids[ii[keep]], ids[jj[keep]]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(va, vb).astype("int64"),
                "vec_b": np.maximum(va, vb).astype("int64"),
                "cos_sim": cos_r[keep],
            }
        )

    exploded = _emb_salted_groups(embs, block_cap)
    return exploded.groupBy("label", "_gi", "_gj").applyInPandas(
        _block_pairs, schema="vec_a long, vec_b long, cos_sim double"
    )


def _emb_salted_groups(embs: DataFrame, block_cap: int) -> DataFrame:
    """Sub-block-pair group assignment for :func:`dedup_embedding_cosine`.

    A vector with salt p (of s = ceil(block_size/cap) sub-blocks) joins
    groups {(i, p): i ≤ p} ∪ {(p, j): j > p} — s groups per vector; each
    unordered vector pair is covered by exactly one (gi, gj) group.
    """
    counts = embs.groupBy("label").agg(F.count("*").alias("_m"))
    sizes = counts.select(
        "label",
        F.greatest(F.lit(1), F.ceil(F.col("_m") / F.lit(int(block_cap))))
        .cast("int")
        .alias("_s"),
    )
    e = embs.select("vec_id", "label", "embedding").join(F.broadcast(sizes), "label")
    salt = F.pmod(F.xxhash64("vec_id"), F.col("_s")).cast("int")
    groups = F.expr(
        "concat("
        " transform(sequence(0, _salt), i -> struct(i as gi, _salt as gj)),"
        " IF(_salt + 1 <= _s - 1,"
        "    transform(sequence(_salt + 1, _s - 1), j -> struct(_salt as gi, j as gj)),"
        "    array()))"
    )
    return (
        e.withColumn("_salt", salt)
        .select("vec_id", "label", "embedding", "_salt", F.explode(groups).alias("_g"))
        .select(
            "vec_id",
            "label",
            "embedding",
            "_salt",
            F.col("_g.gi").alias("_gi"),
            F.col("_g.gj").alias("_gj"),
        )
    )


def dedup_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over near-dup pairs — the transitive-closure
    step a real dedup pipeline needs before choosing canonical docs
    (A≈B and B≈C must land in one group even when A≈C was never a
    candidate pair).

    Iterative min-label propagation: every vertex starts labeled with its
    own id; each round every vertex takes the min of its own and its
    neighbors' labels; fixpoint = component id = min doc_id in the
    component (deterministic). Rounds needed = graph diameter — tiny for
    dup clusters (near-clique). Each round is one join + one min-agg,
    both shuffling on the vertex key only; the per-round convergence
    check is a count (cheap action). If the loop exhausts ``max_iter``
    without reaching the fixpoint (diameter > max_iter — an adversarial
    chain rather than a dup near-clique), it hands off to
    :func:`dedup_components_star` (same primitive ops, O(log n) rounds)
    instead of returning silently-fragmented components; labels are
    localCheckpointed every few rounds to truncate the growing lineage
    either way.

    Output: (doc_id, component, component_size) for every doc that
    appears in at least one pair.
    """
    # the pair set is tiny (∝ dup clusters) but its LINEAGE is the whole
    # shingle/minhash pipeline — checkpoint it eagerly so every loop
    # round's plan (and the consumers' plans, e.g. dedup_canonical)
    # starts from a small materialized RDD instead of re-analyzing the
    # full candidate-generation tree per cache lookup
    pairs = pairs.localCheckpoint(eager=True)
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    # pre-partition on the join key: every round's edges⋈labels join (and
    # the init groupBy) then reuses this one exchange — the cached edges
    # never re-shuffle inside the loop
    edges = fwd.unionByName(rev).repartition("src").cache()
    # initialization already folds one propagation step without a join:
    # lbl₀(v) = min(v, min direct neighbor). Dup clusters are near-stars
    # around their min-id member, so most components are exact at lbl₀
    # and the loop usually runs a single confirming round.
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("m"))
        .select(F.col("src").alias("v"), F.least("src", "m").alias("lbl"))
    ).cache()
    # Σlbl₀ up front: when lbl₀ is already the fixpoint (the common
    # near-star case) the loop exits after ONE confirming round instead
    # of two — labels only decrease, so equal sums ⇔ no change.
    # decimal(38,0) sum: exact and order-independent like BIGINT, but
    # does not hit ANSI ARITHMETIC_OVERFLOW when labels are 64-bit
    # hashed doc ids (n·2⁶³ ≫ BIGINT range, < 10³⁸ for any real corpus).
    _lbl_sum = F.sum(F.col("lbl").cast("decimal(38,0)"))
    prev_sum = labels.agg(_lbl_sum).collect()[0][0]
    converged = False
    for it in range(max_iter):
        nbr = edges.join(labels, edges.src == labels.v).select(
            F.col("dst").alias("v"), F.col("lbl")
        )
        new_labels = (
            labels.unionByName(nbr).groupBy("v").agg(F.min("lbl").alias("lbl"))
        )
        if (it + 1) % 3 == 0:
            # truncate lineage: each round otherwise stacks a join+agg on
            # the previous round's plan
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.cache()
        # convergence: labels only ever decrease (lbl' = min(lbl, nbrs)),
        # so Σlbl is strictly monotone until the fixpoint — one scalar
        # agg per round instead of a change-detection join
        new_sum = new_labels.agg(_lbl_sum).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # diameter > max_iter (an adversarial chain, not a dup
        # near-clique): returning the unconverged labels would be
        # SILENTLY WRONG (fragmented components). Hand off to the
        # O(log n)-round star algorithm instead of failing or looping
        # linearly in the diameter.
        labels.unpersist()
        edges.unpersist()
        return dedup_components_star(pairs)
    comp = labels.select(F.col("v").alias("doc_id"), F.col("lbl").alias("component"))
    sizes = comp.groupBy("component").agg(
        F.count("*").cast("long").alias("component_size")
    )
    edges.unpersist()
    return comp.join(sizes, "component").select("doc_id", "component", "component_size")


def dedup_components_star(pairs: DataFrame, max_iter: int = 50) -> DataFrame:
    """Connected components via alternating large-star / small-star —
    the O(log n)-round algorithm (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SOCC'14) for graphs whose diameter is NOT
    tiny.

    :func:`dedup_components`' min-label propagation needs diameter-many
    rounds — perfect for near-clique dup clusters, quadratic-time for an
    adversarial chain (A≈B≈C≈…≈Z from a sliding near-dup window over a
    template family). Star operations instead contract toward each
    node's minimum in logarithmically many rounds:

    * large-star: every node points its LARGER neighbors at the minimum
      of its closed neighborhood — edge (v, m(u)) for v ∈ N(u), v > u,
      with m(u) = min(N(u) ∪ {u}).
    * small-star: every node points its smaller-or-equal neighbors (and
      itself) at its minimum smaller neighbor.

    Both are one groupBy(min) + one join per round, shuffling on the
    node key only — the same primitives as the propagation loop, so the
    same 100 TB posture. Convergence = the small-star edge set is a
    fixpoint (every edge already (v → its component min)); checked with
    a scalar (count, Σa, Σb) signature, one cheap action per round.

    Output contract identical to :func:`dedup_components`:
    (doc_id, component, component_size), component = min doc_id — the
    two algorithms are interchangeable and tested equivalent.
    """
    pairs = pairs.localCheckpoint(eager=True)
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )

    def _signature(e: DataFrame) -> tuple:
        # (count, XOR of xxhash64(a,b), min a, max a): a set-level
        # fingerprint strong enough that two consecutive DISTINCT edge
        # sets matching on all four while differing is not a practical
        # concern. XOR-of-hashes instead of Σa·b: with 64-bit doc ids
        # (any id ≥ 2³²) the product overflows BIGINT and aborts the job
        # under Spark 4's ANSI default; XOR is overflow-free, exact, and
        # order-independent (safe under distributed aggregation order).
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("a", "b")).alias("hx"),
            F.min("a").alias("mn"),
            F.max("a").alias("mx"),
        ).collect()[0]
        return (r.n, r.hx, r.mn, r.mx)

    sig = _signature(edges)
    for it in range(max_iter):
        # large-star: symmetric neighborhoods
        sym = edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = (
            sym.groupBy("a")
            .agg(F.min("b").alias("mn"))
            .select(F.col("a").alias("u"), F.least("a", "mn").alias("m"))
        )
        large = (
            sym.join(mins, sym.a == mins.u)
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star: orient high → low, point the low side (and the hub)
        # at the hub's minimum neighbor
        dird = large.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        smins = dird.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            dird.join(smins, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(smins.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # eager checkpoint (not .cache()): materializes this round's edge
        # set once — the signature action and next round both read the
        # stored blocks — and, unlike cache(), the blocks are released by
        # the ContextCleaner as soon as the round's frame is garbage
        # collected, so storage memory does NOT accrue one pinned frame
        # per star round (or across invocations in a long-lived session).
        small = small.localCheckpoint(eager=True)
        new_sig = _signature(small)
        edges = small
        if new_sig == sig:
            break
        sig = new_sig
    # fixpoint edges are (node → component min); add the centers
    comp = (
        edges.select(F.col("a").alias("doc_id"), F.col("b").alias("component"))
        .unionByName(
            edges.select(F.col("b").alias("doc_id"), F.col("b").alias("component"))
        )
        .groupBy("doc_id")
        .agg(F.min("component").alias("component"))
    )
    sizes = comp.groupBy("component").agg(
        F.count("*").cast("long").alias("component_size")
    )
    return comp.join(sizes, "component").select("doc_id", "component", "component_size")


#: banded-minhash derivation defaults, exposed as constants so the
#: artifact registry can fingerprint the graph tables on the ACTUAL
#: parameters they were built with (r8 review finding: a parameter
#: change must invalidate persisted components/pagerank/k-core)
BANDED_SHINGLE_N = 3
BANDED_JACCARD_THRESHOLD = 0.2


#: r10 auto-engage profile for the banded bucket join: a (band, key)
#: bucket of m docs puts m²/2 candidate pairs on ONE shuffle task per
#: band. Engage the 2-D salting once any bucket exceeds this — 2048²/2
#: ≈ 2M pairs is the largest single-task verify load the r9 stress saw
#: absorbed comfortably (the 2,250-doc / ~2.5M-pair 50× cluster ran
#: 11.9 s total), while the 4,500-doc / ~10M-pair 100× cluster turned
#: the unsalted join into a 53 s straggler that salting cut to 23.8 s.
#: Normal corpora never approach it: max bucket is 4-5 docs at
#: sf0.01/sf0.1 (measured r10), so auto stays on the plain plan there.
#: SCALE.md's "~10⁴ members" rule is the must-engage bound; engaging
#: from 2048 is safe because the salted pair set is bit-identical and
#: split tasks only help.
AUTO_BUCKET_ENGAGE = 2048
#: per-session memo of the auto-salting profile probe, keyed
#: (applicationId, semanticHash of the canonical banded plan) — see
#: _banded_core; holds one int per distinct corpus/param combination
_PROFILE_MEMO: dict = {}
#: salt width used when auto engages — the measured-good value from the
#: r9 100× sweep (cap 512 → ceil(4500/512)² = 81 balanced shuffle keys,
#: 53.0 s → 23.8 s)
AUTO_BUCKET_CAP = 512


def dedup_minhash_banded(
    docs: DataFrame,
    n: int = BANDED_SHINGLE_N,
    threshold: float = BANDED_JACCARD_THRESHOLD,
    bucket_cap: int | None | str = "auto",
) -> DataFrame:
    """Native banded MinHash-LSH near-dup detection (oracle-checkable).

    The full pipeline — shingle → k-permutation minhash signature → band
    → bucket-join → exact Jaccard verify — in pure int64/md5 arithmetic
    identical across engines (unlike the MLlib variant, whose internal
    hash family is JVM-private). Candidates are pairs agreeing on ≥1 of
    the 4 three-row bands; each candidate is verified with the exact
    shingle-set Jaccard, so the output has no false positives, and false
    negatives only for pairs missed by every band (P(miss) = (1−j³)⁴).
    Per-band bucket joins shuffle on the bucket key only — never n².

    Hot-bucket bound (r9, measured): a cluster of m near-identical docs
    (template pages) shares whole band signatures, so its candidate set
    is inherently Ω(m²) — at a 2,250-doc planted template cluster inside
    a 250k-doc corpus (50× skew stress, SCALE.md r9 table) the verify
    join absorbs the ~2.5M hot-bucket pairs at 11.9 s total, cold ratio
    2.7× vs 1×. One band-key is one shuffle partition, so clusters above
    ~10⁴ members make the verify join's hot task the straggler (100×
    stress: 4,500-doc cluster → 53.0 s unsalted, 23.8 s salted).

    Salting decision (r10: automatic). ``bucket_cap="auto"`` (the
    default) profiles the banded table itself — the table is cached and
    one ``groupBy(band, key).count()`` max is taken (the same
    adaptive-regime probe pattern as token_budget_mix's fill switch) —
    and 2-D-salts the bucket join (:func:`_salted_for_join` — pair set
    bit-identical, a hot bucket of m docs splits into ceil(m/cap)²
    balanced shuffle keys, cap ``AUTO_BUCKET_CAP``) only when some
    bucket exceeds ``AUTO_BUCKET_ENGAGE``. On uniform corpora (max
    bucket 4-5 docs at sf0.01/sf0.1) the profile says no and the
    returned plan is the plain bucket join — salt-free, no size-agg
    stage beyond the one eager profile pass, which itself populates the
    banded cache the join then reuses. When the profile engages, its
    counts are handed to :func:`_salted_for_join` so bucket sizes are
    aggregated exactly once. ``bucket_cap=None`` forces the plain join;
    an int forces salting at that cap (the oracle-gated
    q_dedup_minhash_banded_salted contract form) — both bypass the
    profile entirely.

    Mega-cluster routing (r11: automatic). Byte-identical texts are
    collapsed to one REPRESENTATIVE (min doc_id per md5(text) — one
    hash aggregate, dedup_exact's shuffle shape) *before* shingling;
    the whole shingle→minhash→band→verify pipeline runs on
    representatives only, and group membership is expanded back at the
    end: within-group pairs are emitted directly at jaccard 1.0 (their
    exact value — identical texts have identical shingle sets), and a
    cross-group representative pair (r1, r2, j) fans out to every
    (x, y) member pair with the SAME j (jaccard depends only on the
    texts). Byte-identical pairs always agree on every band, so the
    expansion is row-identical to the uncollapsed pipeline — but a
    mega-cluster of m IDENTICAL docs (the >10⁵-member routing case
    SCALE.md used to leave to the operator) now contributes m rows to
    the banded/verify joins instead of Ω(m²) hot-bucket pairs; only the
    final pair OUTPUT is m²/2 rows, generated by one group-keyed
    self-join with no shingle arrays attached. Near-identical (not
    byte-identical) template clusters keep the auto-salted path.

    Reuses :func:`shingle_hash_table` (same cached sub-plan as the ngram
    strategy — the md5 shingle hashing runs once per corpus per session).
    """
    rep_pairs, mem, sh = _banded_core(docs, n=n, bucket_cap=bucket_cap)
    # expand representative pairs to every member pair (same jaccard —
    # it depends only on the texts), plus within-group pairs at their
    # exact value 1.0; restrict within-groups to reps that survived the
    # shingle emptiness filter, exactly like the uncollapsed pipeline.
    # r12 (verdict item 5): the expansion machinery touches MULTI-MEMBER
    # groups only — singleton reps (the overwhelming majority on a
    # low-dup corpus) pass through the LEFT joins unmatched, and the
    # _gm ≥ 2 filter pushes into the membership join so its build side
    # is the multi-group slice, not the corpus (AQE broadcasts it at
    # runtime when it fits — no hints, same policy as the verify join).
    # This removed the flat ~0.5 s the r11 collapse had added to the
    # sf0.1 headline on corpora where byte dups are rare.
    mm_small = mem.filter(F.col("_gm") >= 2)
    ma = mm_small.select(
        F.col("_rep").alias("doc_a"), F.col("doc_id").alias("_xa")
    )
    mb = mm_small.select(
        F.col("_rep").alias("doc_b"), F.col("doc_id").alias("_xb")
    )
    cross = (
        rep_pairs.join(ma, "doc_a", "left")
        .join(mb, "doc_b", "left")
        .select(
            F.least(
                F.coalesce(F.col("_xa"), F.col("doc_a")),
                F.coalesce(F.col("_xb"), F.col("doc_b")),
            ).alias("doc_a"),
            F.greatest(
                F.coalesce(F.col("_xa"), F.col("doc_a")),
                F.coalesce(F.col("_xb"), F.col("doc_b")),
            ).alias("doc_b"),
            "jaccard",
        )
    )
    mm = mm_small.join(
        sh.select(F.col("doc_id").alias("_rep")), "_rep", "semi"
    ).select("doc_id", "_g")
    wa, wb = mm.alias("wa"), mm.alias("wb")
    within = wa.join(
        wb,
        (F.col("wa._g") == F.col("wb._g"))
        & (F.col("wa.doc_id") < F.col("wb.doc_id")),
    ).select(
        F.col("wa.doc_id").alias("doc_a"),
        F.col("wb.doc_id").alias("doc_b"),
        F.lit(1.0).alias("jaccard"),
    )
    return cross.unionByName(within).filter(F.col("jaccard") >= threshold)


def _banded_core(
    docs: DataFrame,
    n: int = BANDED_SHINGLE_N,
    bucket_cap: int | None | str = "auto",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The collapsed core of :func:`dedup_minhash_banded`: byte-identical
    collapse -> shingle -> minhash -> band -> (auto-salted) bucket join
    -> exact-Jaccard verify, over REPRESENTATIVES only. Returns
    ``(rep_pairs, mem, sh)`` — the unthresholded verified representative
    pairs, the (doc_id, _g, _rep, _gm) membership table (``_gm`` = group
    size, so consumers can contract their joins to the multi-member
    slice), and the reps-only shingle table. Shared by the pair
    expansion above, the expansion-free grouped components
    (:func:`dedup_components_grouped`) and the grouped analytics family
    (:func:`_rep_graph`)."""
    grp = docs.groupBy(F.md5(F.col("text")).alias("_g")).agg(
        F.min("doc_id").alias("_rep"),
        F.count(F.lit(1)).cast("long").alias("_gm"),
    )
    # membership WITHOUT a full-corpus shuffle join (r12): only
    # multi-member groups carry information — a singleton's rep is
    # itself and its size is 1 — so mem is docs left-joined against the
    # MULTI slice of grp (tiny on a low-dup corpus, AQE broadcasts it)
    # with coalesce defaults, not docs joined against all of grp. The
    # one unavoidable corpus shuffle is grp's own aggregate; everything
    # downstream of it is map-side.
    multi = grp.filter(F.col("_gm") >= 2)
    # cached like the shingle table (once per corpus per session — the
    # canonicalized plan is identical across calls, so CacheManager
    # shares one InMemoryRelation): the expansion joins, the reps anti
    # join, and the grouped consumers reference mem 3-4× per call, and
    # each uncached reference re-ran the md5 projection + membership
    # join (~0.4 s at sf0.1 — r12 optimization round: warm banded
    # 2.5 → ~1.1 s). Narrow corpus-sized columns; spills if large.
    mem = (
        docs.select("doc_id", F.md5(F.col("text")).alias("_g"))
        .join(multi, "_g", "left")
        .select(
            "doc_id",
            "_g",
            F.coalesce(F.col("_rep"), F.col("doc_id")).alias("_rep"),
            F.coalesce(F.col("_gm"), F.lit(1)).cast("long").alias("_gm"),
        )
        .cache()
    )  # (doc_id, _g, _rep, _gm)
    # reps = everything except the non-rep members of multi-member
    # groups — the anti side is the multi-group slice, broadcastable
    reps = docs.join(
        mem.filter(
            (F.col("_gm") >= 2) & (F.col("doc_id") != F.col("_rep"))
        ).select("doc_id"),
        "doc_id",
        "anti",
    )
    sh = shingle_hash_table(reps, n=n).select("doc_id", "sh")
    sig = sh.select("doc_id", H.minhash_signature_col("sh").alias("sig"))
    banded = sig.select(
        "doc_id", F.explode(H.band_keys_col("sig")).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    join_on = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    if isinstance(bucket_cap, str) and bucket_cap != "auto":
        raise ValueError(
            f"bucket_cap must be 'auto', None, or an int — got {bucket_cap!r}"
        )
    cap, counts = bucket_cap, None
    if bucket_cap == "auto":  # profile, then decide
        # the banded cache is deliberately RETAINED for the session: the
        # profile's one-pass materialization is reused by the bucket
        # join, and repeated calls on the same corpus (contract pairs +
        # graph consumers) resolve to the same InMemoryRelation
        banded = banded.cache()
        # the profile PROBE (bucket-size max) is memoized per
        # (session, canonical banded plan): the decision is a
        # deterministic function of the corpus snapshot, and the eager
        # .first() was re-aggregating ~2M cached banded rows on EVERY
        # call — ~0.6-0.9 s of the warm per-call time at sf0.1 (r12
        # optimization round). Keyed by semanticHash, so a different
        # corpus/params plan never reuses a stale decision; release of
        # the session drops the memo with the JVM.
        key = (
            banded.sparkSession.sparkContext.applicationId,
            banded._jdf.queryExecution().analyzed().semanticHash(),
        )
        max_m = _PROFILE_MEMO.get(key)
        if max_m is None:
            max_m = (
                banded.groupBy("band", "key")
                .agg(F.count("*").alias("_m"))
                .agg(F.max("_m"))
                .first()[0]
                or 0
            )
            _PROFILE_MEMO[key] = max_m
        cap = AUTO_BUCKET_CAP if max_m > AUTO_BUCKET_ENGAGE else None
        if cap is not None:
            counts = banded.groupBy("band", "key").agg(F.count("*").alias("_m"))
    if cap is not None:
        # hot-bucket escape hatch: an oversized (band, key) bucket of m
        # docs splits into ceil(m/cap)² balanced shuffle keys; every
        # unordered pair still meets on exactly one replica combination,
        # so the candidate set — and the verified output — is identical
        banded = _salted_for_join(banded, ["band", "key"], "doc_id", cap, counts=counts)
        join_on = (
            join_on
            & (F.col("a._salt") == F.col("b._probe"))
            & (F.col("a._probe") == F.col("b._salt"))
        )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, join_on)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    # No broadcast hints: the verify joins are plain equi-joins; AQE
    # broadcasts the (tiny) candidate side at runtime when it fits, and
    # at 100 TB they degrade to shuffle joins instead of OOMing on a
    # full-shingle-table broadcast.
    rep_pairs = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            round_det(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.max("jaccard").alias("jaccard"))
    )
    return rep_pairs, mem, sh


def dedup_components_grouped(
    docs: DataFrame,
    n: int = BANDED_SHINGLE_N,
    threshold: float = BANDED_JACCARD_THRESHOLD,
    max_iter: int = 20,
) -> DataFrame:
    """Connected components of the banded near-dup graph computed
    WITHOUT materializing the expanded pair set — row-identical to
    ``dedup_components(dedup_minhash_banded(docs))`` by construction
    (it shares q_dedup_components' oracle SQL, the components_star
    contract-sharing pattern), but the propagation runs on the
    REPRESENTATIVE graph.

    Why this exists (r11): the pair-output contract is inherently
    Ω(m²) for an m-doc byte-identical cluster (every within pair is a
    real near-dup pair), so components built FROM the pair table pay
    m²/2 edge rows per mega-cluster even after the r11 collapse routes
    them around the banded join. Connectivity, however, is preserved
    under the collapse: a group is internally connected through its
    representative, a component's label (min reachable doc_id) equals
    the min reachable REP (each rep is its group's min doc_id), and
    group membership is component-invariant. So: run min-label
    propagation over the rep pairs (plus one self-edge per isolated
    multi-member group, so an exact-dup clique with no cross-group
    near-dups still surfaces as a component), then expand membership
    with ONE join and recount sizes — an m-doc identical cluster costs
    m rows end to end, never m².

    At 100 TB this is the shape a curation pipeline should consume for
    canonical selection: the pair table remains available (audit,
    scoring), but transitive grouping never touches it."""
    rep_pairs, mem, sh = _banded_core(docs, n=n)
    edges = rep_pairs.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b")
    if threshold <= 1.0:
        # isolated exact-dup cliques: a multi-member group whose rep
        # survived the shingle filter is a component even with no
        # cross-group pairs (its within pairs are jaccard 1.0); the
        # rep-level self-edge stands in for the whole clique
        multi = (
            mem.groupBy("_rep")
            .agg(F.count("*").alias("_m"))
            .filter(F.col("_m") >= 2)
            .join(sh.select(F.col("doc_id").alias("_rep")), "_rep", "semi")
            .select(
                F.col("_rep").alias("doc_a"), F.col("_rep").alias("doc_b")
            )
        )
        edges = edges.unionByName(multi)
    rep_comp = dedup_components(edges, max_iter=max_iter).select(
        F.col("doc_id").alias("_rep"), "component"
    )
    out = mem.join(rep_comp, "_rep").select("doc_id", "component")
    sizes = out.groupBy("component").agg(
        F.count("*").cast("long").alias("component_size")
    )
    return out.join(sizes, "component").select(
        "doc_id", "component", "component_size"
    )


PR_DAMPING = 0.85
PR_ITERS = 3

KCORE_K = 2
KCORE_ROUNDS = 4


def _rep_graph(
    docs: DataFrame,
    n: int = BANDED_SHINGLE_N,
    threshold: float = BANDED_JACCARD_THRESHOLD,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The multiplicity-weighted REPRESENTATIVE graph of the banded
    near-dup pair graph (r12 — extending the r11 grouped-components win
    to the whole analytics family): returns ``(groups, edges, mem)``
    where ``groups`` is one row per byte-identical group that appears
    in the expanded pair graph — ``(_rep, m, w)`` with ``m`` the member
    count and ``w`` 1 iff the group's within-clique pairs exist (m ≥ 2,
    rep survived the shingle filter, threshold admits jaccard 1.0) —
    ``edges`` the verified cross-group representative pairs, and
    ``mem`` the full ``(doc_id, _g, _rep)`` membership table.

    The expanded pair graph is exactly the BLOW-UP of this graph: each
    group is an m-clique (when ``w``), each rep edge a complete
    bipartite K(m_a, m_b) — every member of a group is a structural
    twin of its siblings. Statistics that are functions of the
    quotient-plus-multiplicities (degrees, fixed-round peeling,
    PageRank, triangle counts) can therefore be computed here and
    expanded, paying O(m) per byte-identical mega-cluster instead of
    the pair table's Ω(m²) edge rows."""
    rep_pairs, mem, sh = _banded_core(docs, n=n)
    # both tables are consumed by several branches of every grouped
    # statistic (degrees, peel rounds, the three triangle terms) — and
    # each is SMALL (one row per verified rep pair / per touched group,
    # i.e. bounded by the dedup output, not the corpus), so materialize
    # them EAGERLY with a truncated plan (localCheckpoint, not cache):
    # without materialization the whole shingle→band→verify DAG
    # re-evaluates once per branch (measured 7× on the closed-form
    # triangle count at sf0.1); and with a plain .cache() every
    # consumer's LOGICAL plan still embeds the full banded lineage once
    # per reference — the triangle count references edges 3× and groups
    # 4×, giving a 5.8 MB physical plan whose driver-side
    # analysis/optimization alone cost ~3 s per call at sf0.1
    # (r12 optimization round: 3.78 s → sub-0.2 s after truncation).
    # localCheckpoint stores the same rows (memory+disk blocks) but the
    # consumers' plans start from a LogicalRDD leaf.
    edges = (
        rep_pairs.filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    sizes = mem.groupBy("_rep").agg(F.count(F.lit(1)).cast("long").alias("m"))
    grp = sizes.join(
        sh.select(F.col("doc_id").alias("_rep")), "_rep", "semi"
    ).withColumn(
        "w",
        ((F.col("m") >= 2) & F.lit(bool(threshold <= 1.0))).cast("long"),
    )
    # groups present in the expanded graph: within pairs, or ≥1 cross edge
    touched = (
        edges.select(F.col("doc_a").alias("_rep"))
        .unionByName(edges.select(F.col("doc_b").alias("_rep")))
        .distinct()
        .withColumn("_t", F.lit(1))
    )
    groups = (
        grp.join(touched, "_rep", "left")
        .filter((F.col("w") == 1) | F.col("_t").isNotNull())
        .select("_rep", "m", "w")
        .localCheckpoint(eager=True)
    )
    return groups, edges, mem


def _rep_degrees(groups: DataFrame, edges: DataFrame) -> DataFrame:
    """Member degree per group of the blown-up graph: every member of a
    group has the same degree — its (m−1) within-clique neighbors (when
    the clique exists) plus ALL members of every adjacent group. One
    weighted neighbor-sum keyed on the rep id; pure long arithmetic."""
    und = edges.select(
        F.col("doc_a").alias("_rep"), F.col("doc_b").alias("_h")
    ).unionByName(
        edges.select(F.col("doc_b").alias("_rep"), F.col("doc_a").alias("_h"))
    )
    mh = groups.select(F.col("_rep").alias("_h"), F.col("m").alias("_mh"))
    cross = und.join(mh, "_h").groupBy("_rep").agg(
        F.sum("_mh").cast("long").alias("_cdeg")
    )
    return groups.join(cross, "_rep", "left").select(
        "_rep",
        "m",
        "w",
        (
            F.col("w") * (F.col("m") - 1)
            + F.coalesce(F.col("_cdeg"), F.lit(0))
        )
        .cast("long")
        .alias("deg"),
    )


def kcore_grouped(
    docs: DataFrame,
    k: int = KCORE_K,
    rounds: int = KCORE_ROUNDS,
    n: int = BANDED_SHINGLE_N,
    threshold: float = BANDED_JACCARD_THRESHOLD,
    rep: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """k-core of the banded near-dup graph computed on the
    representative graph — row-identical to
    ``kcore_peel(dedup_minhash_banded(docs), k, rounds)`` by
    construction (it shares q_kcore's oracle SQL, the contract-sharing
    pattern of dedup_components_grouped), for any ``k ≥ 1``.

    Why the peel commutes with the blow-up: all members of a
    byte-identical group are structural twins, so they have IDENTICAL
    degree every round — a group survives or peels as a unit. Peeling
    the weighted rep graph (degree = w·(m−1) + Σ adjacent m_h, drop
    groups below k, drop their edges, repeat) therefore reproduces the
    expanded peel exactly; the final residual degrees expand back to
    members with one join. An m-doc byte-identical mega-cluster costs
    one group row per round instead of the m²/2 clique edges the
    pair-table peel feeds through every degree aggregate (r10 SCALE:
    the 100×-skew k-core cold ratio 10.8 was exactly this term).

    Same per-round materialization discipline as :func:`kcore_peel`
    (the surviving state feeds the next round in several places —
    localCheckpoint cuts the 5^r plan re-evaluation)."""
    groups, edges, mem = (
        rep if rep is not None else _rep_graph(docs, n=n, threshold=threshold)
    )
    for _ in range(rounds):
        deg = _rep_degrees(groups, edges)
        groups = (
            deg.filter(F.col("deg") >= F.lit(int(k)))
            .select("_rep", "m", "w")
            .localCheckpoint(eager=True)
        )
        keep_a = groups.select(F.col("_rep").alias("doc_a"))
        keep_b = groups.select(F.col("_rep").alias("doc_b"))
        edges = (
            edges.join(keep_a, "doc_a", "semi")
            .join(keep_b, "doc_b", "semi")
            .localCheckpoint(eager=True)
        )
    final = _rep_degrees(groups, edges).filter(F.col("deg") >= F.lit(int(k)))
    return mem.join(final, "_rep").select(
        "doc_id", F.col("deg").alias("degree")
    )


def pagerank_grouped(
    docs: DataFrame,
    damping: float = PR_DAMPING,
    iters: int = PR_ITERS,
    n: int = BANDED_SHINGLE_N,
    threshold: float = BANDED_JACCARD_THRESHOLD,
    rep: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over the banded near-dup graph computed
    on the representative graph — value-identical to
    ``pagerank(dedup_minhash_banded(docs))`` (shares q_pagerank's
    oracle SQL): structural twins hold equal rank at every iteration
    (they start uniform and see identical neighborhoods), so the rank
    vector is a function of the quotient graph. Each round keeps one
    rank per GROUP and updates it with the weighted inflow
    m_h·(rank_h/deg_h) summed over adjacent groups plus the closed-form
    within-clique term (m−1)·(rank_g/deg_g) — the blow-up's Ω(m²)
    clique edges never materialize; expansion back to members is the
    final join. Unlike the pair-table form (whose per-round state is
    referenced once, so a lazy chain is fine), each round here reads
    the rank state twice — inflow build and the within-clique term —
    so rounds materialize via localCheckpoint like kcore_grouped's
    peel (the state is one row per touched group).

    (The weighted sum replaces m_h repeated additions of the same
    double; both engines already sum inflow in their own order, and the
    contract's 6dp rounding absorbs that class of last-ulp variation —
    planted exact-dup corpora have m = 2, where x+x ≡ 2·x exactly.)"""
    groups, edges, mem = (
        rep if rep is not None else _rep_graph(docs, n=n, threshold=threshold)
    )
    # materialize the (tiny, one row per touched group) degree table:
    # every iteration references the rank state TWICE (inflow build +
    # the within-clique term), so a fully lazy chain re-expands the
    # degree computation ~2^iters times — measured 40+ s vs ~4 s for
    # the equally-sized kcore peel before this
    deg = _rep_degrees(groups, edges).localCheckpoint(eager=True)
    n_row = deg.agg(F.sum("m").cast("long").alias("n"))
    base = deg.crossJoin(F.broadcast(n_row))
    pr = base.withColumn(
        "rank", F.lit(1.0) / F.col("n").cast("double")
    )
    und = edges.select(
        F.col("doc_a").alias("_g"), F.col("doc_b").alias("_h")
    ).unionByName(
        edges.select(F.col("doc_b").alias("_g"), F.col("doc_a").alias("_h"))
    )
    d = float(damping)
    for _ in range(iters):
        cur = pr.withColumn(
            "_pc", F.col("rank") / F.col("deg").cast("double")
        )
        cross_in = (
            und.join(
                cur.select(
                    F.col("_rep").alias("_h"),
                    (F.col("m").cast("double") * F.col("_pc")).alias("_c"),
                ),
                "_h",
            )
            .groupBy("_g")
            .agg(F.sum("_c").alias("_cin"))
        )
        pr = (
            cur.join(cross_in, cur["_rep"] == cross_in["_g"], "left")
            .select(
                "_rep",
                "m",
                "w",
                "deg",
                "n",
                (
                    F.lit(1.0 - d) / F.col("n").cast("double")
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("_cin"), F.lit(0.0))
                        + F.col("w").cast("double")
                        * (F.col("m") - 1).cast("double")
                        * F.col("_pc")
                    )
                ).alias("rank"),
            )
        )
        # same per-round materialization discipline as kcore_grouped:
        # the next round reads this state twice, and the table is one
        # row per touched group
        pr = pr.localCheckpoint(eager=True)
    return mem.join(pr, "_rep").select(
        "doc_id", round_det(F.col("rank"), 6).alias("pagerank")
    )


def triangle_count_grouped(
    docs: DataFrame,
    n: int = BANDED_SHINGLE_N,
    threshold: float = BANDED_JACCARD_THRESHOLD,
    rep: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Total triangle count of the banded near-dup graph WITHOUT
    enumerating the blow-up (r12): value-identical to
    ``COUNT(*)`` over :func:`dedup_triangles`' output (the oracle SQL
    wraps exactly that), but each term is closed-form on the rep graph:

    - all three vertices in one m-clique → C(m,3) = m(m−1)(m−2)/6;
    - two in group a, one in adjacent group b → the pair inside a must
      be a within edge (w_a), every cross pair exists →
      w_a·C(m_a,2)·m_b + w_b·C(m_b,2)·m_a per rep edge;
    - three distinct groups → every rep triangle (a,b,c) blows up to
      m_a·m_b·m_c member triangles (ordered-edge triangle join on the
      SMALL rep edge set).

    Pure long arithmetic throughout (the clique terms divide exactly),
    so the count is oracle-exact. An m-doc identical mega-cluster
    contributes arithmetic, not the Ω(m³) triple rows the pair-table
    triangle join would both enumerate and re-join."""
    groups, edges, _mem = (
        rep if rep is not None else _rep_graph(docs, n=n, threshold=threshold)
    )
    # exact LONG arithmetic: C(m,2)=m(m−1) div 2 divides exactly
    # (consecutive ints), then ·(m−2) div 3 exactly (3·C(m,3)) — no
    # double division that would round above 2^53 on mega-cliques
    c3 = F.expr("m * (m - 1) div 2 * (m - 2) div 3")
    c_within = groups.select((F.col("w") * c3).cast("long").alias("t"))
    ga = groups.select(
        F.col("_rep").alias("doc_a"), F.col("m").alias("_ma"), F.col("w").alias("_wa")
    )
    gb = groups.select(
        F.col("_rep").alias("doc_b"), F.col("m").alias("_mb"), F.col("w").alias("_wb")
    )
    c2a = F.expr("_ma * (_ma - 1) div 2")
    c2b = F.expr("_mb * (_mb - 1) div 2")
    c_edge = (
        edges.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            (
                F.col("_wa") * c2a * F.col("_mb")
                + F.col("_wb") * c2b * F.col("_ma")
            )
            .cast("long")
            .alias("t")
        )
    )
    tri = dedup_triangles(edges)
    msz = groups.select("_rep", "m")
    c_cross = (
        tri.join(msz.select(F.col("_rep").alias("a"), F.col("m").alias("_m1")), "a")
        .join(msz.select(F.col("_rep").alias("b"), F.col("m").alias("_m2")), "b")
        .join(msz.select(F.col("_rep").alias("c"), F.col("m").alias("_m3")), "c")
        .select(
            (F.col("_m1") * F.col("_m2") * F.col("_m3"))
            .cast("long")
            .alias("t")
        )
    )
    # ONE final aggregate over the union of per-row contributions —
    # three pre-aggregated scalars unioned then re-aggregated cost four
    # exchange stages of pure overhead on the tiny cached rep tables
    return (
        c_within.unionByName(c_edge)
        .unionByName(c_cross)
        .agg(
            F.coalesce(F.sum("t"), F.lit(0))
            .cast("long")
            .alias("n_triangles")
        )
    )


def pair_degree_stats_grouped(
    docs: DataFrame,
    n: int = BANDED_SHINGLE_N,
    threshold: float = BANDED_JACCARD_THRESHOLD,
    rep: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Degree histogram of the banded near-dup graph from the rep graph
    — row-identical to ``pair_degree_stats(dedup_minhash_banded(docs))``
    (shares its oracle SQL): every member of a group has the same
    degree w·(m−1) + Σ adjacent m_h, so the histogram is one weighted
    degree computation plus a sum of m per degree — no pair expansion."""
    groups, edges, _mem = (
        rep if rep is not None else _rep_graph(docs, n=n, threshold=threshold)
    )
    return (
        _rep_degrees(groups, edges)
        .groupBy(F.col("deg").alias("degree"))
        .agg(F.sum("m").cast("long").alias("n_docs"))
    )


#: Edit-distance comparisons run on this prefix — O(P²) per pair bounds
#: the cost regardless of document length (the standard practical cap;
#: near-dup docs disagreeing only beyond the prefix are caught by the
#: shingle/minhash strategies instead).
LEV_PREFIX = 200


def dedup_levenshtein(
    docs: DataFrame, threshold: float = 0.2, block_cap: int = LEV_BLOCK_CAP
) -> DataFrame:
    """Edit-distance near-dup detection over the same blocked pair space
    as the n-gram strategy.

    Levenshtein is the right detector for small in-place edits
    (OCR noise, typo-level mutations) that shingle-set Jaccard
    under-weights. Blocked on (lang, source, len_bucket) like
    :func:`dedup_ngram_jaccard`, but with ADJACENT-bucket probing: side
    ``a`` is exploded to probe buckets {b−1, b, b+1}, so a near-dup pair
    straddling a 100-char bucket boundary (e.g. 99 vs 101 chars) is still
    reachable — fixed-bucket blocking misses exactly those. Each unordered
    pair still joins once (when ``a`` is the lower doc_id, exactly one of
    its three probes hits ``b``'s bucket), and pair count stays Σ_block
    m·(m + neighbors) — never n². Distances run on a ``LEV_PREFIX``-char
    prefix so per-pair cost is a constant. rel_dist = lev / max(prefix
    lengths); both engines ship a bit-identical integer levenshtein,
    making this oracle-exact.

    Blocks larger than ``block_cap`` are 2-D salt-split
    (:func:`_salted_for_join`). Both sides of a pair derive salt width
    ``_s`` from the SAME size table — keyed on the *probed* (i.e. b-side)
    bucket — so the salt/probe rendezvous stays consistent across the
    adjacent-bucket probes and every pair still meets exactly once.
    """
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        F.floor(F.col("n_chars") / F.lit(100)).cast("long").alias("len_bucket"),
        F.substring("text", 1, LEV_PREFIX).alias("prefix"),
    )
    blk = ["lang", "source", "len_bucket"]
    probing = base.select(
        "doc_id",
        "lang",
        "source",
        "prefix",
        F.explode(
            F.array(
                F.col("len_bucket") - 1, F.col("len_bucket"), F.col("len_bucket") + 1
            )
        ).alias("len_bucket"),  # the probed bucket, named to match the size table key
    )
    # cached for the same reason as the ngram side: the size-table
    # broadcast + probe/salt replication becomes a once-per-session build
    a = _salted_for_join(probing, blk, "doc_id", block_cap, count_tbl=base).cache().alias("a")
    b = _salted_for_join(base, blk, "doc_id", block_cap).cache().alias("b")
    # emit the candidate PAIRS first (cheap columns only), spread them
    # across all cores, and only then run the O(P²) levenshtein: AQE
    # coalesces the post-join stage by BYTES, and a CPU-bound distance
    # over byte-tiny rows would otherwise run on one or two partitions
    # (measured 10 s vs ~1 s at sf0.1)
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.len_bucket") == F.col("b.len_bucket"))
        & (F.col("a._salt") == F.col("b._probe"))
        & (F.col("a._probe") == F.col("b._salt"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.prefix").alias("pa"),
        F.col("b.prefix").alias("pb"),
    )
    # NOTE: the Spark 3.5+ bounded 3-arg levenshtein(l, r, k) was tried
    # here (banded DP, early abandon) and measured 4× SLOWER at sf0.1
    # (8 s vs 2 s) — the bounded path trades the codegen'd full-matrix
    # kernel for a slower general implementation. The full O(P²) distance
    # over the capped prefix stays.
    lev = F.levenshtein("pa", "pb")
    longest = F.greatest(F.length("pa"), F.length("pb"))
    return (
        _spread(pairs, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            lev.cast("long").alias("lev"),
            round_det(lev.cast("double") / longest, 6).alias("rel_dist"),
        )
        # same pushdown barrier as the ngram strategy: keep the distance
        # out of the join/exchange so it is computed once per pair,
        # above the spread
        .groupBy("doc_a", "doc_b")
        .agg(F.max("lev").alias("lev"), F.max("rel_dist").alias("rel_dist"))
        .filter(F.col("rel_dist") <= threshold)
    )


def dedup_canonical(
    docs: DataFrame, pairs: DataFrame, components: DataFrame | None = None
) -> DataFrame:
    """Canonical-document selection — the decision step after near-dup
    detection: group docs into components (transitive closure of
    ``pairs``), then keep the highest-quality doc per component
    (ties → lowest doc_id). Docs in no component form singleton
    components of themselves. Callers that already materialized the
    component table (a pipeline runs the closure once per corpus
    snapshot) pass it via ``components`` and skip the propagation.

    Scale shape: components run over the pair set only (∝ dups, not
    corpus); quality is a map-only pass; the per-component argmax is ONE
    hash aggregate via min(struct(-quality, doc_id)) — no sort, no
    window over the corpus; the best-of join back is on the (small)
    component key and left to AQE to broadcast.

    Output: (doc_id, component, quality, canonical_id, is_canonical)
    for every doc in the corpus — `is_canonical = false` rows are what a
    training pipeline drops.
    """
    from clusterforge_spark.operators.text import quality_score

    comp = (
        components if components is not None else dedup_components(pairs)
    ).select("doc_id", "component")
    quality = quality_score(docs).select("doc_id", "quality")
    labeled = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn("component", F.coalesce("component", F.col("doc_id")))
    )
    # scored feeds both the per-component argmax and the join-back;
    # cache it so the two branches share one materialization
    scored = labeled.join(quality, "doc_id").cache()
    best = (
        scored.groupBy("component")
        .agg(
            F.min(
                F.struct(
                    (-F.col("quality")).alias("nq"), F.col("doc_id").alias("d")
                )
            ).alias("b")
        )
        .select("component", F.col("b.d").alias("canonical_id"))
    )
    return scored.join(best, "component").select(
        "doc_id",
        "component",
        "quality",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
    )


def dedup_triangles(pairs: DataFrame) -> DataFrame:
    """Triangles in the near-dup pair graph — the cluster-density signal
    that separates tight duplicate cliques (template spam: every pair
    agrees) from chains of borderline matches (A≈B≈C but A≉C), which
    deserve different canonicalization policies.

    Pairs arrive ordered (doc_a < doc_b), so the two equi-joins
    enumerate each triangle exactly once as a < b < c — the standard
    ordered-edge triangle join. Both joins key on a vertex id; at scale
    the classic optimization (orient edges by degree) bounds the join
    fan-out, and the pair set itself is already candidate-bounded by
    the banded LSH.
    """
    e1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = pairs.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    return (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .select("a", "b", "c")
    )


def component_size_stats(components: DataFrame) -> DataFrame:
    """Distribution of near-dup cluster sizes: how many components of
    each size the dedup pass found, plus the docs removed if one
    canonical per component is kept — the dedup-report numbers a data
    pipeline publishes after every pass.

    Two tiny aggregations over the component labels (size per
    component, then count per size) — the report stays a few rows no
    matter the corpus.
    """
    sizes = components.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    return (
        sizes.groupBy("size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_components"))
        .withColumn(
            "docs_removed_if_deduped",
            ((F.col("size") - 1) * F.col("n_components")).cast("long"),
        )
    )


def dup_rate_by_source(docs: DataFrame, components: DataFrame) -> DataFrame:
    """Near-dup rate segmented by source: which crawl slices are
    polluting the corpus with duplicates — the targeting signal that
    turns a dedup pass into a data-sourcing decision.

    Left join of the corpus against the (doc_id, component) membership
    (docs absent from any pair are singletons), then one grouped count.
    Join key is the doc id; output is one row per source.
    """
    membership = components.select("doc_id", "component")
    joined = docs.select("doc_id", "source").join(membership, "doc_id", "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("component").isNotNull().cast("long"))
        .cast("long")
        .alias("n_in_dup_cluster"),
        round_det(
            F.sum(F.col("component").isNotNull().cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("dup_rate"),
    )


def minhash_estimate_error(docs: DataFrame, n: int = 3) -> DataFrame:
    """LSH quality evaluation: signature-estimated Jaccard vs the exact
    shingle-set Jaccard for every banded candidate pair — the
    calibration report that justifies a MinHash deployment (how biased
    is est = matching-components/K at this corpus's similarity range,
    and is the band design catching what it should).

    Same candidate generation as :func:`dedup_minhash_banded` (shared
    cached shingle table, banded bucket join — never n²); the verify
    join carries both the signature arrays (K ints) and the shingle
    sets, so estimate and truth come from one pass over candidates.
    Integer component-match counts + two rounded divisions →
    oracle-exact.
    """
    sh = shingle_hash_table(docs, n=n).select("doc_id", "sh")
    sig = sh.select("doc_id", H.minhash_signature_col("sh").alias("sig"))
    banded = sig.select(
        "doc_id", F.explode(H.band_keys_col("sig")).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # each verify side is ONE map-only projection over the cached
    # shingle table — the signature is a row-wise function of sh, so
    # joining sh back against a separately-derived sig frame on doc_id
    # (the earlier shape) shuffled corpus-scale rows twice to reunite a
    # row with its own derivation
    va = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        H.minhash_signature_col("sh").alias("sig_a"),
    )
    vb = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        H.minhash_signature_col("sh").alias("sig_b"),
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    est = matches.cast("double") / F.lit(float(H.MINHASH_K))
    exact = inter.cast("double") / union.cast("double")
    return (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            matches.cast("long").alias("n_matching_components"),
            round_det(est, 6).alias("est_jaccard"),
            round_det(exact, 6).alias("exact_jaccard"),
            round_det(F.abs(est - exact), 6).alias("abs_err"),
        )
    )


def pair_degree_stats(pairs: DataFrame) -> DataFrame:
    """Degree distribution of the near-dup pair graph: how many docs
    participate in exactly ``degree`` candidate pairs — the graph-shape
    report that distinguishes star-shaped template families (a few
    high-degree hubs) from uniform near-duplicate noise, and the sanity
    check that catches a mis-tuned banding config (degrees exploding)
    before the quadratic pair expansion does.

    Two keyed count aggregates over the (tiny, candidate-bounded) pair
    set; output is a handful of rows at any corpus size.
    """
    deg = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


def pagerank(
    pairs: DataFrame, damping: float = PR_DAMPING, iters: int = PR_ITERS
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected near-dup graph —
    the centrality step of duplicate-cluster triage (the highest-rank
    doc in a big boilerplate cluster is the template everything else
    copies).

    Built as ONE lazy plan: each of the ``iters`` rounds is a
    join + keyed sum (rank mass flows along edges, then the damped
    update re-attaches isolated-free vertices by a left join), so the
    whole computation is ``iters`` chained shuffles on the vertex key —
    no driver loop, no actions, no collect. The undirected edge set
    gives every vertex out-degree ≥ 1, so there is no dangling-mass
    term. A fixed iteration count (not convergence-driven) keeps the
    operator deterministic and oracle-expressible; 3 rounds spread rank
    across the diameter of near-dup cliques, which is what the triage
    ranking needs.

    At 100 TB: each round shuffles (vertex, rank) pairs only — bytes ∝
    vertices + edges, never quadratic; the same plan shape GraphX/Pregel
    would schedule, expressed in DataFrame ops so AQE sizes every
    exchange.
    """
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    edges = fwd.unionByName(rev)
    verts = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n_row = verts.agg(F.count(F.lit(1)).cast("long").alias("n"))
    base = verts.crossJoin(F.broadcast(n_row))
    pr = base.select(
        F.col("src").alias("doc_id"),
        "outdeg",
        "n",
        (F.lit(1.0) / F.col("n").cast("double")).alias("rank"),
    )
    for _ in range(iters):
        contrib = (
            pr.select("doc_id", (F.col("rank") / F.col("outdeg").cast("double")).alias("c"))
            .join(edges, F.col("doc_id") == F.col("src"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        pr = (
            base.join(contrib, base.src == contrib.dst, "left")
            .select(
                F.col("src").alias("doc_id"),
                "outdeg",
                "n",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("n").cast("double")
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return pr.select("doc_id", round_det(F.col("rank"), 6).alias("pagerank"))


#: batch membership predicate for the incremental-dedup query: docs whose
#: id ≡ 0 (mod 7) play the "newly crawled batch"; everything else is the
#: already-indexed corpus. Planted dup copies keep their base id mod 7
#: only by coincidence, so the batch contains a healthy mix of fresh,
#: exact-dup, and near-dup docs.
INCR_BATCH_MOD = 7


def dedup_incremental(docs: DataFrame, n: int = 3, threshold: float = 0.2) -> DataFrame:
    """Incremental dedup: classify a NEW BATCH of documents against the
    existing index — the production shape (a daily crawl lands against a
    petabyte historical corpus; re-deduping the whole corpus per day is
    not an option).

    Per batch doc: ``exact_dup`` (its normalized text hash already
    indexed), ``near_dup`` (a banded-minhash candidate against an INDEX
    doc verifies at Jaccard ≥ threshold), and the resulting decision
    (drop_exact > drop_near > keep). Both probes are ASYMMETRIC joins —
    batch signatures against index signatures only, so cost scales with
    |batch| · collision rate, not |corpus|²; the index side's hash /
    signature tables are exactly what the index already stores, and the
    shingle table is the same cached sub-plan the other strategies share
    (:func:`shingle_hash_table`).
    """
    tagged = docs.withColumn("is_batch", F.col("doc_id") % INCR_BATCH_MOD == 0)
    batch = tagged.filter("is_batch")
    index = tagged.filter(~F.col("is_batch"))

    bh = batch.select("doc_id", F.md5(F.lower("text")).alias("h"))
    ih = index.select(F.md5(F.lower("text")).alias("h")).distinct()
    exact = bh.join(ih, "h", "left_semi").select("doc_id").withColumn(
        "exact_dup", F.lit(True)
    )

    sh = shingle_hash_table(docs, n=n).select("doc_id", "sh")
    sig = sh.select("doc_id", H.minhash_signature_col("sh").alias("sig"))
    banded = sig.select(
        "doc_id", F.explode(H.band_keys_col("sig")).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    b_band = banded.filter(F.col("doc_id") % INCR_BATCH_MOD == 0).alias("a")
    i_band = banded.filter(F.col("doc_id") % INCR_BATCH_MOD != 0).alias("b")
    cand = (
        b_band.join(
            i_band,
            (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")),
        )
        .select(F.col("a.doc_id").alias("doc_id"), F.col("b.doc_id").alias("idx_id"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_id"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("idx_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    near = (
        cand.join(sa, "doc_id")
        .join(sb, "idx_id")
        .filter(round_det(inter.cast("double") / union, 6) >= threshold)
        .select("doc_id")
        .distinct()
        .withColumn("near_dup", F.lit(True))
    )

    out = (
        batch.select("doc_id", "source")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
            F.coalesce("near_dup", F.lit(False)).alias("near_dup"),
        )
    )
    return out.withColumn(
        "decision",
        F.when(F.col("exact_dup"), F.lit("drop_exact"))
        .when(F.col("near_dup"), F.lit("drop_near"))
        .otherwise(F.lit("keep")),
    )


def split_leakage(pairs: DataFrame, splits: DataFrame) -> DataFrame:
    """Train/eval leakage audit: near-dup pairs that STRADDLE a split
    boundary — the check every training-data pipeline must run before
    an eval set means anything (a val doc whose near-duplicate sits in
    train inflates the score of memorization).

    Joins the verified near-dup pair set against the deterministic hash
    split twice (both endpoints) and keeps cross-split pairs, aggregated
    per (split_a, split_b) with the worst (max) and mean Jaccard. Two
    broadcast-sized joins on the pair table — the pair set is ∝ real
    near-dups, so this costs a rounding error next to the dedup that
    produced it.
    """
    sa = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    crossed = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
    )
    # order the split pair lexicographically so (train,val) and
    # (val,train) collapse into one audit row
    lo = F.least("split_a", "split_b")
    hi = F.greatest("split_a", "split_b")
    return (
        crossed.groupBy(lo.alias("split_lo"), hi.alias("split_hi"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_leaking_pairs"),
            round_det(F.max("jaccard"), 6).alias("max_jaccard"),
            # exact BIGINT micro-unit sum (the bm25/unigram trick):
            # jaccard arrives on the 1e-6 grid from the banded verify,
            # so the per-group mean is order-independent integer math
            # until ONE final division — not a partition-order-dependent
            # double sum
            round_det(
                F.sum(F.expr("cast(floor(jaccard * 1e6 + 0.5) as bigint)"))
                .cast("double")
                / (F.count(F.lit(1)).cast("double") * F.lit(1e6)),
                6,
            ).alias("mean_jaccard"),
        )
    )


#: content-defined chunking: a token whose 60-bit md5 is ≡ 0 (mod
#: CDC_MOD) STARTS a new chunk (the inclusive running boundary sum puts
#: the boundary token first in its chunk) — expected chunk length =
#: CDC_MOD tokens, and the boundaries depend only on CONTENT, so a
#: shared passage chunks identically wherever it appears in the corpus.
CDC_MOD = 16


def cdc_chunk_dedup(docs: DataFrame, mod: int = CDC_MOD) -> DataFrame:
    """Sub-document duplication via content-defined chunking — the
    practical scale form of suffix-style substring dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): even
    when no two DOCUMENTS are near-dups, corpora share boilerplate
    passages, quoted paragraphs, and templated sections. Word-level CDC
    finds them: chunk boundaries are content-derived (token-hash ≡ 0
    mod ``mod``), so a shared passage yields the SAME chunks regardless
    of its position or surrounding text — the property fixed-width
    chunking lacks.

    Per doc: (n_chunks, n_dup_chunks, dup_token_frac) where a chunk is
    duplicated when its content hash occurs ≥2 times corpus-wide.

    Scale shape: the only window is per-document (partitioned by
    doc_id, bounded by doc length); chunk assembly is one grouped
    aggregate whose sort_array keeps the hash order-independent under
    any partitioning; the frequency join is chunk-hash keyed (AQE
    sizes it). Nothing is corpus-quadratic — cost ∝ tokens.
    """
    from pyspark.sql.window import Window

    toked = _spread(
        docs.select("doc_id", H.tokens_col("text").alias("t")), "doc_id"
    ).filter(F.size("t") > 0)
    pos = toked.select(
        "doc_id", F.posexplode("t").alias("pos", "token")
    )
    is_b = (
        F.expr(
            "cast(conv(substr(md5(token), 1, 15), 16, 10) as bigint)"
        )
        % mod
        == 0
    ).cast("long")
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    seg = pos.withColumn("b", is_b).withColumn("chunk_id", F.sum("b").over(w))
    chunks = seg.groupBy("doc_id", "chunk_id").agg(
        F.expr(
            "md5(array_join(transform(sort_array(collect_list(struct(pos, token))),"
            " x -> x.token), ' ')) as h"
        ),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
    )
    freq = chunks.groupBy("h").agg(F.count(F.lit(1)).alias("n_occ"))
    return (
        chunks.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum((F.col("n_occ") > 1).cast("long")).cast("long").alias(
                "n_dup_chunks"
            ),
            round_det(
                F.sum(F.when(F.col("n_occ") > 1, F.col("n_tokens")).otherwise(0))
                .cast("double")
                / F.sum("n_tokens").cast("double"),
                6,
            ).alias("dup_token_frac"),
        )
    )


#: k-core peel parameters: minimum degree and the FIXED number of peel
#: rounds (like pagerank's fixed iterations, a fixed unrolled plan both
#: engines share — convergence within the rounds is typical for the
#: banded near-dup graph, whose components are small by construction)
def kcore_peel(pairs: DataFrame, k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> DataFrame:
    """k-core of the near-dup pair graph by fixed-round peeling: drop
    every vertex with degree < k, remove its edges, repeat ``rounds``
    times; report the surviving vertices with their residual degree.

    The k-core separates DENSE duplicate cliques (template spam — every
    member stays: within-clique degree = size−1 ≥ k) from chains and
    stars of borderline matches that peel away — the structural triage
    signal next to triangles/pagerank for choosing a canonicalization
    policy per cluster.

    Scale shape: each round is one degree aggregate (keyed on vertex)
    plus two semi-joins — all hash-partitioned on vertex ids — and the
    round's surviving edge set is MATERIALIZED (localCheckpoint) before
    the next round starts. Unlike pagerank's rank vector (referenced
    once per round — a linear lazy chain), the edge set feeds the next
    round in FIVE places (two degree legs, the keep filter, both
    semi-join probes): left lazy, the plan re-evaluates round r's edges
    5^r times (measured 225 s for 4 rounds at sf0.01 — the exponential
    the oracle dodges with MATERIALIZED CTEs). The checkpoint is the
    same per-round materialization the components convergence loop
    uses; edge count is candidate-bounded by the banded LSH, never n².
    """
    edges = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    for _ in range(rounds):
        deg = (
            edges.select(F.col("a").alias("doc_id"))
            .unionAll(edges.select(F.col("b").alias("doc_id")))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= F.lit(int(k))).select("doc_id")
        edges = (
            edges.join(keep.withColumnRenamed("doc_id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("doc_id", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        edges.select(F.col("a").alias("doc_id"))
        .unionAll(edges.select(F.col("b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .filter(F.col("degree") >= F.lit(int(k)))
    )
