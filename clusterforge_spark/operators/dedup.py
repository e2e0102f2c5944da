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
    # blow up the candidate-pair count)
    shingled = (
        _spread(docs, "doc_id")
        .select("doc_id", H.shingles_col("text", n=5).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )
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


def dedup_ngram_jaccard(
    docs: DataFrame, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Exact word-n-gram Jaccard over (lang, source)-blocked pairs.

    jaccard = |A∩B| / (|A|+|B|−|A∩B|) on distinct shingle sets. The
    blocked self-join shuffles on the block key only; pair count is
    Σ_block m², bounded by the block design, never n².
    """
    # intersect 60-bit shingle *hashes*, not strings: one md5 per shingle
    # up front, then every pairwise intersection hashes fixed-width longs
    # instead of re-hashing full shingle strings per pair. Jaccard over
    # distinct hash sets equals Jaccard over shingle sets (md5 collisions
    # are negligible); the oracle applies the same transformation.
    # spread raw docs BEFORE shingling so the md5 hashing (interpreted
    # per-element) runs on all cores, not on the single scan partition.
    # Block key includes a length bucket: near-identical docs have
    # near-identical lengths, so the bucket keeps true pairs together
    # while cutting candidate count ~5× vs (lang, source) alone.
    sh = (
        _spread(docs.select("doc_id", "lang", "source", "text", "n_chars"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "source",
            F.floor(F.col("n_chars") / F.lit(100)).cast("long").alias("len_bucket"),
            F.array_distinct(
                F.transform(
                    H.shingles_col("text", n=n),
                    lambda s: F.conv(F.md5(s).substr(1, 15), 16, 10).cast("long"),
                )
            ).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        # persist: the self-join references the shingle table twice, and
        # without materialization each branch re-runs the md5 shingle
        # hashing (the dominant cost). At scale this is the standard
        # "materialize the fingerprint table" step.
        .cache()
    )
    # probe side streams; build side broadcast — the pair stream is then
    # map-only (no shuffle AQE could under-coalesce; the CPU cost is the
    # array intersections, not the data volume). When the corpus outgrows
    # broadcast, drop the hint: the same equi-join keys give a blocked
    # shuffle join.
    a, b = sh.alias("a"), F.broadcast(sh).alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
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
    """Per-doc 60-bit simhash (+ distinct-token count)."""
    hashed = _spread(docs, "doc_id").select(
        "doc_id", H.token_hashes_col("text").alias("th")
    )
    return hashed.select(
        "doc_id",
        H.simhash_col("th").alias("simhash"),
        F.size("th").cast("long").alias("n_distinct_tokens"),
    )


def dedup_simhash(
    docs: DataFrame, max_hamming: int = 6, bands: int = 4, band_bits: int = 15
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance ≤ ``max_hamming``.

    Banded blocking: two hashes within hamming h < bands must agree on
    ≥1 of the ``bands`` disjoint 15-bit bands (pigeonhole) — the
    candidate join is on (band_idx, band_value), never all-pairs.
    """
    fp = simhash_fingerprints(docs).select("doc_id", "simhash")
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
    banded = fp.select("doc_id", "simhash", F.explode(band_arr).alias("bv")).select(
        "doc_id", "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embs_with_dups(embeddings: DataFrame, n_copy: int = 100) -> DataFrame:
    """embeddings ∪ exact copies of the first ``n_copy`` vectors."""
    base = embeddings.select("vec_id", "embedding", "label")
    copies = base.filter(F.col("vec_id") < n_copy).select(
        (F.col("vec_id") + EXACT_DUP_OFFSET).alias("vec_id"), "embedding", "label"
    )
    return base.unionByName(copies)


def dedup_embedding_cosine(embs: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold within label blocks.

    Label blocking stands in for a coarse-quantizer bucket (IVF cell /
    LSH bucket) — the production pattern that keeps the pairwise stage
    off the full cross product.
    """
    from clusterforge_spark.functions import vector as V

    e = embs.select("vec_id", "label", "embedding")
    a, b = e.alias("a"), e.alias("b")
    cos = V.cosine_cols("a.embedding", "b.embedding")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            round_det(cos, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def dedup_minhash_banded(
    docs: DataFrame, n: int = 3, threshold: float = 0.2
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
    """
    sh = (
        _spread(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    H.shingles_col("text", n=n),
                    lambda s: F.conv(F.md5(s).substr(1, 15), 16, 10).cast("long"),
                )
            ).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .cache()
    )
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
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            round_det(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.max("jaccard").alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
