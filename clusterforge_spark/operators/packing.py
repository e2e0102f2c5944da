"""Training-batch preparation: sequence chunk-packing + deterministic splits.

The two operators every pretraining data pipeline runs just before
tokenized shards are written:

* ``pack_chunks`` — concat-and-chunk packing (the GPT-style regime):
  documents are laid end-to-end per shard in a deterministic order and
  cut into fixed ``budget``-token context windows. Expressed entirely as
  one window running-sum — no UDF, one shuffle on the shard key, exact
  integer arithmetic (oracle-checkable bit-for-bit).
* ``hash_split`` — reproducible train/validation assignment from a
  cross-engine-stable content hash (md5), so the split survives
  re-partitioning, re-ordering, and engine changes. Never ``rand()``:
  a seeded rand is partition-order-dependent in any distributed engine.

At 100 TB both are embarrassingly parallel: packing shuffles once on the
shard key (shards are sized by the pipeline, so partitions stay bounded)
and hash-split is map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clusterforge_spark.functions import hashing as H

#: Tokens per packed context window.
PACK_BUDGET = 512

#: Percent of hash space routed to train (rest → val).
TRAIN_PCT = 90


def pack_chunks(documents: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Assign each document its context-window position under
    concat-and-chunk packing, per source shard.

    Documents are ordered by doc_id within each source; the running
    token count before a document determines its chunk
    (``floor(cum_before / budget)``) and offset within that chunk.
    ``straddles`` marks documents cut by a window boundary (the
    attention-mask reset points). All integer math — exact in any
    engine.
    """
    from pyspark.sql.window import Window

    n_tokens = F.size(H.tokens_col("text")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        documents.select("source", "doc_id", n_tokens.alias("n_tokens"))
        .select("*", (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("cum_before"))
        .select(
            "source",
            "doc_id",
            "n_tokens",
            F.floor(F.col("cum_before") / budget).cast("long").alias("chunk_id"),
            (F.col("cum_before") % budget).cast("long").alias("chunk_offset"),
            ((F.col("cum_before") % budget) + F.col("n_tokens") > budget)
            .alias("straddles"),
        )
    )


def hash_split(documents: DataFrame, train_pct: int = TRAIN_PCT) -> DataFrame:
    """Deterministic train/val split on a 60-bit md5 of the doc key.

    The bucket is ``md5_60bit(doc_id) % 100`` — stable across engines,
    partitionings, and runs (unlike seeded ``rand()``, whose stream
    depends on row-to-partition placement). Map-only; the same document
    always lands in the same split even when the corpus grows.
    """
    bucket = (
        F.conv(F.md5(F.col("doc_id").cast("string")).substr(1, 15), 16, 10)
        .cast("long")
        % 100
    )
    return documents.select(
        "doc_id",
        "source",
        bucket.alias("hash_bucket"),
        F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("val")).alias("split"),
    )


def chunk_sliding(
    documents: DataFrame, chunk_size: int = 200, overlap: int = 50
) -> DataFrame:
    """Sliding-window character chunking with overlap — the RAG /
    long-context preparation step (each chunk starts ``chunk_size −
    overlap`` characters after the previous one, so every boundary
    region appears in two chunks).

    Map-only: one integer-sequence explode per document, then a
    substring projection — no shuffle, no UDF; scales as a pure scan at
    any corpus size. Deterministic strings + integer math, so the DuckDB
    oracle reproduces it bit-for-bit. Empty documents produce no chunks
    (the filter also guards Spark's ``sequence``, whose step is inferred
    as −1 when start > stop).
    """
    if not 0 <= overlap < chunk_size:
        # a negative overlap would make stride > chunk_size and silently
        # drop the characters between consecutive chunks, violating the
        # full-coverage tiling property documented above
        raise ValueError(
            f"overlap ({overlap}) must satisfy 0 <= overlap < chunk_size ({chunk_size})"
        )
    if chunk_size <= 0:
        raise ValueError(f"chunk_size ({chunk_size}) must be positive")
    stride = chunk_size - overlap
    idx = F.explode(
        F.sequence(F.lit(0), F.floor((F.length("text") - 1) / stride).cast("int"))
    )
    start = F.col("chunk_idx").cast("long") * stride
    return (
        documents.filter(F.length("text") > 0)
        .select("doc_id", "text", idx.alias("chunk_idx"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            start.alias("chunk_start"),
            F.expr(f"substring(text, chunk_idx * {stride} + 1, {chunk_size})").alias(
                "chunk_text"
            ),
            F.length(
                F.expr(f"substring(text, chunk_idx * {stride} + 1, {chunk_size})")
            )
            .cast("long")
            .alias("chunk_len"),
        )
    )


def kfold_split(documents: DataFrame, k: int = 5) -> DataFrame:
    """Deterministic k-fold cross-validation assignment:
    fold = md5_60('fold|' || doc_id) % k — the SALTED hash keeps fold
    assignment statistically independent of :func:`hash_split`'s
    train/val bucket (same doc, uncorrelated draws), while staying
    stable across engines, partitionings, and corpus growth (a document
    never changes folds when new data lands). Map-only.
    """
    if k <= 1:
        raise ValueError(f"k ({k}) must be at least 2")
    fold = (
        F.conv(F.md5(F.concat(F.lit("fold|"), F.col("doc_id").cast("string"))).substr(1, 15), 16, 10)
        .cast("long")
        % k
    )
    return documents.select(
        "doc_id", "source", fold.alias("fold"),
        (fold != 0).alias("in_train_fold0"),
    )
