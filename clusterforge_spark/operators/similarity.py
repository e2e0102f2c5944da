"""Similarity search over embedding columns (array<float>).

Three strategies with identical output shape (vec_id, cos_sim, rank):

* brute force — exact cosine top-k over the full table. One scan, one
  TakeOrderedAndProject; the correctness baseline.
* sign-LSH    — 8 literal random hyperplanes → 256 buckets; multi-probe
  (query bucket + all 1-bit flips) then exact rerank of candidates.
* IVF         — 8 literal coarse centroids; assign each vector to its
  nearest cell (argmin L2, tie→lowest index), probe the query's 2
  nearest cells, exact rerank.

At 100 TB the scale path is LSH/IVF: candidates shrink by the bucket
fan-out while the scan stays a map-only projection (bucket assignment is
literal arithmetic inside codegen — no shuffle, no UDF). All three are
deterministic and oracle-checkable because the "random" projections are
fixed literals shared with the SQL side (functions/vector.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clusterforge_spark.functions.rounding import round_det

from clusterforge_spark.functions import vector as V


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k with rank; ties broken by vec_id."""
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


def brute_force_topk(
    embeddings: DataFrame, query: list[float] | None = None, k: int = 10
) -> DataFrame:
    query = query or V.QUERY_VEC
    scored = embeddings.select(
        "vec_id", round_det(V.cosine_lit("embedding", query), 6).alias("cos_sim")
    )
    return _ranked_topk(scored, k)


def lsh_topk(
    embeddings: DataFrame,
    query: list[float] | None = None,
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    query = query or V.QUERY_VEC
    planes = V.HYPERPLANES[:n_planes]
    qb = V.py_lsh_bucket(query, planes)
    # multi-probe: exact bucket + every 1-bit flip (recall vs fan-out knob)
    probe = sorted({qb} | {qb ^ (1 << j) for j in range(n_planes)})
    scored = (
        embeddings.withColumn("bucket", V.lsh_bucket("embedding", planes))
        .filter(F.col("bucket").isin([int(p) for p in probe]))
        .select("vec_id", round_det(V.cosine_lit("embedding", query), 6).alias("cos_sim"))
    )
    return _ranked_topk(scored, k)


def ivf_assign(embeddings: DataFrame, centroids: list[list[float]] | None = None) -> DataFrame:
    """Nearest coarse-centroid cell per vector (argmin L2, tie→lowest)."""
    centroids = centroids or V.IVF_CENTROIDS
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    V.dist2_lit("embedding", c).alias("d"), F.lit(i).alias("i")
                )
                for i, c in enumerate(centroids)
            ]
        )
    )
    return embeddings.withColumn("cell", best.getField("i").cast("long"))


def py_ivf_cells(query: list[float], centroids: list[list[float]], nprobe: int) -> list[int]:
    """The query's nprobe nearest cells, computed with engine-identical math."""
    from functools import reduce

    dists = []
    for i, c in enumerate(centroids):
        d = reduce(lambda a, t: a + t, ((q - x) * (q - x) for q, x in zip(query, c)))
        dists.append((d, i))
    return [i for _, i in sorted(dists)[:nprobe]]


def ivf_topk(
    embeddings: DataFrame,
    query: list[float] | None = None,
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    query = query or V.QUERY_VEC
    cells = py_ivf_cells(query, V.IVF_CENTROIDS, nprobe)
    scored = (
        ivf_assign(embeddings)
        .filter(F.col("cell").isin([int(c) for c in cells]))
        .select("vec_id", round_det(V.cosine_lit("embedding", query), 6).alias("cos_sim"))
    )
    return _ranked_topk(scored, k)
