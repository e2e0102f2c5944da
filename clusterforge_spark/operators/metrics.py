"""Clustering quality metrics: sampled pairwise silhouette.

The reference computes mean silhouette over the *first* min(n, 100) rows
with full pairwise Euclidean distances (model.rs:64-119, invoked with 100
at main.rs:132-133). "First n rows" is ingestion order, which a distributed
engine does not guarantee — the deterministic stand-in is ORDER BY key
LIMIT n (documented deviation, SURVEY.md §7 hard-spot 7).

Scale note: pairwise silhouette is O(n²) — the sample bound is applied
*before* the self-join, so the join input is ≤ n rows regardless of data
size, and Spark broadcasts it. MLlib's ClusteringEvaluator (squared-
Euclidean silhouette over all points, linear) is the production-scale
variant; it computes a different definition, so parity uses this one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clusterforge_spark.functions.rounding import round_det


def silhouette_sample(
    assigned: DataFrame,
    id_col: str = "user_id",
    cols: tuple[str, ...] = ("recency_z", "frequency_z", "monetary_z"),
    cluster_col: str = "cluster",
    n: int = 100,
) -> DataFrame:
    """Per-point silhouette over a deterministic n-row sample.

    For each sampled point i:
      a(i) = mean distance to other sampled points in its cluster
      b(i) = min over other clusters of mean distance to that cluster
      s(i) = (b−a)/max(a,b);  degenerate cases → 0 (model.rs:96-113):
             singleton cluster (no same-cluster neighbor) or no other
             cluster present.

    Returns (id, cluster, silhouette) — the overall score is the mean,
    exposed via :func:`silhouette_mean`.
    """
    sample = (
        assigned.select(id_col, cluster_col, *cols)
        .orderBy(id_col)
        .limit(n)
    )
    a = sample.alias("a")
    b = sample.alias("b")
    dist = None
    for c in cols:
        term = (F.col(f"a.{c}") - F.col(f"b.{c}")) * (F.col(f"a.{c}") - F.col(f"b.{c}"))
        dist = term if dist is None else dist + term
    dist = F.sqrt(dist)

    pairs = (
        a.join(b, F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id"),
            F.col(f"a.{cluster_col}").alias("cluster"),
            F.col(f"b.{cluster_col}").alias("other_cluster"),
            dist.alias("d"),
        )
    )
    # mean distance from each point to each cluster (as populated by others)
    to_cluster = pairs.groupBy("id", "cluster", "other_cluster").agg(
        F.avg("d").alias("mean_d")
    )
    a_i = to_cluster.filter(F.col("cluster") == F.col("other_cluster")).select(
        "id", F.col("mean_d").alias("a_dist")
    )
    b_i = (
        to_cluster.filter(F.col("cluster") != F.col("other_cluster"))
        .groupBy("id")
        .agg(F.min("mean_d").alias("b_dist"))
    )
    ids = sample.select(F.col(id_col).alias("id"), cluster_col)
    return (
        ids.join(a_i, "id", "left")
        .join(b_i, "id", "left")
        .select(
            "id",
            cluster_col,
            round_det(
                F.when(
                    F.col("a_dist").isNull()
                    | F.col("b_dist").isNull()
                    | (F.greatest(F.col("a_dist"), F.col("b_dist")) == 0.0),
                    F.lit(0.0),
                ).otherwise(
                    (F.col("b_dist") - F.col("a_dist"))
                    / F.greatest(F.col("a_dist"), F.col("b_dist"))
                ),
                4,
            ).alias("silhouette"),
        )
    )


def silhouette_mean(per_point: DataFrame) -> DataFrame:
    """Mean of per-point silhouettes (model.rs:116-118)."""
    return per_point.agg(round_det(F.avg("silhouette"), 4).alias("mean_silhouette"))
