"""Sampled-silhouette semantics (model.rs:64-119 incl. degenerate → 0)."""

from __future__ import annotations

import pytest

from clusterforge_spark.operators.metrics import silhouette_mean, silhouette_sample


def test_silhouette_range(assigned):
    rows = silhouette_sample(assigned).collect()
    assert 0 < len(rows) <= 100
    for r in rows:
        assert -1.0 <= r.silhouette <= 1.0


def test_silhouette_mean_matches_points(assigned):
    per_point = silhouette_sample(assigned)
    mean = silhouette_mean(per_point).collect()[0].mean_silhouette
    vals = [r.silhouette for r in per_point.collect()]
    assert mean == pytest.approx(sum(vals) / len(vals), abs=1e-4)


def test_singleton_cluster_silhouette_zero(spark):
    """A cluster of one has no intra-cluster distance → s = 0
    (model.rs:96-113 degenerate case)."""
    df = spark.createDataFrame(
        [(1, 0, 0.0, 0.0), (2, 1, 5.0, 5.0), (3, 1, 5.0, 6.0)],
        "user_id long, cluster long, x double, y double",
    )
    rows = {r.id: r.silhouette for r in
            silhouette_sample(df, id_col="user_id", cols=("x", "y")).collect()}
    assert rows[1] == 0.0
    assert rows[2] > 0 and rows[3] > 0


def test_single_cluster_all_zero(spark):
    """Only one cluster present → b(i) undefined → all silhouettes 0."""
    df = spark.createDataFrame(
        [(1, 0, 0.0, 0.0), (2, 0, 1.0, 0.0), (3, 0, 2.0, 0.0)],
        "user_id long, cluster long, x double, y double",
    )
    rows = silhouette_sample(df, id_col="user_id", cols=("x", "y")).collect()
    assert all(r.silhouette == 0.0 for r in rows)
