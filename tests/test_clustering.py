"""Clustering guards + geometry invariants (model.rs:138-150 guards,
integration.rs:63-75 label/size checks, model.rs:43 tie-break)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from clusterforge_spark.operators.clustering import (
    FIXED_CENTROIDS,
    assign_nearest,
    cluster_sizes,
    fit_kmeans,
    inertia,
    predict_point,
)


def test_assign_labels_in_range(assigned):
    rows = assigned.select("cluster").distinct().collect()
    for r in rows:
        assert 0 <= r.cluster < len(FIXED_CENTROIDS)


def test_cluster_sizes_sum_to_n(assigned):
    sizes = cluster_sizes(assigned).collect()
    assert sum(r.size for r in sizes) == assigned.count()
    assert sum(r.pct for r in sizes) == pytest.approx(100.0, abs=1e-6)


def test_inertia_nonnegative_finite(assigned):
    v = inertia(assigned).collect()[0].inertia
    assert v >= 0 and v == v  # finite, not NaN


def test_tie_break_lowest_index(spark):
    """A point equidistant to two centroids gets the lower index
    (strict < at model.rs:43)."""
    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, x double, y double")
    out = assign_nearest(df, centroids=((0.0, 1.0), (0.0, -1.0)), cols=("x", "y")).collect()[0]
    assert out.cluster == 0
    assert out.dist == 1.0


def test_kmeans_guards(scaled):
    with pytest.raises(ValueError, match="between 3 and 5"):
        fit_kmeans(scaled, k=2)
    with pytest.raises(ValueError, match="between 3 and 5"):
        fit_kmeans(scaled, k=6)
    with pytest.raises(ValueError, match="must be >="):
        fit_kmeans(scaled.limit(2), k=3)


def test_kmeans_fit_shapes_and_determinism(scaled):
    res = fit_kmeans(scaled, k=4, seed=42)
    n = scaled.count()
    assert res.assignments.count() == n
    assert len(res.centroids) == 4
    assert all(len(c) == 3 for c in res.centroids)
    assert res.inertia >= 0
    labels = {r.cluster for r in res.assignments.select("cluster").distinct().collect()}
    assert labels <= {0, 1, 2, 3}
    # pinned seed ⇒ identical refit
    res2 = fit_kmeans(scaled, k=4, seed=42)
    assert res2.centroids == res.centroids


def test_kmeans_inertia_matches_sql_geometry(scaled):
    """MLlib trainingCost == Σ‖x−c‖² computed by the SQL geometry path
    on the fitted centroids (SURVEY.md §7 phase C cross-check)."""
    res = fit_kmeans(scaled, k=4, seed=7)
    assigned = assign_nearest(
        scaled, centroids=tuple(tuple(c) for c in res.centroids)
    )
    sql_inertia = assigned.agg(
        F.sum(F.col("dist") * F.col("dist")).alias("i")
    ).collect()[0].i
    assert sql_inertia == pytest.approx(res.inertia, rel=1e-6)


def test_predict_point_matches_reference_semantics():
    params = {"recency_mean": 0.0, "recency_std": 1.0,
              "frequency_mean": 0.0, "frequency_std": 1.0,
              "monetary_mean": 0.0, "monetary_std": 1.0}
    cluster, dist = predict_point(params, FIXED_CENTROIDS, (-0.75, 0.9, 1.1))
    assert cluster == 0
    assert dist == 0.0


def test_grouped_kmeans_matches_numpy_per_group(spark, embeddings):
    import numpy as np

    from clusterforge_spark.operators.clustering import grouped_kmeans

    got = {
        (r.label, r.cluster): (r.n_points, r.inertia)
        for r in grouped_kmeans(embeddings, k=2, iters=8).collect()
    }
    pdf = embeddings.select("vec_id", "embedding", "label").toPandas()
    for label, g in pdf.groupby("label"):
        g = g.sort_values("vec_id").reset_index(drop=True)
        X = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        kk = min(2, len(X))
        C = X[:kk].copy()
        for _ in range(8):
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for c in range(kk):
                m = X[a == c]
                if len(m):
                    C[c] = m.mean(axis=0)
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(kk):
            n, inertia = got[(label, c)]
            assert n == int((a == c).sum())
            assert abs(inertia - d[a == c, c].sum()) < 1e-3
    # every group emitted k clusters
    n_labels = embeddings.select("label").distinct().count()
    assert len(got) == 2 * n_labels
