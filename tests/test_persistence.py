"""Model persistence: save → (new session) → load → identical serving.

The reference has no persistence (refit per predict, main.rs:44-52);
SURVEY.md §7 hard-spot 8 makes model reuse the engine's improvement —
these tests pin the roundtrip contract.
"""

from __future__ import annotations

import pytest

from clusterforge_spark import model_store as MS
from clusterforge_spark.operators import clustering as C
from clusterforge_spark.operators import features as FE
from clusterforge_spark.pipeline import run_full_pipeline, run_prediction
from clusterforge_spark.sources.readers import load_table

from tests.conftest import SF_DIR


def _rfm(spark):
    return FE.compute_rfm(load_table(spark, SF_DIR, "events"))


def test_save_load_roundtrip_numpy_regime(spark, tmp_path):
    path = str(tmp_path / "model")
    res = run_full_pipeline(spark, _rfm(spark), n_rows=-1, k=4, seed=42, model_path=path)
    assert MS.model_exists(spark, path)

    # a NEW session (fresh SQL state) must load the identical model
    fresh = spark.newSession()
    m = MS.load_model(fresh, path)
    assert m.k == res.k
    assert m.cols == FE.RFM_COLS
    assert m.centroids == res.centroids
    assert m.cluster_sizes == res.cluster_sizes
    assert m.inertia == pytest.approx(res.inertia)
    assert m.scaler_params == pytest.approx(res.scaler_params)


def test_loaded_model_serves_identical_assignments(spark, tmp_path):
    path = str(tmp_path / "model")
    res = run_full_pipeline(spark, _rfm(spark), n_rows=-1, k=4, seed=42, model_path=path)
    m = MS.load_model(spark, path)

    # serving path: assign_nearest with loaded centroids == original labels
    scaled = FE.scale_features(_rfm(spark))
    orig = C.assign_nearest(scaled, tuple(tuple(c) for c in res.centroids))
    loaded = C.assign_nearest(scaled, tuple(tuple(c) for c in m.centroids))
    a = {r.user_id: r.cluster for r in orig.collect()}
    b = {r.user_id: r.cluster for r in loaded.collect()}
    assert a == b


def test_predict_skips_refit_with_saved_model(spark, tmp_path):
    path = str(tmp_path / "model")
    point = (30.0, 10.0, 500.0)
    c1, res1 = run_prediction(spark, _rfm(spark), point, k=4, seed=42, model_path=path)
    # rfm=None proves no refit happens: serving uses only the saved model
    c2, res2 = run_prediction(spark, None, point, k=4, seed=42, model_path=path)
    assert c2 == c1
    assert res2.centroids == res1.centroids
    assert res2.cluster_sizes == res1.cluster_sizes
    assert res2.n_customers == res1.n_customers


def test_mllib_model_saved_in_distributed_regime(spark, tmp_path):
    path = str(tmp_path / "model")
    # force the distributed branch with a tiny driver_fit_threshold
    res = run_full_pipeline(
        spark, _rfm(spark), n_rows=-1, k=4, seed=42,
        driver_fit_threshold=2, model_path=path,
    )
    m = MS.load_model(spark, path)
    assert m.centroids == res.centroids
    mllib = MS.load_mllib_model(spark, path)
    got = [[float(v) for v in c] for c in mllib.clusterCenters()]
    assert len(got) == len(res.centroids)
    for g, want in zip(got, res.centroids):
        assert g == pytest.approx(want)
