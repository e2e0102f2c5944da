"""RFM + scaler invariants ported from the reference's tests
(FIXTURES.md §3: data.rs:284-295 scaler mean≈0, integration.rs:112-133
bounded z and non-negative raw features)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


def test_rfm_shape_and_invariants(rfm):
    rows = rfm.collect()
    assert len(rows) > 0
    assert rfm.columns == ["user_id", "recency", "frequency", "monetary"]
    for r in rows:
        # post-agg HAVING filter invariants (data.rs:177-183)
        assert r.recency >= 0
        assert r.frequency > 0
        assert r.monetary > 0


def test_rfm_matches_manual_aggregation(events, rfm):
    manual = (
        events.groupBy("user_id")
        .agg(
            F.countDistinct("event_id").alias("f"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("m"),
        )
        .collect()
    )
    by_user = {r.user_id: r for r in rfm.collect()}
    for r in manual:
        assert by_user[r.user_id].frequency == float(r.f)
        assert by_user[r.user_id].monetary == pytest.approx(r.m, abs=1e-9)


def test_scaler_mean_zero_population_std(scaled):
    """Scaled columns have mean ≈ 0 (tol mirrors data.rs:284-295) and
    population variance ≈ 1 (the reference divides by n, not n−1)."""
    stats = scaled.agg(
        *[F.avg(c).alias(f"{c}_mean") for c in ("recency_z", "frequency_z", "monetary_z")],
        *[F.stddev_pop(c).alias(f"{c}_sd") for c in ("recency_z", "frequency_z", "monetary_z")],
    ).collect()[0]
    for c in ("recency_z", "frequency_z", "monetary_z"):
        assert abs(stats[f"{c}_mean"]) < 1e-10
        assert stats[f"{c}_sd"] == pytest.approx(1.0, abs=1e-9)


def test_scaled_values_bounded(scaled):
    for r in scaled.collect():
        for c in ("recency_z", "frequency_z", "monetary_z"):
            assert abs(r[c]) < 10, f"|z| >= 10 for {c}: {r[c]}"


def test_sigma_floor_on_constant_column(spark):
    """A zero-variance feature must scale with σ=1e-8, not divide by 0
    (data.rs:37)."""
    from clusterforge_spark.operators.features import fit_scaler

    df = spark.createDataFrame([(i, 5.0) for i in range(4)], "user_id long, x double")
    params = fit_scaler(df, cols=("x",)).collect()[0]
    assert params["x_std"] == 1e-8
    assert params["x_mean"] == 5.0


def test_scale_point_roundtrip(spark):
    from clusterforge_spark.operators.features import scale_point

    params = {"recency_mean": 10.0, "recency_std": 2.0,
              "frequency_mean": 4.0, "frequency_std": 1.0,
              "monetary_mean": 100.0, "monetary_std": 50.0}
    z = scale_point(params, (14.0, 6.0, 200.0))
    assert z == [2.0, 2.0, 2.0]
    with pytest.raises(ValueError):
        scale_point(params, (1.0, 2.0))


def test_recency_fractional_days(events, rfm):
    """Recency is fractional days vs 2024-07-01 (data.rs:166-169 semantics)."""
    last = events.agg(F.max("ts").alias("m")).collect()[0].m
    import datetime

    ref = datetime.datetime(2024, 7, 1)
    expected_min = (ref - last.replace(tzinfo=None)).total_seconds() / 86400.0
    min_rec = rfm.agg(F.min("recency").alias("r")).collect()[0].r
    assert math.isclose(min_rec, expected_min, rel_tol=1e-9)


def test_rfm_segments_rules_consistent(rfm):
    from clusterforge_spark.operators.features import rfm_segments

    rows = rfm_segments(rfm).collect()
    assert len(rows) == rfm.count()
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        # first matching rule wins
        if r.r_score >= 4 and r.f_score >= 4 and r.m_score >= 4:
            assert r.segment == "champion"
        elif r.f_score >= 4:
            assert r.segment == "loyal"
        elif r.m_score >= 4:
            assert r.segment == "big_spender"
        elif r.r_score <= 2 and r.f_score >= 3:
            assert r.segment == "at_risk"
        elif r.r_score <= 2:
            assert r.segment == "hibernating"
        else:
            assert r.segment == "regular"
