"""Model persistence: fitted scaler + centroids saved as parquet, with
optional MLlib-native model format alongside.

The reference has NO persistence — predict mode refits from raw data on
every invocation (main.rs:44-52). SURVEY.md §7 (hard spot 8) calls out
model reuse as the primary API improvement: at 100 TB a refit-per-predict
is absurd. What a fitted segmentation actually *is* is tiny — k·d
centroid floats plus 2·d scaler params — so the engine-level format is
plain parquet (portable across engines, readable by anything), and the
serving path is the existing literal-broadcast geometry
(operators/clustering.assign_nearest / predict_point): map-only, no
MLlib dependency at inference time.

Layout under ``<path>/``:
  scaler/      1-row parquet: {col}_mean / {col}_std per feature col
  centroids/   rows (cluster int, center array<double>) in scaled space
  meta/        rows (key string, value string): k, cols, inertia, sizes
  mllib/       (optional) pyspark.ml native KMeansModel.save output —
               written when a fitted MLlib handle is available, so JVM
               pipelines can model.load() it directly.

All writes go through Spark writers, so the path may be any Hadoop-FS
URI (local, HDFS, s3a), same as any table.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class SavedModel:
    """A loaded segmentation model: everything serving needs."""

    k: int
    cols: tuple[str, ...]
    scaler_params: dict  # {col}_mean / {col}_std
    centroids: list[list[float]]  # scaled space, index = cluster id
    cluster_sizes: list[tuple[int, int, float]]  # (cluster, size, pct)
    inertia: float | None


def save_model(
    spark: SparkSession,
    path: str,
    *,
    centroids: list[list[float]],
    scaler_params: dict,
    k: int,
    cols: tuple[str, ...],
    cluster_sizes: list[tuple[int, int, float]] | None = None,
    inertia: float | None = None,
    mllib_model=None,
) -> None:
    """Persist a fitted scaler + centroids (and optionally the MLlib model)."""
    base = path.rstrip("/")
    spark.createDataFrame([tuple(float(scaler_params[key]) for key in sorted(scaler_params))],
                          schema=", ".join(f"`{key}` double" for key in sorted(scaler_params))
                          ).write.mode("overwrite").parquet(f"{base}/scaler")
    spark.createDataFrame(
        [(int(i), [float(v) for v in c]) for i, c in enumerate(centroids)],
        schema="cluster int, center array<double>",
    ).write.mode("overwrite").parquet(f"{base}/centroids")
    meta = {
        "k": str(int(k)),
        "cols": json.dumps(list(cols)),
        "inertia": "" if inertia is None else repr(float(inertia)),
        "cluster_sizes": json.dumps(
            [[int(c), int(s), float(p)] for c, s, p in (cluster_sizes or [])]
        ),
        "format_version": "1",
    }
    spark.createDataFrame(
        sorted(meta.items()), schema="key string, value string"
    ).write.mode("overwrite").parquet(f"{base}/meta")
    if mllib_model is not None:
        mllib_model.write().overwrite().save(f"{base}/mllib")


def model_exists(spark: SparkSession, path: str) -> bool:
    """True if ``path`` holds a readable saved model (meta present)."""
    try:
        rows = spark.read.parquet(f"{path.rstrip('/')}/meta").collect()
    except Exception:
        return False
    return any(r.key == "format_version" for r in rows)


def load_model(spark: SparkSession, path: str) -> SavedModel:
    base = path.rstrip("/")
    meta = {r.key: r.value for r in spark.read.parquet(f"{base}/meta").collect()}
    scaler_row = spark.read.parquet(f"{base}/scaler").collect()[0]
    cen_rows = sorted(
        spark.read.parquet(f"{base}/centroids").collect(), key=lambda r: r.cluster
    )
    return SavedModel(
        k=int(meta["k"]),
        cols=tuple(json.loads(meta["cols"])),
        scaler_params=scaler_row.asDict(),
        centroids=[[float(v) for v in r.center] for r in cen_rows],
        cluster_sizes=[
            (int(c), int(s), float(p)) for c, s, p in json.loads(meta["cluster_sizes"])
        ],
        inertia=float(meta["inertia"]) if meta["inertia"] else None,
    )


def load_mllib_model(spark: SparkSession, path: str):
    """Load the MLlib-native model saved alongside (raises if absent)."""
    from pyspark.ml.clustering import KMeansModel

    return KMeansModel.load(f"{path.rstrip('/')}/mllib")
