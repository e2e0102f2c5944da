"""Partitioning helpers.

``spread_partitions`` exists because the local testdata arrives as
single-row-group parquet files (scan parallelism 1): CPU-heavy per-row
stages (interpreted md5 hashing, shingling, pandas decode) must
repartition *before* computing or they serialize onto one core. At real
scale the sources are already split, and the repartition is a cheap
small-row shuffle either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_partitions(df: DataFrame, col: str | None = None) -> DataFrame:
    """Repartition to the session's full core count (by ``col`` if given)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, col) if col else df.repartition(n)
