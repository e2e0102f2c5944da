"""Partitioning helpers.

``spread_partitions`` exists because the local testdata arrives as
single-row-group parquet files (scan parallelism 1): CPU-heavy per-row
stages (interpreted md5 hashing, shingling, pandas decode) must
repartition *before* computing or they serialize onto one core. At real
scale the sources are already split, and the repartition is a cheap
small-row shuffle either way.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame


def spread_partitions(df: DataFrame, col: str | None = None) -> DataFrame:
    """Repartition to the session's full core count (by ``col`` if given)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, col) if col else df.repartition(n)


def suggest_agg_partitions(
    df: DataFrame,
    bytes_per_partition: int = 16 << 20,
    floor: int = 4,
) -> int | None:
    """Size a pre-aggregation repartition by SOURCE bytes, clamped to
    [floor, spark.sql.shuffle.partitions].

    The static shuffle conf is always wrong for somebody: a conf sized
    for the big tables makes a megabyte-scale aggregate pay per-task
    scheduling + per-task Arrow collect overhead for near-empty
    partitions (measured: the RFM probe at sf0.1 runs 283 ms with 4
    reduce tasks vs 462 ms with the session's 8). AQE solves this for
    plans it re-optimizes, but explicit ``repartition(col)`` counts are
    fixed at plan time — so derive the count from the scan's file sizes.
    Returns None (caller keeps the conf default) when the input isn't a
    simple file scan — including when the scan has been CACHED
    (CacheManager substitution empties ``inputFiles()``), where the
    exchange is over the in-memory relation and the conf is the right
    size anyway.
    """
    try:
        files = df.inputFiles()
        total = sum(os.path.getsize(urlparse(p).path or p) for p in files)
    except Exception:
        return None
    if not files:
        return None
    conf = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    want = (total + bytes_per_partition - 1) // bytes_per_partition
    return int(max(min(floor, conf), min(conf, want)))
