"""Data-layout operators: z-order clustering for multi-column data skipping.

At 100 TB the dominant read cost is scan pruning: parquet min/max
footer stats only skip files when the data is clustered on the filter
columns. Sorting clusters ONE column; z-ordering (Morton interleave)
clusters SEVERAL at once — files end up covering small hyper-rectangles
of the key space, so range filters on ANY of the z-ordered columns
prune files. This is the same layout trick Delta/Iceberg expose as
``OPTIMIZE ... ZORDER BY``; here it is plain Spark: compute the Morton
key, ``repartitionByRange`` on it (range exchange → contiguous key
spans per output file), sort within partitions, write.

The Morton key is pure 64-bit integer bit-arithmetic (shift/and/or) —
bit-identical across engines, so the key itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-number bit spread: 16 bits -> even bit positions of 32
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to even bit positions (classic
    Morton magic-number sequence — 4 shift/mask rounds, no loops/UDFs)."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_key(a: Column, b: Column) -> Column:
    """Interleave two 16-bit dimensions into one 32-bit Morton key
    (a in even bits, b in odd bits)."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def zorder_events(events: DataFrame) -> DataFrame:
    """Morton key over (user_id, floor(value)) — the two columns an
    events workload filters on. Map-only projection; the key is what
    ``write_zordered`` ranges on."""
    a = F.col("user_id").cast("long")
    b = F.floor("value").cast("long")
    return events.select(
        "event_id",
        a.alias("user_id"),
        b.alias("value_bucket"),
        morton_key(a, b).alias("zkey"),
    )


def write_zordered(
    df: DataFrame, path: str, n_files: int = 8
) -> None:
    """Cluster ``df`` (must carry a ``zkey`` column) into ``n_files``
    z-ordered parquet files: range-partition on the key so each file
    owns a contiguous Morton span, then sort within partitions so
    row-group stats are tight too."""
    (
        df.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
