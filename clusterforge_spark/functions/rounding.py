"""Engine-agnostic float rounding.

``F.round`` (Spark) rounds the value's *shortest decimal representation*
half-up (java BigDecimal.valueOf), while DuckDB's ``round`` rounds the
*binary* double — on values whose shortest repr terminates exactly at the
boundary digit (common for rational formulas like token/64 or pct =
100·n/total) the two disagree by one ulp of the target scale.

The fix: round as pure IEEE arithmetic — ``floor(x·10ⁿ + 0.5)/10ⁿ`` —
identical ops on identical doubles in any engine, so results are
bit-identical by construction. Both the Spark operators and the DuckDB
oracle SQL (oracle_sql.py) use this form for every rounded float.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_det(col: Column | str, scale: int) -> Column:
    """Deterministic cross-engine rounding of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lit(float(10**scale))
    return F.floor(c * s + F.lit(0.5)) / s


def round_det_sql(expr: str, scale: int) -> str:
    """The DuckDB-side mirror of :func:`round_det`."""
    s = float(10**scale)
    return f"(floor(({expr}) * {s!r} + 0.5) / {s!r})"
