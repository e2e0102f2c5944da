"""Physical-plan inspection helpers.

Used by tests (and tuning sessions) to assert the plans we designed for
are the plans we got: filters pushed into the parquet scan, projections
pruned to the read schema, small dimensions broadcast, top-k planned as
TakeOrderedAndProject instead of a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the formatted plan."""
    plan = plan_string(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def read_schema(df: DataFrame) -> str:
    plan = plan_string(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "ReadSchema" in line)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df, "simple")


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in plan_string(df, "simple")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower = fewer shuffles)."""
    plan = plan_string(df, "simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line and "reused" not in line.lower()
    )
