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


def _spec_args(text: str, start: int) -> list[str]:
    """Top-level comma-split of the parenthesized args beginning at
    ``text[start]`` (which must be '(')."""
    depth = 0
    args: list[str] = []
    buf: list[str] = []
    for ch in text[start:]:
        if ch == "(":
            depth += 1
            if depth == 1:
                continue
        elif ch == ")":
            depth -= 1
            if depth == 0:
                args.append("".join(buf).strip())
                return args
        elif ch == "," and depth == 1:
            args.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    return args


def partitionless_window_specs(df: DataFrame) -> list[str]:
    """Every ``windowspecdefinition`` in the OPTIMIZED plan whose
    partition-column list is EMPTY — i.e. a window that plans as a
    single-partition exchange + one-task sort over its whole input
    (Spark's WindowExec emits a runtime warning for exactly this).

    A spec's args are [partition cols..., sort specs..., frame]; sort
    specs end with 'ASC/DESC NULLS ...' and the frame is a
    'specifiedwindowframe(...)' — so a spec whose FIRST top-level arg
    is already a sort spec or the frame has no partition columns.
    Used by the contract-wide sweep test: data-proportional operators
    must never plan one of these (calendar-bounded / k-row inputs are
    allowlisted per query).
    """
    text = df._jdf.queryExecution().optimizedPlan().toString()
    out: list[str] = []
    needle = "windowspecdefinition"
    i = 0
    while True:
        i = text.find(needle, i)
        if i < 0:
            break
        args = _spec_args(text, i + len(needle))
        if args:
            first = args[0]
            is_sort = first.endswith("NULLS FIRST") or first.endswith("NULLS LAST")
            is_frame = first.startswith("specifiedwindowframe")
            if is_sort or is_frame:
                out.append(first)
        i += len(needle)
    return out
