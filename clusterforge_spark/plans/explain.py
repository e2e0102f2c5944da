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


def _partitionless_window_specs_text(df: DataFrame) -> list[str]:
    """String-parse fallback of :func:`partitionless_window_specs`
    (pre-r7 implementation): scans ``optimizedPlan().toString()`` for
    ``windowspecdefinition`` whose first top-level arg is already a sort
    spec or the frame. Kept as the fallback because plan-string
    truncation of long field lists could silently mis-classify — the
    JVM node walk is authoritative."""
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


#: times the JVM plan walk threw and the text-parser fallback ran —
#: the contract-wide sweep test asserts this stays 0 so drift is loud
JVM_WALK_FALLBACKS = 0


def window_spec_arities(df: DataFrame) -> list[tuple[int, str, str]]:
    """(partition-spec size, first partition expr, first order expr) for
    every Window node in the optimized logical plan — lets plan tests
    assert HOW a window is keyed, not just that a partition exists
    (e.g. the token_budget_mix large regime: a per-source fill window
    must be keyed by (source, bucket/tie-group), never source alone
    over the full data). No fallback: a JVM drift should fail the plan
    test loudly."""
    out: list[tuple[int, str, str]] = []

    def _walk(node) -> None:
        # The walk STARTS in the optimized logical plan, where only the
        # logical "Window" node exists — but an InMemoryRelation's
        # cachedPlan() is the cached query's PHYSICAL plan, so beneath a
        # .cache() boundary the walk crosses into physical territory and
        # the physical spellings (WindowExec / WindowInPandasExec,
        # InMemoryTableScanExec, AdaptiveSparkPlanExec) become reachable
        # (r9: documented after a review read them as dead branches —
        # they fire exactly when a window sits inside a cached sub-plan,
        # e.g. a memoized fill table).
        cls = node.getClass().getSimpleName()
        if cls in ("Window", "WindowExec", "WindowInPandasExec"):
            part = node.partitionSpec()
            order = node.orderSpec()
            out.append(
                (
                    part.size(),
                    str(part.apply(0)) if part.size() else "",
                    str(order.apply(0)) if not order.isEmpty() else "",
                )
            )
        elif cls == "InMemoryRelation":
            _walk(node.cachedPlan())
        elif cls == "InMemoryTableScanExec":
            _walk(node.relation())
        elif cls == "AdaptiveSparkPlanExec":
            _walk(node.inputPlan())
        kids = node.children()
        for i in range(kids.size()):
            _walk(kids.apply(i))
        subs = node.subqueries()
        for i in range(subs.size()):
            _walk(subs.apply(i))

    _walk(df._jdf.queryExecution().optimizedPlan())
    return out


def partitionless_window_specs(df: DataFrame) -> list[str]:
    """Every Window node in the OPTIMIZED logical plan whose
    partitionSpec is EMPTY — i.e. a window that plans as a
    single-partition exchange + one-task sort over its whole input
    (Spark's WindowExec emits a runtime warning for exactly this).

    Walks the JVM plan tree (children + subquery plans) and reads each
    Window node's ``partitionSpec().isEmpty()`` directly — immune to the
    plan-string truncation that could make the older text parser
    silently classify a data-proportional window as partitioned. Each
    hit is reported as its first ORDER BY sort-order string (e.g.
    ``_b#123L ASC NULLS FIRST`` — same shape the text parser returned,
    so allowlists keyed on prefixes like ``_b#`` keep working), or
    ``specifiedwindowframe`` when the window has no ordering. Falls back
    to the text parser if the JVM walk throws (py4j API drift); the
    contract-wide sweep test's exact-equality allowlist catches a
    silently-empty result either way.

    Used by the contract-wide sweep test: data-proportional operators
    must never plan one of these (calendar-bounded / k-row inputs are
    allowlisted per query).
    """
    try:
        out: list[str] = []
        seen: set[tuple[int, str]] = set()
        jvm_system = df._sc._jvm.java.lang.System  # type: ignore[attr-defined]

        def _walk(node) -> None:
            # plans are trees (no cycles), but subqueries() can surface
            # the same plan twice — dedupe on JVM IDENTITY, never the
            # structural case-class hashCode: equal-content but distinct
            # nodes must each be visited (a structural-hash collision
            # would silently skip an unvisited subtree and let a
            # data-proportional window ship), and identityHashCode is
            # O(1) where the recursive structural hash is O(subtree)
            key = (jvm_system.identityHashCode(node), node.getClass().getName())
            if key in seen:
                return
            seen.add(key)
            cls = node.getClass().getSimpleName()
            # logical Window, or physical WindowExec/WindowInPandasExec
            # (physical nodes appear inside cached plans below)
            if cls in ("Window", "WindowExec", "WindowInPandasExec"):
                if node.partitionSpec().isEmpty():
                    order = node.orderSpec()
                    out.append(
                        str(order.apply(0))
                        if not order.isEmpty()
                        else "specifiedwindowframe"
                    )
            # a .cache()d subplan is substituted as InMemoryRelation —
            # its windows still execute once at materialization, and the
            # old text parser saw them (innerChildren are rendered), so
            # the walk must descend into the cached PHYSICAL plan too
            elif cls == "InMemoryRelation":
                _walk(node.cachedPlan())
            elif cls == "InMemoryTableScanExec":
                _walk(node.relation())
            # AQE wraps the cached physical plan in a LEAF node — its
            # real tree hangs off inputPlan(), not children()
            elif cls == "AdaptiveSparkPlanExec":
                _walk(node.inputPlan())
            kids = node.children()
            for i in range(kids.size()):
                _walk(kids.apply(i))
            subs = node.subqueries()
            for i in range(subs.size()):
                _walk(subs.apply(i))

        _walk(df._jdf.queryExecution().optimizedPlan())
        return out
    except Exception:
        # r7 ADVICE: a silent fallback would let py4j API drift quietly
        # reinstate the truncation-prone text parser — count and warn so
        # drift is visible (the sweep test asserts the counter stays 0)
        global JVM_WALK_FALLBACKS
        JVM_WALK_FALLBACKS += 1
        import logging
        import traceback

        logging.getLogger(__name__).warning(
            "partitionless_window_specs: JVM plan walk failed, falling "
            "back to the text parser (py4j API drift?):\n%s",
            traceback.format_exc(),
        )
        return _partitionless_window_specs_text(df)
