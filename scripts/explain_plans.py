#!/usr/bin/env python3
"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage: python scripts/explain_plans.py <tag> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each named query (default:
every query). The explain output is the ANALYZED physical plan as Spark
prints it (AdaptiveSparkPlan isFinalPlan=false before execution — the
plan shape the optimizer chose; AQE runtime rewrites are noted in
OPTIMIZATION notes where they matter).

Queries that execute eagerly at build time (streaming replays, iterative
graph loops) still produce a plan for their RETURNED frame; the eager
part is profiled separately in the bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = sys.argv[3:]

    import __spark_entry__ as E
    from clusterforge_spark.session import get_spark

    spark = get_spark("explain-plans", shuffle_partitions=8)
    qs = E.queries()
    names = only or list(qs)
    out_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
