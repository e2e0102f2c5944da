#!/usr/bin/env python3
"""Regenerate the committed artifact registry from the raw tables.

Run this whenever a builder's SEMANTICS change (with or without an
ARTIFACT_VERSION bump) so the committed parquet under
spark-warehouse/models/ always matches what the current code would
produce — the same invariant the rebuild-vs-stored identity gate
(tests/test_persistence.py::test_committed_artifacts_match_fresh_rebuild
and scripts/selfcheck_artifacts.py) enforces.

--force deletes each artifact slot first, so even fingerprint-valid
artifacts are rebuilt (needed when semantics change without a version
or parameter change).

Usage:  python3 scripts/rebuild_registry.py [--force] [sf_dir ...]
        (default sf_dirs: /root/testdata/sf0.001 sf0.01 sf0.1)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    args = sys.argv[1:]
    force = "--force" in args
    sf_dirs = [a for a in args if not a.startswith("--")] or DEFAULT_SFS

    import __spark_entry__ as E
    from clusterforge_spark import model_store as MS
    from clusterforge_spark.session import get_spark

    spark = get_spark("clusterforge-rebuild-registry")
    root = MS.default_model_dir()
    qs = E.queries()
    for sf in sf_dirs:
        tag = os.path.basename(sf.rstrip("/"))
        if force:
            for name in E.ARTIFACT_BUILDERS:
                shutil.rmtree(os.path.join(root, tag, name), ignore_errors=True)
        E.release(spark, sf)
        for qname in sorted(set(E.ARTIFACT_BUILDERS.values())):
            t0 = time.perf_counter()
            qs[qname](spark, sf).write.format("noop").mode("overwrite").save()
            print(f"{tag} {qname}: {time.perf_counter() - t0:.2f}s", flush=True)
        E.release(spark, sf)
        built = {
            r.artifact: r.status
            for r in MS.registry_report(spark, root).collect()
            if r.snapshot == tag
        }
        bad = {n: s for n, s in built.items() if s != "valid"}
        # a best-effort save that silently failed (ensure_artifact falls
        # back to the in-session build and only logs) leaves the slot
        # ABSENT — registry_report can't see it, so require every
        # registered builder to have produced a slot (the MISSING check
        # from scripts/selfcheck_artifacts.py, r10 ADVICE fix)
        missing = sorted(set(E.ARTIFACT_BUILDERS) - set(built))
        print(
            f"{tag}: {len(built)} artifacts, invalid: {bad or 'none'}, "
            f"missing: {missing or 'none'}",
            flush=True,
        )
        if bad or missing:
            return 1
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
