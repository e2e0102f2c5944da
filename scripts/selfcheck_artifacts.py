#!/usr/bin/env python3
"""Rebuild-vs-stored identity gate over the committed artifact registry
(round-8 verdict item 1).

The registry's fingerprints validate corpus shape + every derivation
parameter, but a builder-semantics change WITHOUT a parameter change
serves stale bytes unless someone remembers to bump ARTIFACT_VERSION.
This script closes that gap on record: for every committed artifact at
each scale, re-run its builder from the raw tables into a SCRATCH
registry and assert the rebuilt data is row-identical to the committed
copy (schema-equal, order-insensitive, exact values). Also re-verifies
each committed artifact's own meta (row count + content crc).

Prints one verdict line per (scale, artifact) and a summary; exit 1 on
any divergence. Results are pasted into SELFCHECK_r{N}.md.

Usage:  python3 scripts/selfcheck_artifacts.py [sf_dir ...]
        (default: /root/testdata/sf0.001 /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")

DEFAULT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def main() -> int:
    sf_dirs = sys.argv[1:] or DEFAULT_SFS

    import __spark_entry__ as E
    from clusterforge_spark import model_store as MS
    from clusterforge_spark.session import get_spark

    committed_root = MS.default_model_dir()
    scratch = tempfile.mkdtemp(prefix="cf_selfcheck_registry_")
    os.environ["SPARK_GRAFT_MODEL_DIR"] = scratch
    spark = get_spark("clusterforge-selfcheck-artifacts")
    qs = E.queries()
    failures: list[str] = []
    try:
        for sf in sf_dirs:
            tag = os.path.basename(sf.rstrip("/"))
            E.release(spark, sf)
            t0 = time.perf_counter()
            for qname in sorted(set(E.ARTIFACT_BUILDERS.values())):
                qs[qname](spark, sf).write.format("noop").mode("overwrite").save()
            E.release(spark, sf)
            build_s = time.perf_counter() - t0
            print(f"{tag}: rebuilt all builders in {build_s:.1f}s", flush=True)
            for name in sorted(E.ARTIFACT_BUILDERS):
                stored = os.path.join(committed_root, tag, name)
                rebuilt = os.path.join(scratch, tag, name)
                if not os.path.isdir(stored):
                    failures.append(f"{tag}/{name}: MISSING in committed registry")
                    print(f"MISSING   {tag}/{name}", flush=True)
                    continue
                if not os.path.isdir(rebuilt):
                    failures.append(f"{tag}/{name}: builder produced no artifact")
                    print(f"NOBUILD   {tag}/{name}", flush=True)
                    continue
                self_v = MS.verify_artifact(spark, stored)
                ident = MS.artifacts_identical(spark, stored, rebuilt)
                ok = self_v == "valid" and ident
                if not ok:
                    failures.append(
                        f"{tag}/{name}: self={self_v} identical={ident}"
                    )
                print(
                    f"{'IDENTICAL' if ok else 'DIVERGED '} {tag}/{name} "
                    f"(self-verify: {self_v})",
                    flush=True,
                )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()
    n = len(sf_dirs) * len(E.ARTIFACT_BUILDERS)
    print(
        f"selfcheck: {n - len(failures)}/{n} rebuild-vs-stored identical; "
        f"failures: {failures or 'none'}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
