#!/usr/bin/env python3
"""Diff the driver's CORRECTNESS_r{N}.json against the local self-check
replica for the driver's sampled query set, and fail loudly on ANY
verdict divergence.

Motivation: 73/166 contract queries rest solely on the local replica
(scripts/check_correctness.py) between driver rounds, and the driver's
environment has diverged from the replica before (the r2
TIMESTAMP(NANOS) testdata-encoding episode turned a locally-green
temporal family driver-red). Running this each round on the latest
driver record catches such environment drift the same day it appears
instead of a round later.

For every query the driver sampled:
  driver verdict = pass (rows+schema+hash all true, no err),
                   no_oracle (hash_match null, rows>0), or fail
  local  verdict = PASS / ok? / FAIL from the replica run at sf0.01
A divergence is any (driver pass, local fail), (driver fail, local
pass), or either side erroring where the other is green.

Usage:  python scripts/diff_driver_check.py [CORRECTNESS_rNN.json]
        (default: the lexically-latest CORRECTNESS_r*.json in the repo)
Writes: DRIVER_DIFF_r{N}.md next to the input; exit 1 on divergence.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CHECK", "/root/testdata/sf0.01")


def driver_verdict(rec: dict) -> str:
    # the driver records rows-only queries as err="no_oracle" (by design,
    # not a failure); any other err string is a real execution error
    if rec.get("err") and rec.get("err") != "no_oracle":
        return "fail"
    if rec.get("hash_match") is None:
        return "no_oracle" if (rec.get("spark_rows") or 0) > 0 else "fail"
    ok = rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match")
    return "pass" if ok else "fail"


def main() -> int:
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        cands = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
        if not cands:
            print("no CORRECTNESS_r*.json found", file=sys.stderr)
            return 2
        path = cands[-1]
    with open(path) as fh:
        driver = json.load(fh)
    names = sorted(driver)
    print(f"driver record: {path} ({len(names)} sampled queries)")

    # one replica run over exactly the driver's sample
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_correctness.py"), SF_DIR, *names],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    local: dict[str, str] = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"(PASS|FAIL|ok\?)\s+(\S+)", line)
        if m:
            status, name = m.groups()
            name = name.rstrip(":")
            local[name] = {"PASS": "pass", "ok?": "no_oracle", "FAIL": "fail"}[status]

    rows, diverged = [], []
    for name in names:
        dv = driver_verdict(driver[name])
        lv = local.get(name, "missing")
        agree = (dv == lv) or {dv, lv} == {"pass", "no_oracle"}
        if not agree:
            diverged.append(name)
        rows.append((name, dv, lv, "ok" if agree else "DIVERGED"))

    rnd = re.search(r"_r(\d+)", os.path.basename(path))
    out_md = os.path.join(REPO, f"DRIVER_DIFF_r{rnd.group(1) if rnd else 'X'}.md")
    with open(out_md, "w") as fh:
        fh.write(f"# Driver-vs-replica verdict diff — {os.path.basename(path)}\n\n")
        fh.write(f"Replica run at `{SF_DIR}` (exit {proc.returncode}).\n\n")
        fh.write("| query | driver | local replica | agreement |\n|---|---|---|---|\n")
        for r in rows:
            fh.write("| " + " | ".join(r) + " |\n")
        fh.write(
            f"\n**{len(diverged)} divergences**"
            + (f": {diverged}\n" if diverged else " — environments agree.\n")
        )
    print(f"wrote {out_md}; {len(diverged)} divergences"
          + (f": {diverged}" if diverged else ""))
    return 1 if diverged else 0


if __name__ == "__main__":
    raise SystemExit(main())
