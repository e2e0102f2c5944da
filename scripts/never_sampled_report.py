#!/usr/bin/env python3
"""Enumerate the never-driver-sampled queries and record a dated local
verdict for each (round-7 verdict item 2).

The driver's correctness gate samples ~50 queries per round
(CORRECTNESS_r*.json); everything else rests on the local replica
between rounds. This script closes that blind spot ON RECORD:

1. derive the never-sampled set = queries() minus the union of every
   CORRECTNESS_r*.json key set;
2. run the local replica (scripts/check_correctness.py) on EXACTLY that
   set at the given sf_dir;
3. write NEVER_SAMPLED_r{N}.md — one dated verdict line per member.

Usage: python scripts/never_sampled_report.py <round> [sf_dir]
"""

from __future__ import annotations

import datetime
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def never_sampled() -> list[str]:
    import __spark_entry__ as E

    sampled: set[str] = set()
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        sampled |= set(json.load(open(f)))
    return sorted(set(E.queries()) - sampled)


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    names = never_sampled()
    print(f"{len(names)} never-driver-sampled queries; running replica...")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_correctness.py"), sf_dir]
        + names,
        capture_output=True,
        text=True,
    )
    verdicts: dict[str, str] = {}
    for line in (proc.stdout + proc.stderr).replace("\r", "\n").splitlines():
        m = re.match(r"^(PASS|ok\?|FAIL)\s+(\S+?):?\s(.*)", line)
        if m and m.group(2).rstrip(":") in names:
            verdicts[m.group(2).rstrip(":")] = f"{m.group(1)} {m.group(3)}"
    today = datetime.date.today().isoformat()
    out = [
        f"# NEVER_SAMPLED_r{rnd:02d} — the driver's blind spot, verified on record",
        "",
        f"Queries never sampled by ANY driver round (CORRECTNESS_r01..r{rnd - 1:02d}"
        f" union vs the current contract), each run through the local replica"
        f" (`scripts/check_correctness.py`, Spark vs DuckDB oracle, order-insensitive"
        f" value compare) at `{sf_dir}` on {today}:",
        "",
        "| query | local verdict (dated {d}) |".format(d=today),
        "|---|---|",
    ]
    missing = []
    for n in names:
        v = verdicts.get(n)
        if v is None:
            missing.append(n)
            v = "NO VERDICT CAPTURED"
        out.append(f"| {n} | {v} |")
    fails = [n for n in names if verdicts.get(n, "").startswith("FAIL")]
    out += [
        "",
        f"Summary: {len(names)} enumerated, "
        f"{sum(1 for n in names if verdicts.get(n, '').startswith('PASS'))} oracle-exact PASS, "
        f"{sum(1 for n in names if verdicts.get(n, '').startswith('ok?'))} rows-only by design, "
        f"{len(fails)} FAIL, {len(missing)} uncaptured.",
        "",
    ]
    path = os.path.join(REPO, f"NEVER_SAMPLED_r{rnd:02d}.md")
    open(path, "w").write("\n".join(out))
    print(f"wrote {path}: {len(names)} queries, {len(fails)} FAIL, {len(missing)} uncaptured")
    return 1 if (fails or missing) else 0


if __name__ == "__main__":
    raise SystemExit(main())
