"""CLI mirroring the reference's clap interface (cli.rs:8-37):

  --input PATH        transactions CSV (retail schema) or a testdata dir
  --clusters K        k ∈ [3,5], default 4
  --max-iters N       default 300
  --tolerance T       default 1e-4
  --predict "R,F,M"   classify one RFM triple instead of reporting
  --reference-date    recency anchor (default mirrors data source)
  --seed              (improvement over the reference's thread RNG)

Mode dispatch matches main.rs:21-25: --predict present → predict mode,
else full pipeline + stats report.
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_rfm_values(s: str) -> tuple[float, float, float]:
    """Parse "R,F,M" with per-field errors (cli.rs:42-66 semantics)."""
    parts = [p.strip() for p in s.split(",")]
    if len(parts) != 3:
        raise ValueError(
            f"expected 3 comma-separated values (recency,frequency,monetary), got {len(parts)}"
        )
    out = []
    for name, p in zip(("recency", "frequency", "monetary"), parts):
        try:
            out.append(float(p))
        except ValueError as exc:
            raise ValueError(f"invalid {name} value: {p!r}") from exc
    return tuple(out)  # type: ignore[return-value]


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="clusterforge-spark",
        description="Customer segmentation via RFM + K-means on PySpark",
    )
    ap.add_argument("--input", required=True, help="retail CSV path or testdata sf dir")
    ap.add_argument("--clusters", type=int, default=4)
    ap.add_argument("--max-iters", type=int, default=300)
    ap.add_argument("--tolerance", type=float, default=1e-4)
    ap.add_argument("--predict", default=None, help='"R,F,M" triple to classify')
    ap.add_argument("--reference-date", default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--output",
        default="cluster_plot.png",
        help="visualization PNG path (cli.rs:19 default; a _sizes.png "
        "companion is written next to it); 'none' disables",
    )
    ap.add_argument(
        "--model",
        default=None,
        help="model dir: full mode saves the fitted scaler+centroids "
        "there; predict mode loads it and skips the refit (the "
        "reference refits per predict, main.rs:44-52)",
    )
    ap.add_argument(
        "--curate",
        default=None,
        metavar="OUT_DIR",
        help="engine extension (not in the reference CLI): run the "
        "corpus-curation pipeline over --input's documents table and "
        "write curated/ + rejects/ parquet plus a per-gate report "
        "under OUT_DIR",
    )
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        point = parse_rfm_values(args.predict) if args.predict else None
    except ValueError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2

    from clusterforge_spark.operators.features import DEFAULT_REF_INSTANT
    from clusterforge_spark.pipeline import (
        format_report,
        load_events_rfm,
        load_retail_rfm,
        run_full_pipeline,
        run_prediction,
    )
    from clusterforge_spark.session import get_spark

    spark = get_spark("clusterforge-cli")
    try:
        if args.curate:
            if not os.path.isdir(args.input):
                print("error: --curate requires --input to be a testdata dir "
                      "containing documents.parquet", file=sys.stderr)
                return 2
            from clusterforge_spark.curation import run_curation_pipeline
            from clusterforge_spark.sources.readers import load_table

            docs = load_table(spark, args.input, "documents")
            res = run_curation_pipeline(spark, docs, args.curate)
            print(f"Curation complete: {res.n_input} in, "
                  f"{res.n_kept} kept, {res.n_rejected} rejected")
            for r in sorted(res.report.collect(), key=lambda r: -r.n_docs):
                print(f"  {r.gate:<18} {r.n_docs}")
            for stage, secs in res.timings.items():
                print(f"  [{stage}] {secs:.2f}s")
            return 0
        if os.path.isdir(args.input):
            rfm = load_events_rfm(spark, args.input)
            n_rows = -1
        else:
            ref = args.reference_date or "2011-12-09 00:00:00"  # data.rs:98 default
            rfm = load_retail_rfm(spark, args.input, ref)
            n_rows = -1

        if point is not None:
            cluster, res = run_prediction(
                spark, rfm, point, k=args.clusters, seed=args.seed,
                max_iter=args.max_iters, tol=args.tolerance,
                model_path=args.model,
            )
            sizes = {c: (s, p) for c, s, p in res.cluster_sizes}
            size, pct = sizes.get(cluster, (0, 0.0))
            print(f"Predicted cluster: {cluster}")
            print(f"Cluster size: {size} customers ({pct:.1f}%)")
            print("Cluster centroid (scaled): "
                  + ", ".join(f"{v:.4f}" for v in res.centroids[cluster]))
        else:
            res = run_full_pipeline(
                spark, rfm, n_rows=n_rows, k=args.clusters, seed=args.seed,
                max_iter=args.max_iters, tol=args.tolerance,
                model_path=args.model,
            )
            print(format_report(res))
            if args.output and args.output.lower() != "none":
                from clusterforge_spark.viz import generate_visualization_report

                generate_visualization_report(res, args.output)
        return 0
    except ValueError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 1
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
