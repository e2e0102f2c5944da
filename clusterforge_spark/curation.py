"""End-to-end corpus curation run: gates → dedup → canonical → outputs.

The LLM-era analog of the reference's segmentation pipeline
(pipeline.py / main.rs): one orchestrated pass that takes a raw document
table and materializes

* ``curated/``  — the documents a training run would consume,
* ``rejects/``  — every dropped document with the FIRST gate that
  rejected it (the audit trail a data-governance review needs),
* a small report DataFrame (one row per pipeline stage with counts),

by chaining the operators this engine already ships: the sequential
quality gates of :func:`operators.text.quality_funnel` (language,
benchmark holdout, quality floor, Gopher repetition caps, n-gram
decontamination), banded-MinHash near-dup detection, connected
components, and per-component canonical selection.

Scale posture: every stage is the same candidate-bounded /
map-side-combinable shape as its underlying operator; the only
materializations are the two output writes, the (tiny) component table
the canonical join consumes, and two narrow corpus-sized checkpoints
(the per-doc gate labels and canonical flags — two columns each, the
intermediate a real pipeline would land as its own table; on a cluster,
swap ``localCheckpoint`` for a parquet write of the same frame).
Nothing here collects the corpus to the driver.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clusterforge_spark.operators import dedup as DD
from clusterforge_spark.operators.text import funnel_gate_labels


@dataclass
class CurationResult:
    n_input: int
    n_kept: int
    n_rejected: int
    report: DataFrame
    timings: dict = field(default_factory=dict)


def run_curation_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    out_dir: str,
) -> CurationResult:
    """Run the full curation pass and write curated/rejects parquet under
    ``out_dir``. Returns counts, stage timings, and the report frame."""
    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    n_input = documents.count()
    labels = funnel_gate_labels(documents).localCheckpoint(eager=True)
    timings["gates"] = time.perf_counter() - t0

    survivors = documents.join(
        labels.filter(F.col("gate") == "kept").select("doc_id"), "doc_id"
    )

    t0 = time.perf_counter()
    pairs = DD.dedup_minhash_banded(survivors)
    canon = DD.dedup_canonical(survivors, pairs).localCheckpoint(eager=True)
    timings["dedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    kept_ids = canon.filter(F.col("is_canonical")).select("doc_id")
    curated = documents.join(kept_ids, "doc_id")
    curated.write.mode("overwrite").parquet(f"{out_dir.rstrip('/')}/curated")

    dup_rejects = (
        canon.filter(~F.col("is_canonical"))
        .select("doc_id", F.lit("near_duplicate").alias("gate"))
    )
    gate_rejects = labels.filter(F.col("gate") != "kept").select("doc_id", "gate")
    rejects = gate_rejects.unionByName(dup_rejects)
    rejects.write.mode("overwrite").parquet(f"{out_dir.rstrip('/')}/rejects")
    timings["write"] = time.perf_counter() - t0

    curated_back = spark.read.parquet(f"{out_dir.rstrip('/')}/curated")
    rejects_back = spark.read.parquet(f"{out_dir.rstrip('/')}/rejects")
    n_kept = curated_back.count()
    n_rejected = rejects_back.count()

    report = (
        rejects_back.groupBy("gate")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .unionByName(
            spark.createDataFrame([("kept", n_kept)], "gate string, n_docs long")
        )
    )
    return CurationResult(
        n_input=n_input,
        n_kept=n_kept,
        n_rejected=n_rejected,
        report=report,
        timings=timings,
    )
