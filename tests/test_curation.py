"""End-to-end curation pipeline: partition integrity, dup removal,
gate attribution, and report consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from clusterforge_spark.curation import run_curation_pipeline
from clusterforge_spark.operators.dedup import EXACT_DUP_OFFSET, docs_with_dups
from clusterforge_spark.sources.readers import load_table

from tests.conftest import SF_DIR


def test_curation_pipeline_end_to_end(spark, tmp_path):
    docs = docs_with_dups(load_table(spark, SF_DIR, "documents"))
    out = str(tmp_path / "curation")
    res = run_curation_pipeline(spark, docs, out)

    # exact partition: every input doc is either curated or rejected, once
    assert res.n_kept + res.n_rejected == res.n_input
    curated = spark.read.parquet(f"{out}/curated")
    rejects = spark.read.parquet(f"{out}/rejects")
    assert curated.count() == res.n_kept
    assert rejects.count() == res.n_rejected
    overlap = curated.select("doc_id").join(rejects.select("doc_id"), "doc_id")
    assert overlap.count() == 0

    # planted exact duplicates must not BOTH survive: of (orig, copy)
    # pairs that passed the gates, at most one is canonical
    kept_ids = {r.doc_id for r in curated.select("doc_id").collect()}
    for orig in range(100):
        assert not (orig in kept_ids and orig + EXACT_DUP_OFFSET in kept_ids)

    # report: one 'kept' row matching n_kept; reject rows sum to n_rejected
    rep = {r.gate: r.n_docs for r in res.report.collect()}
    assert rep["kept"] == res.n_kept
    assert sum(v for g, v in rep.items() if g != "kept") == res.n_rejected
    # the curated set is all-English (first gate)
    assert curated.filter(F.col("lang") != "en").count() == 0
    # near-duplicate rejections happened (the planted copies)
    assert rep.get("near_duplicate", 0) > 0

    # re-running is deterministic: same partition
    res2 = run_curation_pipeline(spark, docs, str(tmp_path / "curation2"))
    assert res2.n_kept == res.n_kept and res2.n_rejected == res.n_rejected
