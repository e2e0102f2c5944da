"""Sinks: partitioned parquet pruning + bucketed join with zero shuffles."""

from __future__ import annotations

import pyspark.sql.functions as F

from clusterforge_spark.plans import explain as X
from clusterforge_spark.sources.readers import load_table
from clusterforge_spark.sources.sinks import read_table, write_bucketed, write_parquet

from tests.conftest import SF_DIR


def test_partitioned_parquet_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_parquet(docs, out, partition_by=["lang"])
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # partition predicate prunes directories (no lang column in data files)
    en = back.filter(F.col("lang") == "en")
    assert en.count() == docs.filter(F.col("lang") == "en").count()
    plan = X.plan_string(en, "formatted")
    assert "PartitionFilters" in plan


def test_bucketed_join_has_no_shuffle(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", "l_orderkey", num_buckets=4, sort_col="l_orderkey")
    write_bucketed(od, "od_bucketed", "o_orderkey", num_buckets=4, sort_col="o_orderkey")
    a = read_table(spark, "li_bucketed")
    b = read_table(spark, "od_bucketed")
    joined = a.join(b, a.l_orderkey == b.o_orderkey)
    # bucket co-location: the sort-merge join needs no exchange at all
    assert X.exchange_count(joined) == 0
    assert joined.count() == li.join(od, li.l_orderkey == od.o_orderkey).count()


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    from clusterforge_spark.sources.readers import read_jsonl, TABLE_SCHEMAS
    import pyspark.sql.types as T

    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_jsonl")
    docs.write.mode("overwrite").json(out)
    schema = TABLE_SCHEMAS["documents"]
    back = read_jsonl(spark, out, schema)
    assert back.count() == docs.count()
    assert back.schema == schema
    # malformed rows are dropped, not fatal
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "x.json").write_text('{"doc_id": 1, "text": "ok"}\n{broken\n')
    got = read_jsonl(spark, str(bad), schema).collect()
    assert [r.doc_id for r in got] == [1]


def test_orc_roundtrip(spark, tmp_path):
    from clusterforge_spark.sources.sinks import write_orc

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    out = str(tmp_path / "li_orc")
    write_orc(li, out)
    back = spark.read.orc(out)
    assert back.count() == li.count()
    import pyspark.sql.functions as F
    assert (
        back.agg(F.sum("l_quantity")).collect()[0][0]
        == li.agg(F.sum("l_quantity")).collect()[0][0]
    )


def test_jsonl_permissive_captures_corrupt_records(spark, tmp_path):
    """PERMISSIVE mode quarantines bad lines into _corrupt_record instead
    of dropping them — the audit-trail policy for ingest at scale."""
    import pyspark.sql.types as T

    from clusterforge_spark.sources.readers import read_jsonl

    bad = tmp_path / "mixed"
    bad.mkdir()
    (bad / "x.json").write_text('{"doc_id": 1, "text": "ok"}\n{broken json\n')
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    rows = read_jsonl(spark, str(bad), schema, mode="PERMISSIVE").collect()
    good = [r for r in rows if r._corrupt_record is None]
    quarantined = [r for r in rows if r._corrupt_record is not None]
    assert [r.doc_id for r in good] == [1]
    assert len(quarantined) == 1 and "broken" in quarantined[0]._corrupt_record


def test_jsonl_roundtrip(spark, tmp_path):
    from clusterforge_spark.sources.readers import read_jsonl
    from clusterforge_spark.sources.sinks import write_jsonl

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out, docs.schema)
    a = {r.doc_id: (r.text, r.lang, r.source) for r in docs.collect()}
    b = {r.doc_id: (r.text, r.lang, r.source) for r in back.collect()}
    assert a == b


def test_compact_small_files(spark, tmp_path):
    import glob

    from clusterforge_spark.sources.sinks import compact_small_files

    li = load_table(spark, SF_DIR, "lineitem")
    out = str(tmp_path / "shattered")
    li.repartition(32).write.parquet(out)
    before = len(glob.glob(out + "/*.parquet"))
    n_rows = li.count()
    n_out = compact_small_files(spark, out, target_bytes=10 * 1024 * 1024)
    after = len(glob.glob(out + "/*.parquet"))
    assert before == 32
    assert after == n_out < before
    assert spark.read.parquet(out).count() == n_rows


def test_jsonl_roundtrip_preserves_aggregates(spark, documents, tmp_path):
    from pyspark.sql import functions as F

    from clusterforge_spark.sources.sinks import roundtrip_jsonl_doc_stats

    got = {
        r["lang"]: (r["n_docs"], r["sum_chars"], r["sum_text_len"], r["n_sources"])
        for r in roundtrip_jsonl_doc_stats(documents, base_dir=str(tmp_path)).collect()
    }
    want = {
        r["lang"]: (r["n_docs"], r["sum_chars"], r["sum_text_len"], r["n_sources"])
        for r in documents.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.length("text")).cast("long").alias("sum_text_len"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_orc_roundtrip_preserves_exact_money(spark, orders, tmp_path):
    from clusterforge_spark.sources.sinks import roundtrip_orc_order_stats

    rows = roundtrip_orc_order_stats(orders, base_dir=str(tmp_path)).collect()
    assert {r["o_orderstatus"] for r in rows} == {"P", "O", "F"}
    assert sum(r["n_orders"] for r in rows) == orders.count()
    assert all(r["first_date"] <= r["last_date"] for r in rows)


def test_schema_evolution_merge_nulls_old_rows(spark, tmp_path):
    """mergeSchema read: pre-evolution rows surface with NULL in the
    added column, post-evolution rows keep their derived value, and no
    row is lost across the two differently-shaped batches."""
    import hashlib

    from clusterforge_spark.sources.sinks import (
        EVOLUTION_CHANNELS,
        roundtrip_schema_evolution,
    )

    rows = [(i, "O", 10.0 + i) for i in range(1, 41)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    out = roundtrip_schema_evolution(orders, base_dir=str(tmp_path)).collect()

    def batch(okey):
        return int(hashlib.md5(str(okey).encode()).hexdigest()[:15], 16) % 2

    v1 = [i for i, _, _ in rows if batch(i) == 0]
    v2 = [i for i, _, _ in rows if batch(i) == 1]
    got = {r["o_channel"]: r["n_orders"] for r in out}
    assert got.get(None) == len(v1)
    assert sum(n for c, n in got.items() if c is not None) == len(v2)
    expect_chans = {EVOLUTION_CHANNELS[i % 3] for i in v2}
    assert {c for c in got if c is not None} == expect_chans
