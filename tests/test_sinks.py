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
