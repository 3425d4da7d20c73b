"""Bucketed data layout: co-located joins and aggregations.

The 100-TB claim behind ``ParquetCatalog.write_bucketed`` is that two
stages bucketed identically on a key join with ZERO Exchange and
aggregate on that key with ZERO Exchange — the shuffle is paid once at
write time.  These tests pin that claim on the executed plan, and check
the join output against the plain (shuffling) join byte-for-byte.
"""

import pytest
from pyspark.sql import functions as F

from selfclean_spark.catalog import ParquetCatalog, StageMetrics


def _m(name):
    return StageMetrics(name, 0, -1, 1.0, 0, "cfg", 0.0, 0.0)


@pytest.fixture()
def bucketed(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "lake"))
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.pmod(F.col("id"), F.lit(7)).alias("v")
    )
    stats = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("w")
    )
    a = cat.write_bucketed("docs_b", docs, _m("docs_b"), buckets=8, key="doc_id")
    b = cat.write_bucketed("stats_b", stats, _m("stats_b"), buckets=8, key="doc_id")
    yield cat, a, b, docs, stats


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_cokeyed_join_has_no_exchange(spark, bucketed):
    _, a, b, docs, stats = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "doc_id").select("doc_id", "v", "w")
        plan = _executed(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # byte-identical to the plain shuffling join
        expected = sorted(
            docs.join(stats, "doc_id").select("doc_id", "v", "w").collect()
        )
        assert sorted(j.collect()) == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_key_aggregation_has_no_exchange(spark, bucketed):
    _, a, _, docs, _ = bucketed
    g = a.groupBy("doc_id").agg(F.sum("v").alias("sv"))
    plan = _executed(g)
    assert "Exchange" not in plan, plan
    assert g.count() == docs.count()


def test_catalog_read_preserves_bucket_spec(spark, bucketed):
    cat, _, _, docs, _ = bucketed
    # a fresh read through the catalog must still plan Exchange-free
    re_read = cat.read("docs_b")
    plan = _executed(re_read.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c")))
    assert "Exchange" not in plan, plan
    assert re_read.count() == docs.count()
