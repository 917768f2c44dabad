"""Co-located join via bucketing: two tables bucketed identically on
the join key must join with NO shuffle — the physical plan carries a
SortMergeJoin whose children are bucket scans, zero Exchange nodes.
This is the plan-level proof of the 'bucketing for co-located joins'
scale strategy (ledger vs incoming batch at 100 TB)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    from deduper_spark.sinks.writers import write_bucketed
    from deduper_spark.sources.readers import read_bucketed

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .select("l_orderkey", "l_partkey", "l_quantity")
    od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet") \
        .select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", ("l_orderkey",), 8,
                   sort_cols=("l_orderkey",), path=str(tmp_path / "li"))
    write_bucketed(od.withColumnRenamed("o_orderkey", "l_orderkey"),
                   "od_b", ("l_orderkey",), 8,
                   sort_cols=("l_orderkey",), path=str(tmp_path / "od"))
    try:
        joined = read_bucketed(spark, "li_b").join(
            read_bucketed(spark, "od_b"), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan          # co-located: zero shuffles
        assert "SelectedBucketsCount: 8 out of 8" in plan
        # and the result is right (vs the plain shuffled join)
        expect = li.join(od, li.l_orderkey == od.o_orderkey).count()
        assert joined.count() == expect
        # the same join WITHOUT bucketing does shuffle — the baseline
        plain = li.join(od.withColumnRenamed("o_orderkey", "l_orderkey"),
                        "l_orderkey")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
        # bucket-local aggregation also skips the exchange
        agg = (read_bucketed(spark, "li_b")
               .groupBy("l_orderkey").agg(F.sum("l_quantity")))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS od_b")
