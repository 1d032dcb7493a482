"""Bucketing removes the shuffle from co-located joins and aggregations —
the pay-once-at-ingest strategy for repeated big joins at scale."""

import pytest
from pyspark.sql import functions as F

from rawdata_client_provider_gcs_spark.sources.bucketing import (
    plan_has_exchange,
    write_bucketed,
)
from rawdata_client_provider_gcs_spark.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    orders = load_table(spark, sf_smoke_dir, "orders")
    lineitem = load_table(spark, sf_smoke_dir, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
    yield {"orders": "b_orders", "lineitem": "b_lineitem"}
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, sf_smoke_dir, bucketed_tables):
    o = spark.table(bucketed_tables["orders"])
    l = spark.table(bucketed_tables["lineitem"])
    # force SMJ so the co-location (not a broadcast) is what's proven
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(l, o.o_orderkey == l.l_orderkey).select(
            "o_orderkey", "l_quantity"
        )
        assert not plan_has_exchange(joined)

        # the same join over plain parquet DOES shuffle both sides
        po = load_table(spark, sf_smoke_dir, "orders")
        pl = load_table(spark, sf_smoke_dir, "lineitem")
        plain = po.join(pl, po.o_orderkey == pl.l_orderkey).select(
            "o_orderkey", "l_quantity"
        )
        assert plan_has_exchange(plain)

        # and results agree
        assert joined.count() == plain.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_tables):
    l = spark.table(bucketed_tables["lineitem"])
    agg = l.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    assert not plan_has_exchange(agg)
