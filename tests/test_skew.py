"""Salted-join / salted-distinct equivalence with skewed data."""

import pyspark.sql.functions as F
import pytest

from rawdata_client_provider_gcs_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 50k rows, 90% on one hot key
    big = spark.range(50000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("name")
    )
    return big, small


def test_salted_inner_join_equals_plain(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k")
    salted = salted_join(big, small, on="k", salt=8)
    assert salted.count() == plain.count()
    assert plain.exceptAll(salted.select(*plain.columns)).count() == 0
    assert salted.select(*plain.columns).exceptAll(plain).count() == 0


def test_salted_left_join_equals_plain(spark, skewed):
    big, small = skewed
    sm = small.filter(F.col("k") < 50)  # force unmatched big rows
    plain = big.join(sm, "k", "left")
    salted = salted_join(big, sm, on="k", salt=8, how="left")
    assert salted.count() == plain.count()
    assert plain.exceptAll(salted.select(*plain.columns)).count() == 0


def test_salted_count_distinct_exact(spark, skewed):
    big, _ = skewed
    df = big.select("k", (F.col("payload") % 1000).alias("v"))
    expected = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    got = {
        r["k"]: r["n_distinct"]
        for r in salted_count_distinct(df, "k", "v", salt=8).collect()
    }
    assert got == expected
