"""Salted join must be row-identical to the plain join (operators/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.catalog import load_table
from hainan_big_data_recommend_system_spark.operators.skew import salted_join

SF_DIR = "/root/testdata/sf0.01"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(spark, how):
    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey", "l_quantity")
    part = load_table(spark, SF_DIR, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    plain = li.join(part, "l_partkey", how)
    salted = salted_join(li, part, "l_partkey", salt=8, how=how)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_rejects_right(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    part = load_table(spark, SF_DIR, "part")
    with pytest.raises(ValueError):
        salted_join(li, part, "l_partkey", how="right")
