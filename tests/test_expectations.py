"""Expectation-rule semantics (operators/expectations.py): each rule's
violation arithmetic on constructed frames with KNOWN defects.  The
composed suite is hash-oracled (`data_quality_report`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.operators.expectations import (
    expect_accepted_values,
    expect_foreign_key,
    expect_in_range,
    expect_not_null,
    expect_unique,
    run_suite,
)


def _row(df):
    [r] = df.collect()
    return (r["n_checked"], r["n_violations"], r["passed"])


def test_not_null_counts_nulls(spark):
    df = spark.createDataFrame([(1,), (None,), (3,), (None,)], "x int")
    assert _row(expect_not_null(1, df, "x")) == (4, 2, 0)


def test_unique_counts_extras_only(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (3,)], "k int"
    )
    # 6 rows, 3 keys -> 3 extras
    assert _row(expect_unique(1, df, ["k"])) == (6, 3, 0)
    ok = spark.createDataFrame([(1,), (2,)], "k int")
    assert _row(expect_unique(1, ok, ["k"])) == (2, 0, 1)


def test_accepted_values_null_is_violation(spark):
    df = spark.createDataFrame(
        [("A",), ("Z",), (None,), ("N",)], "s string"
    )
    assert _row(expect_accepted_values(1, df, "s", ["A", "N"])) == (4, 2, 0)


def test_in_range_inclusive_bounds_null_violates(spark):
    df = spark.createDataFrame(
        [(0,), (10,), (11,), (-1,), (None,)], "v int"
    )
    assert _row(
        expect_in_range(1, df, F.col("v"), "v", 0, 10)
    ) == (5, 3, 0)


def test_foreign_key_orphans_and_null_fk(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    assert _row(
        expect_foreign_key(1, child, "fk", parent, "pk")
    ) == (4, 2, 0)


def test_suite_union_and_empty_suite(spark):
    df = spark.createDataFrame([(1,)], "x int")
    rep = run_suite(
        [expect_not_null(1, df, "x"), expect_not_null(2, df, "x")]
    )
    assert rep.count() == 2
    with pytest.raises(ValueError, match="empty"):
        run_suite([])
