"""Table-diff semantics (operators/diff.py): classification matrix,
null-safe comparisons both ways, and changed-column naming.  The
composed query is hash-oracled (`orders_version_diff`)."""

from __future__ import annotations

from hainan_big_data_recommend_system_spark.operators.diff import (
    diff_summary,
    table_diff,
)


def _run(spark, old_rows, new_rows):
    schema = "k long, a string, b long"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    return {
        r["k"]: (r["change_type"], r["changed_cols"])
        for r in table_diff(old, new, ["k"], ["a", "b"]).collect()
    }


def test_classification_matrix(spark):
    got = _run(
        spark,
        [(1, "x", 1), (2, "y", 2), (3, "z", 3), (4, "w", 4)],
        [(1, "x", 1), (2, "Y", 2), (3, "z", 30), (5, "v", 5)],
    )
    assert got == {
        1: ("unchanged", ""),
        2: ("changed", "a"),
        3: ("changed", "b"),
        4: ("removed", ""),
        5: ("added", ""),
    }


def test_both_columns_changed_sorted_names(spark):
    got = _run(spark, [(1, "x", 1)], [(1, "X", 10)])
    assert got == {1: ("changed", "a,b")}


def test_null_equals_null_and_null_vs_value(spark):
    got = _run(
        spark,
        [(1, None, None), (2, None, 2)],
        [(1, None, None), (2, "set", 2)],
    )
    assert got == {1: ("unchanged", ""), 2: ("changed", "a")}


def test_summary_counts(spark):
    schema = "k long, a string, b long"
    old = spark.createDataFrame([(1, "x", 1), (2, "y", 2)], schema)
    new = spark.createDataFrame([(2, "y", 9), (3, "z", 3)], schema)
    got = {
        r["change_type"]: r["n"]
        for r in diff_summary(
            table_diff(old, new, ["k"], ["a", "b"])
        ).collect()
    }
    assert got == {"removed": 1, "changed": 1, "added": 1}
