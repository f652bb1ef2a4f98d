"""The nullCount data-skipping lever (round 13): the sink records the
spec's ``add.stats.nullCount`` per column from the hand-parsed footer,
and ``IS NULL`` / ``IS NOT NULL`` conjuncts prune — a file recording
ZERO nulls cannot satisfy IS NULL; an all-null file cannot satisfy
IS NOT NULL.  Files without the stat are kept (no proof, must scan).
"""

from __future__ import annotations

import json
import os

import pytest

from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    _prune_dml_paths,
    analyze_condition,
    delete_where_delta,
    read_delta_table,
    snapshot,
    write_delta,
)


def _three_file_table(spark, tmp_path):
    """File A: no nulls; file B: some nulls; file C: all-null v."""
    tbl = str(tmp_path / "nulls")
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    b = spark.createDataFrame([(3, "z"), (4, None)],
                              "id long, v string")
    c = spark.createDataFrame([(5, None), (6, None)],
                              "id long, v string")
    for df in (a, b, c):
        write_delta(df.coalesce(1), tbl)
    return tbl


class TestAnalyzeCondition:
    def test_is_null_parsed(self):
        cons = analyze_condition("v IS NULL AND id >= 3")
        assert cons["v"]["null"] is True
        assert cons["id"]["lo"] == 3

    def test_is_not_null_parsed(self):
        cons = analyze_condition("v IS NOT NULL")
        assert cons["v"]["null"] is False


class TestNullCountRecorded:
    def test_add_stats_carry_null_counts(self, spark, tmp_path):
        tbl = _three_file_table(spark, tmp_path)
        snap = snapshot(tbl)
        per_file = sorted(
            st["nullCount"]["v"]
            for st in snap["file_stats"].values()
            if "nullCount" in st
        )
        assert per_file == [0, 1, 2]
        # the all-null file has NO v bounds but still a null count
        all_null = [
            st for st in snap["file_stats"].values()
            if st.get("nullCount", {}).get("v") == 2
        ][0]
        assert "v" not in (all_null.get("minValues") or {})


class TestPruning:
    def test_is_null_skips_null_free_files(self, spark, tmp_path):
        tbl = _three_file_table(spark, tmp_path)
        snap = snapshot(tbl)
        paths, counts = _prune_dml_paths(tbl, snap, "v IS NULL")
        assert counts["n_null_skipped"] == 1  # file A
        kept_nulls = [
            snap["file_stats"][p]["nullCount"]["v"] for p in paths
        ]
        assert 0 not in kept_nulls

    def test_is_not_null_skips_all_null_files(self, spark, tmp_path):
        tbl = _three_file_table(spark, tmp_path)
        snap = snapshot(tbl)
        paths, counts = _prune_dml_paths(tbl, snap, "v IS NOT NULL")
        assert counts["n_null_skipped"] == 1  # file C
        assert all(
            snap["file_stats"][p]["nullCount"]["v"] < 2 for p in paths
        )

    def test_delete_where_is_null_end_to_end(self, spark, tmp_path):
        tbl = _three_file_table(spark, tmp_path)
        res = delete_where_delta(spark, tbl, "v IS NULL")
        assert res["n_rows_deleted"] == 3
        got = sorted(r["id"] for r in
                     read_delta_table(spark, tbl).collect())
        assert got == [1, 2, 3]

    def test_combined_with_range(self, spark, tmp_path):
        tbl = _three_file_table(spark, tmp_path)
        res = delete_where_delta(spark, tbl,
                                 "v IS NULL AND id >= 5")
        assert res["n_rows_deleted"] == 2
        got = sorted(r["id"] for r in
                     read_delta_table(spark, tbl).collect())
        assert got == [1, 2, 3, 4]


class TestNestedNullStatsSkipped:
    def test_struct_leaf_nulls_not_attributed_to_root(
            self, spark, tmp_path):
        """ADVICE r13 low: a struct column ``a: struct<b>`` whose
        every ``a`` is non-null but every ``a.b`` is null must NOT
        record ``nullCount['a'] = nulls(a.b)`` — that would let the
        IS NOT NULL lever skip a file full of matching rows.  Nested
        leaves (path_in_schema longer than 1) are out of stats scope;
        the file simply carries no 'a' nullCount and is kept."""
        tbl = str(tmp_path / "nested")
        df = spark.createDataFrame(
            [(1, (None,)), (2, (None,))],
            "id long, a struct<b: string>")
        write_delta(df.coalesce(1), tbl)
        snap = snapshot(tbl)
        (st,) = snap["file_stats"].values()
        assert "a" not in (st.get("nullCount") or {})
        # no proof -> no pruning: the single file stays a candidate
        paths, counts = _prune_dml_paths(tbl, snap, "a IS NOT NULL")
        assert counts["n_null_skipped"] == 0
        assert len(paths) == 1
        res = delete_where_delta(spark, tbl, "a IS NOT NULL")
        assert res["n_rows_deleted"] == 2
