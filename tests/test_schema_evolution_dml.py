"""Round-12 self-review find: DML on SCHEMA-EVOLVED tables.

A bare multi-file parquet read takes one file's schema — on a table
whose older files predate a `merge_schema` evolution, a DML scan
either failed (UNRESOLVED_COLUMN) or silently dropped the added
column for old files.  `_scan_with_positions` now reads with the
TABLE's declared schema (the read contract; missing columns fill with
null), and `write_iceberg` gains `merge_schema` append-only evolution
(the recorded fields must stay an exact prefix, preserving positional
field ids).
"""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    delete_where_delta,
    merge_delta,
    read_changes,
    snapshot,
    update_where_delta,
    write_delta,
)
from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
    delete_where_iceberg,
    read_table,
    update_where_iceberg,
    write_iceberg,
)


def _evolved_delta(spark, tbl):
    write_delta(spark.range(0, 10).selectExpr("id").coalesce(1), tbl)
    write_delta(
        spark.range(10, 20).selectExpr("id", "id * 2 AS v").coalesce(1),
        tbl, merge_schema=True,
    )


def test_delta_delete_on_evolved_column(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    _evolved_delta(spark, tbl)
    # the condition references the ADDED column; old files read it as
    # null (never matching) instead of breaking the scan
    res = delete_where_delta(spark, tbl, "v = 30", change_data=False)
    assert res["n_rows_deleted"] == 1
    snap = snapshot(tbl)
    assert snap["live_rows_after_dv"] == 19


def test_delta_update_spanning_both_generations(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    _evolved_delta(spark, tbl)
    # condition matches rows in BOTH file generations
    res = update_where_delta(
        spark, tbl, "id % 10 = 5", {"v": "coalesce(v, 0) + 1"},
        change_data=False,
    )
    assert res["n_rows_updated"] == 2
    # CDF-free check through a delete on the updated values
    res = delete_where_delta(spark, tbl, "v = 1", change_data=False)
    assert res["n_rows_deleted"] == 1   # the old-generation row (null v)
    res = delete_where_delta(spark, tbl, "v = 31", change_data=False)
    assert res["n_rows_deleted"] == 1   # the new-generation row


def test_delta_merge_and_cdf_on_evolved_table(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    _evolved_delta(spark, tbl)
    res = merge_delta(
        spark,
        spark.range(5, 12).selectExpr("id", "-id AS v").coalesce(1),
        tbl, ["id"],
    )
    assert res["n_rows_updated"] == 7
    feed = read_changes(spark, tbl, 1, 2).select(
        "id", "v", "_change_type"
    ).collect()
    pre = {r["id"]: r["v"] for r in feed
           if r["_change_type"] == "update_preimage"}
    # preimages from the OLD generation carry null v
    assert pre[5] is None and pre[11] == 22


def test_iceberg_merge_schema_append_and_dml(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    write_iceberg(spark.range(0, 10).selectExpr("id").coalesce(1), tbl)
    # non-evolution appends still refuse
    with pytest.raises(ValueError, match="schema"):
        write_iceberg(
            spark.range(0, 5).selectExpr("id", "id AS v"), tbl,
        )
    # reorder/rename refused even with merge_schema
    with pytest.raises(ValueError, match="prefix"):
        write_iceberg(
            spark.range(0, 5).selectExpr("id AS other", "id AS v"),
            tbl, merge_schema=True,
        )
    res = write_iceberg(
        spark.range(10, 20).selectExpr("id", "id * 2 AS v").coalesce(1),
        tbl, merge_schema=True,
    )
    assert res["n_records"] == 10
    snap = read_table(tbl)
    assert snap["field_names"] == {1: "id", 2: "v"}
    # DML across both generations: old files read v as null
    res = delete_where_iceberg(spark, tbl, "v = 36")  # id=18 only
    assert res["n_rows_deleted"] == 1
    res = update_where_iceberg(
        spark, tbl, "id % 10 = 5", {"v": "coalesce(v, 0) + 1"},
    )
    assert res["n_rows_updated"] == 2  # id=5 (null v) and id=15 (30)
    res = delete_where_iceberg(spark, tbl, "v = 1")
    assert res["n_rows_deleted"] == 1  # the old-generation row
    res = delete_where_iceberg(spark, tbl, "v = 31")
    assert res["n_rows_deleted"] == 1  # the new-generation row


def test_optimize_compacts_across_schema_evolution(spark, tmp_path):
    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        optimize_delta,
    )

    tbl = str(tmp_path / "tbl")
    _evolved_delta(spark, tbl)
    res = optimize_delta(spark, tbl, target_partitions=1)
    assert res["n_compacted"] == 2 and res["n_records"] == 20
    snap = snapshot(tbl)
    assert snap["n_live"] == 1
    import os

    rows = spark.read.parquet(
        *[os.path.join(tbl, p) for p in sorted(snap["live"])]
    ).collect()
    got = sorted((r["id"], r["v"]) for r in rows)
    assert got == sorted(
        [(i, None) for i in range(10)]
        + [(i, 2 * i) for i in range(10, 20)]
    )
