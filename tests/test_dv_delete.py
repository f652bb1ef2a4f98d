"""DELETE WHERE via deletion vectors (round 10) — the write half of
the r9 DV read path: a distributed ``_metadata.row_index`` scan finds
matching positions, roaring DVs ride re-adds, no data file rewritten.
"""

from __future__ import annotations

import os

import pytest

from hainan_big_data_recommend_system_spark.operators.deltalog import (
    resolve_deletion_vector,
)
from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    delete_where_delta,
    snapshot,
    write_delta,
)


def _live_rows(spark, tbl):
    """Scan live files APPLYING deletion vectors (position anti-join
    on the parquet row index)."""
    from pyspark.sql import functions as F

    snap = snapshot(tbl)

    def fetch(p):
        return open(os.path.join(tbl, p), "rb").read()

    dead = {
        "file:" + os.path.abspath(os.path.join(tbl, p)):
            set(resolve_deletion_vector(d, fetch))
        for p, d in snap.get("deletion_vectors", {}).items()
    }
    df = spark.read.parquet(
        *[os.path.join(tbl, p) for p in sorted(snap["live"])]
    ).select(
        F.col("_metadata.file_path").alias("fp"),
        F.col("_metadata.row_index").alias("ri"),
        "*",
    )
    rows = []
    for r in df.collect():
        if r["ri"] not in dead.get(r["fp"], ()):
            rows.append(r["id"])
    return sorted(rows), snap


def test_delete_where_tombstones_without_rewrite(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    write_delta(spark.range(0, 300).selectExpr("id").repartition(3), tbl)
    files_before = dict(snapshot(tbl)["live"])
    res = delete_where_delta(spark, tbl, "id % 10 = 3")
    assert res["n_rows_deleted"] == 30
    assert res["version"] == 1
    rows, snap = _live_rows(spark, tbl)
    assert rows == sorted(i for i in range(300) if i % 10 != 3)
    # NOT A SINGLE data file changed — same paths, same sizes
    assert snap["live"] == files_before
    assert snap["dv_cardinality"] == 30
    assert snap["live_rows_after_dv"] == 270
    # stats survived the re-add
    assert len(snap["file_stats"]) == len(files_before)


def test_second_delete_merges_dvs(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    write_delta(spark.range(0, 100).selectExpr("id").coalesce(1), tbl)
    delete_where_delta(spark, tbl, "id < 10")
    res = delete_where_delta(spark, tbl, "id < 20")  # overlaps
    assert res["n_rows_deleted"] == 10  # only the NEW dead rows count
    rows, snap = _live_rows(spark, tbl)
    assert rows == list(range(20, 100))
    assert snap["dv_cardinality"] == 20  # union, not double-count


def test_delete_nothing_is_noop(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    write_delta(spark.range(0, 10).selectExpr("id").coalesce(1), tbl)
    res = delete_where_delta(spark, tbl, "id > 1000")
    assert res == {"version": None, "n_files_touched": 0,
                   "n_rows_deleted": 0}
    assert snapshot(tbl)["version"] == 0
    # deleting already-dead rows is also a no-op commit-wise
    delete_where_delta(spark, tbl, "id = 5")
    res2 = delete_where_delta(spark, tbl, "id = 5")
    assert res2["version"] is None


def test_large_dv_goes_to_sidecar(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    write_delta(spark.range(0, 2000).selectExpr("id").coalesce(1), tbl)
    res = delete_where_delta(
        spark, tbl, "id % 2 = 0", inline_threshold=0
    )
    assert res["n_rows_deleted"] == 1000
    snap = snapshot(tbl)
    (desc,) = snap["deletion_vectors"].values()
    assert desc["storageType"] == "p"
    assert desc["pathOrInlineDv"].startswith("deletion_vector_")
    assert os.path.exists(os.path.join(tbl, desc["pathOrInlineDv"]))
    rows, _ = _live_rows(spark, tbl)
    assert rows == list(range(1, 2000, 2))


def test_delete_by_partition_column(spark, tmp_path):
    """The condition references the partition column, which is NOT in
    the data files — the scan must re-attach it from partitionValues."""
    tbl = str(tmp_path / "tbl")
    df = spark.range(0, 90).selectExpr(
        "id", "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 "
        "THEN 'b' ELSE 'c' END AS cat"
    ).repartition(1)
    write_delta(df, tbl, partition_by=["cat"])
    res = delete_where_delta(spark, tbl, "cat = 'b' AND id < 40")
    assert res["n_rows_deleted"] == 13  # ids 1,4,...,37
    rows, snap = _live_rows(spark, tbl)
    assert rows == sorted(
        i for i in range(90) if not (i % 3 == 1 and i < 40)
    )
    assert res["n_files_touched"] == 1  # only cat=b's file


# ---------------------------------------------------------------------------
# MERGE (upsert) — DV delete + insert in one commit (round 10)
# ---------------------------------------------------------------------------

def _all_rows(spark, tbl):
    """(id, v) pairs of the live table with DVs applied."""
    from pyspark.sql import functions as F

    snap = snapshot(tbl)

    def fetch(p):
        return open(os.path.join(tbl, p), "rb").read()

    dead = {
        "file:" + os.path.abspath(os.path.join(tbl, p)):
            set(resolve_deletion_vector(d, fetch))
        for p, d in snap.get("deletion_vectors", {}).items()
    }
    df = spark.read.parquet(
        *[os.path.join(tbl, p) for p in sorted(snap["live"])]
    ).select(
        F.col("_metadata.file_path").alias("fp"),
        F.col("_metadata.row_index").alias("ri"),
        "id", "v",
    )
    return sorted(
        (r["id"], r["v"]) for r in df.collect()
        if r["ri"] not in dead.get(r["fp"], ())
    ), snap


def test_merge_upserts_atomically(spark, tmp_path):
    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        merge_delta,
        read_log_commits,
    )

    tbl = str(tmp_path / "tbl")
    write_delta(
        spark.range(0, 100).selectExpr("id", "id AS v").repartition(2),
        tbl,
    )
    files_before = dict(snapshot(tbl)["live"])
    # updates: ids 0..19 get v = -id; inserts: ids 100..109
    source = spark.range(0, 20).selectExpr("id", "-id AS v").union(
        spark.range(100, 110).selectExpr("id", "id AS v")
    ).coalesce(1)
    res = merge_delta(spark, source, tbl, ["id"])
    assert res["version"] == 1
    assert res["n_rows_updated"] == 20
    assert res["n_records_added"] == 30
    rows, snap = _all_rows(spark, tbl)
    want = sorted(
        [(i, -i) for i in range(20)]
        + [(i, i) for i in range(20, 100)]
        + [(i, i) for i in range(100, 110)]
    )
    assert rows == want
    # the original files are untouched, only re-added with DVs
    for p, meta in files_before.items():
        assert snap["live"][p] == meta
    # ONE commit carries the whole upsert
    assert len(read_log_commits(tbl)) == 2
    # a half-replay (time travel) sees the pre-merge table intact
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        replay_delta_log,
    )

    pre = replay_delta_log(read_log_commits(tbl)[:1])
    assert pre["live_rows"] == 100 and pre["dv_cardinality"] == 0


def test_merge_into_empty_table_is_insert(spark, tmp_path):
    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        merge_delta,
    )

    tbl = str(tmp_path / "tbl")
    res = merge_delta(
        spark,
        spark.range(0, 5).selectExpr("id", "id AS v").coalesce(1),
        tbl, ["id"],
    )
    assert res["version"] == 0 and res["n_rows_updated"] == 0
    rows, _ = _all_rows(spark, tbl)
    assert rows == [(i, i) for i in range(5)]


def test_merge_needs_keys(spark, tmp_path):
    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        merge_delta,
    )

    with pytest.raises(ValueError, match="key column"):
        merge_delta(spark, spark.range(1).selectExpr("id", "id AS v"),
                    str(tmp_path / "t"), [])
