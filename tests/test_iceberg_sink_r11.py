"""Round-11 Iceberg sink parity (VERDICT r10 missing #1 / next #2-3):
partitioned writes, manifest column bounds feeding the shared pruner,
sink-emitted position-delete files, and equality-delete MERGE.
"""

from __future__ import annotations

import os

import pytest

from hainan_big_data_recommend_system_spark.operators.deltalog import (
    prune_by_partition,
    prune_live_files,
)
from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
    delete_where_iceberg,
    merge_iceberg,
    read_table,
    write_iceberg,
)


def _logical_rows(spark, tbl, cols=("id",)):
    """Scan live data files applying position deletes AND equality
    deletes under the spec's sequence rules — the reference scan the
    sink output must satisfy."""
    from pyspark.sql import functions as F

    snap = read_table(tbl)
    seqs = snap["data_sequence_numbers"]
    by_seq: dict[int, list[str]] = {}
    for p in sorted(snap["live"]):
        by_seq.setdefault(seqs[p], []).append(p)
    data = None
    for seq, paths in sorted(by_seq.items()):
        part = spark.read.parquet(
            *[os.path.join(tbl, p) for p in paths]
        ).select(
            F.col("_metadata.row_index").alias("__ri"),
            F.lit(seq).alias("__seq"),
            F.input_file_name().alias("__f"), "*",
        )
        data = part if data is None else data.unionByName(part)
    # position deletes (already seq-filtered by the reader)
    if snap["position_deletes"]:
        dead = spark.createDataFrame(
            [(p, int(ri)) for p, poss in snap["position_deletes"].items()
             for ri in poss],
            "rel string, __ri long",
        )
        mapping = spark.createDataFrame(
            [(p,) for p in sorted(snap["live"])], "rel string"
        ).withColumn(
            "__f",
            F.concat(F.lit("file://" + os.path.abspath(tbl) + "/"),
                     F.col("rel")),
        )
        dead = dead.join(mapping, "rel").select("__f", "__ri")
        data = data.join(dead, ["__f", "__ri"], "left_anti")
    fields = snap["field_names"]
    for eq in snap["equality_deletes"]:
        keys = [fields[i] for i in eq["equality_ids"]]
        dels = spark.read.parquet(os.path.join(tbl, eq["path"])) \
            .select(*keys)
        touched = data.filter(
            F.col("__seq") < eq["sequence_number"]
        ).join(F.broadcast(dels), keys, "left_anti")
        data = touched.unionByName(
            data.filter(F.col("__seq") >= eq["sequence_number"])
        )
    return sorted(
        tuple(r[c] for c in cols) for r in
        data.select(*cols).collect()
    ), snap


def test_partitioned_write_and_partition_pruning(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(20)],
        "id long, cat string",
    ).coalesce(1)
    write_iceberg(df, tbl, partition_by=["cat"])
    snap = read_table(tbl)
    assert snap["n_live"] == 2
    assert all(set(v) == {"cat"} for v in
               snap["partition_values"].values())
    # prune_by_partition (shared with Delta) works on this snapshot
    pr = prune_by_partition(snap, {"cat": {"even"}})
    assert pr["n_kept"] == 1 and pr["n_skipped"] == 1
    (kept,) = pr["kept"]
    assert snap["partition_values"][kept] == {"cat": "even"}
    rows = spark.read.parquet(os.path.join(tbl, kept)).collect()
    assert sorted(r["id"] for r in rows) == list(range(0, 20, 2))


def test_manifest_bounds_feed_shared_pruner(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    for k in range(4):
        write_iceberg(
            spark.range(k * 100, (k + 1) * 100).selectExpr("id")
            .coalesce(1).sortWithinPartitions("id"),
            tbl,
        )
    snap = read_table(tbl)
    assert len(snap["file_stats"]) == 4
    for st in snap["file_stats"].values():
        assert set(st["minValues"]) == {"id"}
    pr = prune_live_files(snap, "id", lo=150, hi=249)
    assert pr["n_kept"] == 2 and pr["n_skipped"] == 2
    assert pr["n_no_stats"] == 0
    kept = spark.read.parquet(
        *[os.path.join(tbl, p) for p in sorted(pr["kept"])]
    )
    got = sorted(r["id"] for r in
                 kept.filter("id BETWEEN 150 AND 249").collect())
    assert got == list(range(150, 250))


def test_delete_where_emits_position_deletes(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    write_iceberg(spark.range(0, 300).selectExpr("id").repartition(3),
                  tbl)
    files_before = dict(read_table(tbl)["live"])
    res = delete_where_iceberg(spark, tbl, "id % 10 = 3")
    assert res["n_rows_deleted"] == 30
    rows, snap = _logical_rows(spark, tbl)
    assert [r[0] for r in rows] == sorted(
        i for i in range(300) if i % 10 != 3
    )
    # data files untouched; sorted delete files appeared — WRITTEN BY
    # A DISTRIBUTED JOB, one per file-group shard (round 12: the
    # former coalesce(1) single-task funnel was VERDICT r11 #1)
    assert {p: s for p, s in snap["live"].items()} == files_before
    assert snap["n_position_deletes"] == 30
    assert res["n_delete_files"] == len(snap["position_delete_files"])
    assert len(snap["position_delete_files"]) > 1
    for dp in snap["position_delete_files"]:
        dels = spark.read.parquet(os.path.join(tbl, dp)).collect()
        pairs = [(r["file_path"], r["pos"]) for r in dels]
        assert pairs == sorted(pairs)  # spec sort order WITHIN a file


def test_second_delete_skips_already_dead(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    write_iceberg(spark.range(0, 100).selectExpr("id").coalesce(1), tbl)
    delete_where_iceberg(spark, tbl, "id < 10")
    res = delete_where_iceberg(spark, tbl, "id < 20")
    assert res["n_rows_deleted"] == 10  # only the fresh ones
    rows, snap = _logical_rows(spark, tbl)
    assert [r[0] for r in rows] == list(range(20, 100))
    assert snap["n_position_deletes"] == 20
    # a delete matching nothing new is a no-op, no snapshot burned
    res2 = delete_where_iceberg(spark, tbl, "id = 5")
    assert res2["version"] is None
    assert read_table(tbl)["snapshot_id"] == snap["snapshot_id"]


def test_merge_upserts_via_equality_deletes(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    write_iceberg(
        spark.range(0, 50).selectExpr("id", "id AS v").repartition(2),
        tbl,
    )
    files_before = dict(read_table(tbl)["live"])
    source = spark.range(0, 10).selectExpr("id", "-id AS v").union(
        spark.range(100, 105).selectExpr("id", "id AS v")
    ).coalesce(1)
    res = merge_iceberg(spark, source, tbl, ["id"])
    assert res["n_delete_keys"] == 15
    assert res["n_records_added"] == 15
    rows, snap = _logical_rows(spark, tbl, cols=("id", "v"))
    want = sorted(
        [(i, -i) for i in range(10)]
        + [(i, i) for i in range(10, 50)]
        + [(i, i) for i in range(100, 105)]
    )
    assert rows == want
    # no pre-existing data file was touched (equality deletes are
    # write-only: O(source), never a target scan)
    for p, meta in files_before.items():
        assert snap["live"][p] == meta
    # the delete never bites the files it rode in with (strictly-less)
    assert snap["n_equality_delete_files"] == 1
    eq = snap["equality_deletes"][0]
    assert snap["field_names"][eq["equality_ids"][0]] == "id"


def test_merge_then_delete_compose(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    write_iceberg(spark.range(0, 30).selectExpr("id", "id AS v")
                  .coalesce(1), tbl)
    merge_iceberg(
        spark,
        spark.range(0, 5).selectExpr("id", "-id AS v").coalesce(1),
        tbl, ["id"],
    )
    delete_where_iceberg(spark, tbl, "v >= 25")
    rows, _ = _logical_rows(spark, tbl, cols=("id", "v"))
    want = sorted(
        [(i, -i) for i in range(5)] + [(i, i) for i in range(5, 25)]
    )
    assert rows == want


def test_merge_into_empty_table(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    res = merge_iceberg(
        spark,
        spark.range(0, 5).selectExpr("id", "id AS v").coalesce(1),
        tbl, ["id"],
    )
    assert res["version"] == 0 and res["n_delete_keys"] == 0
    rows, snap = _logical_rows(spark, tbl, cols=("id", "v"))
    assert rows == [(i, i) for i in range(5)]
    assert snap["n_equality_delete_files"] == 0


def test_schema_recorded_in_metadata(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    write_iceberg(
        spark.range(3).selectExpr("id", "CAST(id AS STRING) AS name"),
        tbl,
    )
    snap = read_table(tbl)
    assert snap["field_names"] == {1: "id", 2: "name"}


def test_expire_snapshots_plan_respects_manifest_reuse(spark, tmp_path):
    from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
        expire_snapshots_plan,
    )

    tbl = str(tmp_path / "tbl")
    write_iceberg(spark.range(0, 10).selectExpr("id").coalesce(1), tbl)
    write_iceberg(spark.range(10, 20).selectExpr("id").coalesce(1), tbl)
    # overwrite: snapshot 3 drops both earlier generations' files
    write_iceberg(spark.range(20, 25).selectExpr("id").coalesce(1),
                  tbl, mode="overwrite")
    plan = expire_snapshots_plan(tbl, retain_last=1)
    assert plan["retained"] == [3] and plan["expired"] == [1, 2]
    # current snapshot's delete manifest still NAMES the old files
    # (status=2 entries), so they are NOT reclaimable — the retained
    # tree must stay replayable
    assert plan["reclaimable_files"] == []
    assert plan["bytes_reclaimable"] == 0
    # but with the two appends retained too, nothing expires
    assert expire_snapshots_plan(tbl, retain_last=3)["expired"] == []

    # append-only table: expiration reclaims nothing (manifest reuse
    # keeps every old manifest live in the current snapshot)
    tbl2 = str(tmp_path / "tbl2")
    write_iceberg(spark.range(0, 5).selectExpr("id").coalesce(1), tbl2)
    write_iceberg(spark.range(5, 9).selectExpr("id").coalesce(1), tbl2)
    plan2 = expire_snapshots_plan(tbl2, retain_last=1)
    assert plan2["expired"] == [1]
    assert plan2["reclaimable_files"] == []
    # snapshot 1's own manifest LIST is dead weight; its manifest is
    # reused by snapshot 2 and survives
    assert len(plan2["reclaimable_manifests"]) == 1
    assert plan2["reclaimable_manifests"][0].startswith("metadata/ml-")


def test_expire_snapshots_reclaims_fully_orphaned_generation(
    spark, tmp_path
):
    from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
        expire_snapshots_plan,
    )

    tbl = str(tmp_path / "tbl")
    write_iceberg(spark.range(0, 10).selectExpr("id").coalesce(1), tbl)
    write_iceberg(spark.range(20, 25).selectExpr("id").coalesce(1),
                  tbl, mode="overwrite")
    write_iceberg(spark.range(30, 35).selectExpr("id").coalesce(1),
                  tbl, mode="overwrite")
    # retain only snapshot 3: snapshot 1's data file is referenced by
    # snapshot 2's delete manifest, which expires too → reclaimable
    plan = expire_snapshots_plan(tbl, retain_last=1)
    assert plan["expired"] == [1, 2]
    reclaimed = plan["reclaimable_files"]
    snap1_files = sorted(read_table(tbl, snapshot_id=1)["live"])
    for p in snap1_files:
        assert p in reclaimed
    assert plan["bytes_reclaimable"] > 0
    with pytest.raises(ValueError, match="retain_last"):
        expire_snapshots_plan(tbl, retain_last=0)


def test_partitioned_merge_and_overwrite(spark, tmp_path):
    from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
        read_table as _rt,
    )

    tbl = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd", i) for i in range(20)],
        "id long, cat string, v long",
    ).coalesce(1)
    write_iceberg(base, tbl, partition_by=["cat"])
    # merge into the partitioned table: source stages into the SAME
    # Hive layout, partition tuples stamped
    src = spark.createDataFrame(
        [(0, "even", -1), (1, "odd", -2), (100, "even", 100)],
        "id long, cat string, v long",
    ).coalesce(1)
    merge_iceberg(spark, src, tbl, ["id"])
    rows, snap = _logical_rows(spark, tbl, cols=("id", "v"))
    want = sorted(
        [(0, -1), (1, -2), (100, 100)]
        + [(i, i) for i in range(2, 20)]
    )
    assert rows == want
    new_files = set(snap["live"]) - set(_rt(tbl, snapshot_id=1)["live"])
    assert new_files and all(
        snap["partition_values"][p].get("cat") in ("even", "odd")
        for p in new_files
    )
    # partitioned overwrite drops everything and re-partitions
    write_iceberg(
        spark.createDataFrame([(7, "x", 7)], "id long, cat string, v long")
        .coalesce(1),
        tbl, mode="overwrite", partition_by=["cat"],
    )
    rows2, snap2 = _logical_rows(spark, tbl, cols=("id", "v"))
    assert rows2 == [(7, 7)]
    assert all(v == {"cat": "x"} for v in
               snap2["partition_values"].values())
