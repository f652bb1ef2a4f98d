"""Round-12 metadata maintenance verbs:

- `cleanup_delta_log`: physical log retention (JSON commits +
  superseded checkpoints below the newest at-or-below-horizon
  checkpoint), enabled by the sink's checkpoint fast path;
- `rewrite_manifests_iceberg`: manifest-list consolidation via the
  spec's per-entry sequence-number inheritance — O(1) manifests per
  scan plan with delete-application semantics preserved exactly.
"""

from __future__ import annotations

import os

from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    cleanup_delta_log,
    delete_where_delta,
    read_changes,
    snapshot,
    write_delta,
)
from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
    delete_where_iceberg,
    merge_iceberg,
    read_table,
    rewrite_manifests_iceberg,
    update_where_iceberg,
    write_iceberg,
)


def test_cleanup_delta_log_keeps_table_readable(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    for k in range(12):
        write_delta(
            spark.range(10 * k, 10 * (k + 1)).selectExpr("id")
            .coalesce(1),
            tbl, checkpoint_interval=5,
        )
    before = snapshot(tbl)
    res = cleanup_delta_log(tbl, retain_versions=3)
    # checkpoints at v4, v9; horizon = 11-3 = 8 → anchor v4
    assert res["anchor"] == 4
    assert res["n_json_deleted"] == 5  # commits 0..4
    after = snapshot(tbl)
    assert after["version"] == before["version"]
    assert after["live"] == before["live"]
    # DML and CDF inside the window keep working
    assert delete_where_delta(spark, tbl, "id < 5")["n_rows_deleted"] == 5
    feed = read_changes(spark, tbl, 11, 12).collect()
    assert len(feed) == 5
    # a second cleanup is idempotent and can advance with the horizon
    res2 = cleanup_delta_log(tbl, retain_versions=3)
    assert res2["anchor"] == 9
    assert snapshot(tbl)["version"] == 12


def test_cleanup_noop_without_checkpoint_below_horizon(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    for k in range(3):
        write_delta(
            spark.range(10 * k, 10 * (k + 1)).selectExpr("id")
            .coalesce(1),
            tbl, checkpoint_interval=10,
        )
    res = cleanup_delta_log(tbl, retain_versions=1)
    assert res["anchor"] is None and res["n_json_deleted"] == 0
    assert snapshot(tbl)["version"] == 2


def test_rewrite_manifests_consolidates_and_preserves_semantics(
    spark, tmp_path
):
    tbl = str(tmp_path / "tbl")
    for k in range(5):
        write_iceberg(
            spark.range(k * 20, (k + 1) * 20)
            .selectExpr("id", "id as v").coalesce(1),
            tbl,
        )
    delete_where_iceberg(spark, tbl, "id % 10 = 3")
    merge_iceberg(
        spark, spark.range(0, 4).selectExpr("id", "-id as v").coalesce(1),
        tbl, ["id"],
    )
    before = read_table(tbl)
    res = rewrite_manifests_iceberg(tbl)
    assert res["n_manifests_before"] > res["n_manifests_after"] <= 2
    after = read_table(tbl)
    # snapshot state EXACTLY preserved: live set, per-file sequences,
    # applied position deletes, equality deletes, stats
    assert after["live"] == before["live"]
    assert after["data_sequence_numbers"] == \
        before["data_sequence_numbers"]
    assert after["position_deletes"] == before["position_deletes"]
    assert after["equality_deletes"] == before["equality_deletes"]
    assert after["file_stats"] == before["file_stats"]
    # and time travel to the pre-consolidation snapshot still works
    old = read_table(tbl, snapshot_id=before["snapshot_id"])
    assert old["live"] == before["live"]


def test_rewrite_manifests_then_dml_still_sequence_correct(
    spark, tmp_path
):
    """A post-consolidation MERGE's equality delete must apply to the
    consolidated entries by their PRESERVED sequences: the old rows
    die, the merge's own rows survive."""
    tbl = str(tmp_path / "tbl")
    write_iceberg(
        spark.range(0, 30).selectExpr("id", "id as v").coalesce(1), tbl
    )
    write_iceberg(
        spark.range(30, 60).selectExpr("id", "id as v").coalesce(1), tbl
    )
    rewrite_manifests_iceberg(tbl)
    merge_iceberg(
        spark,
        spark.range(25, 35).selectExpr("id", "-id as v").coalesce(1),
        tbl, ["id"],
    )
    res = delete_where_iceberg(spark, tbl, "v < 0")
    assert res["n_rows_deleted"] == 10  # exactly the merged versions
    # and the superseded originals were NOT double-counted: deleting
    # their values finds nothing
    assert delete_where_iceberg(
        spark, tbl, "v = 27"
    )["n_rows_deleted"] == 0
    # UPDATE across consolidated manifests works too
    res = update_where_iceberg(spark, tbl, "id = 40", {"v": "v + 1"})
    assert res["n_rows_updated"] == 1


def test_rewrite_manifests_partitioned(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    for k in range(3):
        write_iceberg(
            spark.range(k * 20, (k + 1) * 20)
            .selectExpr("id", "id % 2 as p").coalesce(1),
            tbl, partition_by=["p"],
        )
    before = read_table(tbl)
    rewrite_manifests_iceberg(tbl)
    after = read_table(tbl)
    assert after["partition_values"] == before["partition_values"]
    assert after["live"] == before["live"]


def test_rewrite_manifests_noop_when_small(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    write_iceberg(spark.range(0, 10).selectExpr("id").coalesce(1), tbl)
    res = rewrite_manifests_iceberg(tbl)
    assert res["version"] is None


def test_rewrite_data_files_zorder(spark, tmp_path):
    """ZORDER compaction on format #2: the rewritten files cover small
    bounding boxes in BOTH clustered dimensions, so manifest bounds
    prune on either (the optimize_delta zorder_by twin)."""
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        prune_live_files,
    )
    from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
        rewrite_data_files_iceberg,
    )

    tbl = str(tmp_path / "tbl")
    write_iceberg(
        spark.range(0, 4096).selectExpr(
            "id % 64 AS x", "cast(id / 64 as long) AS y", "id"
        ).repartition(4),
        tbl,
    )
    res = rewrite_data_files_iceberg(
        spark, tbl, target_partitions=4, zorder_by=["x", "y"],
    )
    assert res["n_files"] == 4
    snap = read_table(tbl)
    # a narrow range on EITHER dimension prunes at least one file
    for col in ("x", "y"):
        pr = prune_live_files(snap, col, lo=0, hi=7)
        assert pr["n_skipped"] >= 1, col
    # rows byte-identical
    total = spark.read.parquet(
        *[os.path.join(tbl, p) for p in sorted(snap["live"])]
    ).count()
    assert total == 4096


def test_inspect_history_on_cleaned_log(spark, tmp_path):
    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        inspect_delta,
    )

    tbl = str(tmp_path / "tbl")
    for k in range(12):
        write_delta(
            spark.range(10 * k, 10 * (k + 1)).selectExpr("id")
            .coalesce(1),
            tbl, checkpoint_interval=5,
        )
    cleanup_delta_log(tbl, retain_versions=3)
    hist = inspect_delta(spark, tbl, "history").collect()
    # versions keep their TRUE numbers; the cleaned prefix is absent
    assert sorted(r["version"] for r in hist) == list(range(5, 12))
    assert all(r["operation"] == "WRITE" for r in hist)


def test_snapshot_retries_once_on_concurrent_cleanup(
    spark, tmp_path, monkeypatch
):
    """A reader racing cleanup_delta_log between the log listing and
    the commit read re-lists once instead of surfacing the race."""
    from hainan_big_data_recommend_system_spark.sources import delta_sink

    tbl = str(tmp_path / "tbl")
    for k in range(7):
        write_delta(
            spark.range(10 * k, 10 * (k + 1)).selectExpr("id")
            .coalesce(1),
            tbl, checkpoint_interval=5,
        )
    orig = delta_sink.read_log_commits_from
    calls = {"n": 0}

    def flaky(table_dir, from_version):
        calls["n"] += 1
        if calls["n"] == 1:
            raise FileNotFoundError("commit vanished mid-read")
        return orig(table_dir, from_version)

    monkeypatch.setattr(delta_sink, "read_log_commits_from", flaky)
    snap = delta_sink.snapshot(tbl)
    assert snap["version"] == 6 and calls["n"] == 2


def test_remove_orphans_iceberg(spark, tmp_path):
    import os
    import time

    from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
        remove_orphan_files_iceberg,
    )

    tbl = str(tmp_path / "tbl")
    write_iceberg(
        spark.range(0, 40).selectExpr("id", "id as v").coalesce(1), tbl
    )
    delete_where_iceberg(spark, tbl, "id < 5")
    before = read_table(tbl)
    # a stage-and-die leftover, old enough to pass the grace window
    orphan = os.path.join(tbl, "data", "part-dead-00000.parquet")
    open(orphan, "wb").write(b"leftover")
    old = time.time() - 100_000
    os.utime(orphan, (old, old))
    # a RECENT unreferenced file must survive (maybe in flight)
    recent = os.path.join(tbl, "data", "part-inflight-00000.parquet")
    open(recent, "wb").write(b"staged")

    res = remove_orphan_files_iceberg(tbl, grace_seconds=3600)
    assert res["n_deleted"] == 1
    assert not os.path.exists(orphan)
    assert os.path.exists(recent)
    after = read_table(tbl)
    assert after["live"] == before["live"]
    assert after["position_delete_files"] == \
        before["position_delete_files"]


def test_remove_orphans_delta_keeps_tombstones_and_sidecars(
    spark, tmp_path
):
    import os
    import time

    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        remove_orphan_files_delta,
        vacuum_delta,
    )

    tbl = str(tmp_path / "tbl")
    write_delta(spark.range(0, 100).selectExpr("id").coalesce(1), tbl)
    # sidecar DV + an overwrite tombstoning the first file
    delete_where_delta(spark, tbl, "id < 10", inline_threshold=0,
                       change_data=False)
    write_delta(spark.range(100, 150).selectExpr("id").coalesce(1),
                tbl, mode="overwrite")
    orphan = os.path.join(tbl, "part-dead-00000.parquet")
    open(orphan, "wb").write(b"leftover")
    old = time.time() - 100_000
    os.utime(orphan, (old, old))
    # age every real file too: referenced-ness, not age, must save them
    for f in os.listdir(tbl):
        full = os.path.join(tbl, f)
        if os.path.isfile(full):
            os.utime(full, (old, old))

    res = remove_orphan_files_delta(tbl, grace_seconds=3600)
    assert res["n_deleted"] == 1
    assert not os.path.exists(orphan)
    # tombstoned-but-unvacuumed files and DV sidecars survived:
    # time travel + a later VACUUM still work
    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        snapshot_as_of,
    )

    assert snapshot_as_of(tbl, 1)["live_rows"] == 100
    v = vacuum_delta(tbl, retention_versions=0)
    assert v["n_files_deleted"] >= 1  # the tombstone was still there
