"""The Delta sink reads its own checkpoints (VERDICT r11 What's wrong
#2): `snapshot()` seeds from the newest checkpoint parquet and replays
only the JSON tail, `snapshot_as_of` seeds from the newest checkpoint
at-or-below the target, and every DML verb + CDF therefore works on a
table whose pre-checkpoint JSON commits were cleaned by standard log
retention — previously the sink raised on the version gap.
"""

from __future__ import annotations

import os

import pytest

from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    delete_where_delta,
    merge_delta,
    read_changes,
    read_log_commits,
    restore_delta,
    snapshot,
    snapshot_as_of,
    update_where_delta,
    write_delta,
)


def _build(spark, tbl, n_commits=7, interval=5):
    """n_commits single-file appends; checkpoint lands at v4."""
    for k in range(n_commits):
        write_delta(
            spark.range(10 * k, 10 * (k + 1)).selectExpr("id").coalesce(1),
            tbl, checkpoint_interval=interval,
        )


def _clean_below(tbl, version):
    ld = os.path.join(tbl, "_delta_log")
    for f in os.listdir(ld):
        if f.endswith(".json") and f[:-5].isdigit() and \
                int(f[:-5]) <= version:
            os.unlink(os.path.join(ld, f))


def test_snapshot_fast_path_matches_full_replay(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    _build(spark, tbl)
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        replay_delta_log,
    )

    full = replay_delta_log(read_log_commits(tbl))
    fast = snapshot(tbl)
    for key in ("version", "live", "partition_values", "schema_json",
                "deletion_vectors", "file_stats", "live_rows"):
        assert fast[key] == full[key], key


def test_snapshot_as_of_matches_prefix_replay(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    _build(spark, tbl)
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        replay_delta_log,
    )

    commits = read_log_commits(tbl)
    for v in (0, 3, 4, 5, 6):
        want = replay_delta_log(commits[: v + 1])
        got = snapshot_as_of(tbl, v)
        assert got["version"] == v
        assert got["live"] == want["live"]


def test_dml_and_cdf_on_checkpoint_cleaned_log(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    _build(spark, tbl)          # v0..v6, checkpoint at v4
    before = snapshot(tbl)
    _clean_below(tbl, 4)        # standard log retention below the ckpt
    after = snapshot(tbl)
    assert after["version"] == before["version"] == 6
    assert after["live"] == before["live"]

    # DELETE
    res = delete_where_delta(spark, tbl, "id < 5")       # v7
    assert res["n_rows_deleted"] == 5
    # UPDATE
    res = update_where_delta(spark, tbl, "id = 42", {"id": "id + 1000"})
    assert res["n_rows_updated"] == 1                    # v8
    # MERGE
    res = merge_delta(
        spark, spark.range(5, 8).selectExpr("id"), tbl, ["id"],
    )                                                    # v9 (+ckpt)
    assert res["n_rows_updated"] == 3
    snap = snapshot(tbl)
    assert snap["version"] == 9
    assert snap["live_rows_after_dv"] == 70 - 5  # 42 moved, not removed

    # CDF across the post-cleanup range
    feed = read_changes(spark, tbl, 6, 9).select(
        "id", "_change_type"
    ).collect()
    deleted = sorted(r["id"] for r in feed
                     if r["_change_type"] == "delete")
    assert deleted == [0, 1, 2, 3, 4]
    assert 1042 in {r["id"] for r in feed
                    if r["_change_type"] == "update_postimage"}

    # RESTORE inside the retained window works; below it raises
    r = restore_delta(tbl, 6)
    assert r["restored_to"] == 6 and r["version"] == 10
    assert snapshot(tbl)["live_rows_after_dv"] == 70
    with pytest.raises(ValueError, match="missing commits|version gaps"):
        restore_delta(tbl, 2)


def test_cdf_seed_below_cleaned_prefix_raises(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    _build(spark, tbl)
    _clean_below(tbl, 4)
    with pytest.raises(ValueError, match="missing commits|version gaps"):
        read_changes(spark, tbl, 2, 6).collect()


def test_vacuum_on_checkpoint_cleaned_log(spark, tmp_path):
    """VACUUM resolves through the checkpoint fast path and walks only
    available JSON commits — conservative where history is gone."""
    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        vacuum_delta,
        write_delta as wd,
    )

    tbl = str(tmp_path / "tbl")
    # overwrites tombstone the prior file each time
    for k in range(7):
        wd(spark.range(10 * k, 10 * (k + 1)).selectExpr("id")
           .coalesce(1), tbl, mode="overwrite", checkpoint_interval=5)
    _clean_below(tbl, 4)
    res = vacuum_delta(tbl, retention_versions=1)
    assert res["n_files_deleted"] > 0
    # the table still reads after vacuum on the cleaned log
    snap = snapshot(tbl)
    assert snap["live_rows"] == 10


def test_vacuum_window_walk_matches_full_replay(spark, tmp_path):
    """The incremental window walk must keep exactly the sidecars the
    old O(window x log) per-version replays kept."""
    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        delete_where_delta,
        vacuum_delta,
    )

    tbl = str(tmp_path / "tbl")
    # big inline_threshold=0 forces sidecar DVs
    write_delta(spark.range(0, 200).selectExpr("id").coalesce(1), tbl)
    delete_where_delta(spark, tbl, "id < 50", inline_threshold=0,
                       change_data=False)
    delete_where_delta(spark, tbl, "id < 100", inline_threshold=0,
                       change_data=False)
    import os

    sidecars = [f for f in os.listdir(tbl)
                if f.startswith("deletion_vector_")]
    assert len(sidecars) == 2
    # retention 0: only the CURRENT state's sidecar survives
    res = vacuum_delta(tbl, retention_versions=0)
    assert res["n_sidecars_deleted"] == 1
    left = [f for f in os.listdir(tbl)
            if f.startswith("deletion_vector_")]
    assert len(left) == 1
    # the surviving DV still resolves
    snap = snapshot(tbl)
    assert snap["live_rows_after_dv"] == 100
