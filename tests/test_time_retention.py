"""Time-based retention (round 13, VERDICT r12 next-round #9):
`vacuum_delta` and `expire_snapshots_iceberg` accept a wall-clock age
horizon beside the version count — the spec's default retention
semantics (``delta.deletedFileRetentionDuration``,
``expire_snapshots(older_than=...)``).  Commit/manifest-list file
mtimes are the age witness; tests backdate them with ``os.utime``.
"""

from __future__ import annotations

import os
import time

import pytest

from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    snapshot,
    vacuum_delta,
    write_delta,
)
from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
    _prev_state,
    expire_snapshots_iceberg,
    read_table,
    write_iceberg,
)


def _backdate(path: str, hours: float) -> None:
    t = time.time() - hours * 3600.0
    os.utime(path, (t, t))


class TestVacuumByAge:
    def _table(self, spark, tmp_path):
        tbl = str(tmp_path / "v")
        df1 = spark.createDataFrame([(1,), (2,)], "id long")
        df2 = spark.createDataFrame([(3,), (4,)], "id long")
        write_delta(df1.coalesce(1), tbl)                   # v0
        write_delta(df2.coalesce(1), tbl, mode="overwrite")  # v1: v0 dead
        write_delta(df2.coalesce(1), tbl)                   # v2
        return tbl

    def test_young_commits_vacuum_nothing(self, spark, tmp_path):
        tbl = self._table(spark, tmp_path)
        res = vacuum_delta(tbl, retention_hours=1)
        assert res["n_files_deleted"] == 0

    def test_aged_tombstones_vacuum(self, spark, tmp_path):
        tbl = self._table(spark, tmp_path)
        log = os.path.join(tbl, "_delta_log")
        for v in (0, 1):
            _backdate(os.path.join(log, f"{v:020d}.json"), 2)
        res = vacuum_delta(tbl, retention_hours=1)
        assert res["n_files_deleted"] == 1  # v0's overwritten file
        # the window's snapshot still reads
        assert snapshot(tbl)["n_live"] == 2

    def test_partial_age_protects_young_tombstones(self, spark,
                                                   tmp_path):
        tbl = str(tmp_path / "p")
        a = spark.createDataFrame([(1,)], "id long")
        b = spark.createDataFrame([(2,)], "id long")
        write_delta(a.coalesce(1), tbl)                      # v0
        write_delta(b.coalesce(1), tbl, mode="overwrite")    # v1 old kill
        write_delta(a.coalesce(1), tbl, mode="overwrite")    # v2 new kill
        log = os.path.join(tbl, "_delta_log")
        for v in (0, 1):
            _backdate(os.path.join(log, f"{v:020d}.json"), 2)
        res = vacuum_delta(tbl, retention_hours=1)
        # only v1's tombstone (of v0's file) is past the horizon;
        # v2's tombstone (of v1's file) is young and survives
        assert res["n_files_deleted"] == 1

    def test_exactly_one_horizon(self, spark, tmp_path):
        tbl = self._table(spark, tmp_path)
        with pytest.raises(ValueError, match="exactly one"):
            vacuum_delta(tbl)
        with pytest.raises(ValueError, match="exactly one"):
            vacuum_delta(tbl, retention_versions=1, retention_hours=1)
        with pytest.raises(ValueError, match=">= 0"):
            vacuum_delta(tbl, retention_hours=-1)

    def test_version_form_unchanged(self, spark, tmp_path):
        tbl = self._table(spark, tmp_path)
        res = vacuum_delta(tbl, 0)
        assert res["n_files_deleted"] == 1


class TestExpireByAge:
    def _table(self, spark, tmp_path):
        tbl = str(tmp_path / "i")
        for k in range(3):  # snapshots 1, 2, 3
            write_iceberg(
                spark.createDataFrame([(k,)], "id long"), tbl)
        return tbl

    def test_young_snapshots_survive(self, spark, tmp_path):
        tbl = self._table(spark, tmp_path)
        res = expire_snapshots_iceberg(tbl, retain_last=1,
                                       older_than_hours=1)
        assert res["version"] is None
        assert sorted(_prev_state(tbl)["snapshots"]) == [1, 2, 3]

    def test_aged_snapshots_expire(self, spark, tmp_path):
        tbl = self._table(spark, tmp_path)
        st = _prev_state(tbl)
        for sid in (1, 2):
            _backdate(os.path.join(tbl, st["snapshots"][sid]), 2)
        res = expire_snapshots_iceberg(tbl, retain_last=1,
                                       older_than_hours=1)
        assert res["version"] is not None
        assert sorted(_prev_state(tbl)["snapshots"]) == [3]
        assert read_table(tbl)["live_rows_after_deletes"] == 3

    def test_retain_last_overrides_age(self, spark, tmp_path):
        tbl = self._table(spark, tmp_path)
        st = _prev_state(tbl)
        for sid in (1, 2, 3):
            _backdate(os.path.join(tbl, st["snapshots"][sid]), 2)
        expire_snapshots_iceberg(tbl, retain_last=2,
                                 older_than_hours=1)
        # the newest 2 stay regardless of age
        assert sorted(_prev_state(tbl)["snapshots"]) == [2, 3]

    def test_rejects_negative_age(self, spark, tmp_path):
        tbl = self._table(spark, tmp_path)
        with pytest.raises(ValueError, match=">= 0"):
            expire_snapshots_iceberg(tbl, older_than_hours=-2)
