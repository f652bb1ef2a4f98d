"""Time-based retention (round 13, VERDICT r12 next-round #9; round
14, VERDICT r13 next-round #8): `vacuum_delta` and
`expire_snapshots_iceberg` accept a wall-clock age horizon beside the
version count — the spec's default retention semantics
(``delta.deletedFileRetentionDuration``,
``expire_snapshots(older_than=...)``).

The age witness is IN-LOG: Delta ``commitInfo.timestamp`` / Iceberg
snapshot ``timestamp-ms`` (both stamped by the sinks), with file
mtime only as the legacy fallback for logs that predate the stamps —
so retention survives copy/rsync/restore of the log directory, whose
mtimes are arbitrary.  Tests backdate the in-log timestamps while the
file mtimes stay YOUNG (the mismatch case), and the fallback tests
strip the stamps first.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    snapshot,
    vacuum_delta,
    write_delta,
)
from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
    _meta_dir,
    _prev_state,
    current_version,
    expire_snapshots_iceberg,
    read_table,
    write_iceberg,
)


def _backdate_mtime(path: str, hours: float) -> None:
    t = time.time() - hours * 3600.0
    os.utime(path, (t, t))


def _edit_delta_commit(tbl: str, v: int, hours: float | None) -> None:
    """Rewrite a commit's in-log ``commitInfo.timestamp`` to ``hours``
    ago (None strips the stamp entirely — the legacy-log shape).  The
    file's mtime is left at NOW: in-log must win over mtime."""
    path = os.path.join(tbl, "_delta_log", f"{v:020d}.json")
    out = []
    for line in open(path, encoding="utf-8"):
        if not line.strip():
            continue
        obj = json.loads(line)
        if "commitInfo" in obj:
            if hours is None:
                obj["commitInfo"].pop("timestamp", None)
            else:
                obj["commitInfo"]["timestamp"] = int(
                    (time.time() - hours * 3600.0) * 1000
                )
        out.append(json.dumps(obj, sort_keys=True,
                              separators=(",", ":")))
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(out))


def _edit_iceberg_snap_ts(tbl: str, sids, hours: float | None) -> None:
    """Rewrite the current metadata's snapshot ``timestamp-ms`` for
    ``sids`` to ``hours`` ago (None strips the stamp).  Manifest-list
    mtimes stay at NOW."""
    path = os.path.join(_meta_dir(tbl),
                        f"v{current_version(tbl)}.metadata.json")
    obj = json.loads(open(path, encoding="utf-8").read())
    for s in obj["snapshots"]:
        if s["snapshot-id"] in sids:
            if hours is None:
                s.pop("timestamp-ms", None)
            else:
                s["timestamp-ms"] = int(
                    (time.time() - hours * 3600.0) * 1000
                )
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(json.dumps(obj, sort_keys=True,
                            separators=(",", ":")))


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

    def test_young_inlog_beats_backdated_mtime(self, spark, tmp_path):
        """A copied/restored log dir can carry ANCIENT mtimes on
        young commits; the young in-log timestamps must protect the
        tombstones."""
        tbl = self._table(spark, tmp_path)
        log = os.path.join(tbl, "_delta_log")
        for v in (0, 1, 2):
            _backdate_mtime(os.path.join(log, f"{v:020d}.json"), 48)
        res = vacuum_delta(tbl, retention_hours=1)
        assert res["n_files_deleted"] == 0

    def test_aged_tombstones_vacuum(self, spark, tmp_path):
        tbl = self._table(spark, tmp_path)
        for v in (0, 1):
            _edit_delta_commit(tbl, v, hours=2)  # mtimes stay young
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
        for v in (0, 1):
            _edit_delta_commit(tbl, v, hours=2)
        res = vacuum_delta(tbl, retention_hours=1)
        # only v1's tombstone (of v0's file) is past the horizon;
        # v2's tombstone (of v1's file) is young and survives
        assert res["n_files_deleted"] == 1

    def test_nonmonotonic_ages_use_contiguous_prefix(self, spark,
                                                     tmp_path):
        """ADVICE r13 low: with v0 aged, v1 YOUNG, v2 aged (clock
        skew / restored logs), the horizon is the oldest contiguous
        aged prefix (v0) — max(aged)=v2 would put young v1's
        tombstone below the horizon and vacuum a file deleted more
        recently than the stated retention."""
        tbl = str(tmp_path / "nm")
        a = spark.createDataFrame([(1,)], "id long")
        b = spark.createDataFrame([(2,)], "id long")
        write_delta(a.coalesce(1), tbl)                      # v0
        write_delta(b.coalesce(1), tbl, mode="overwrite")    # v1 kills v0's file
        write_delta(a.coalesce(1), tbl, mode="overwrite")    # v2 kills v1's file
        _edit_delta_commit(tbl, 0, hours=3)
        _edit_delta_commit(tbl, 2, hours=2)  # aged, but v1 is young
        res = vacuum_delta(tbl, retention_hours=1)
        assert res["n_files_deleted"] == 0

    def test_mtime_fallback_for_legacy_logs(self, spark, tmp_path):
        """Commits with NO in-log timestamp (legacy logs) age by
        mtime, so pre-round-14 tables keep vacuuming."""
        tbl = self._table(spark, tmp_path)
        log = os.path.join(tbl, "_delta_log")
        for v in (0, 1):
            _edit_delta_commit(tbl, v, hours=None)  # strip the stamp
            _backdate_mtime(os.path.join(log, f"{v:020d}.json"), 2)
        res = vacuum_delta(tbl, retention_hours=1)
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

    def test_young_inlog_beats_backdated_mtime(self, spark, tmp_path):
        tbl = self._table(spark, tmp_path)
        st = _prev_state(tbl)
        for sid in (1, 2, 3):
            _backdate_mtime(os.path.join(tbl, st["snapshots"][sid]),
                            48)
        res = expire_snapshots_iceberg(tbl, retain_last=1,
                                       older_than_hours=1)
        assert res["version"] is None
        assert sorted(_prev_state(tbl)["snapshots"]) == [1, 2, 3]

    def test_aged_snapshots_expire(self, spark, tmp_path):
        tbl = self._table(spark, tmp_path)
        _edit_iceberg_snap_ts(tbl, {1, 2}, hours=2)  # mtimes young
        res = expire_snapshots_iceberg(tbl, retain_last=1,
                                       older_than_hours=1)
        assert res["version"] is not None
        assert sorted(_prev_state(tbl)["snapshots"]) == [3]
        assert read_table(tbl)["live_rows_after_deletes"] == 3

    def test_mtime_fallback_for_legacy_metadata(self, spark,
                                                tmp_path):
        tbl = self._table(spark, tmp_path)
        st = _prev_state(tbl)
        _edit_iceberg_snap_ts(tbl, {1, 2, 3}, hours=None)  # strip
        for sid in (1, 2):
            _backdate_mtime(os.path.join(tbl, st["snapshots"][sid]), 2)
        res = expire_snapshots_iceberg(tbl, retain_last=1,
                                       older_than_hours=1)
        assert res["version"] is not None
        assert sorted(_prev_state(tbl)["snapshots"]) == [3]

    def test_retain_last_overrides_age(self, spark, tmp_path):
        tbl = self._table(spark, tmp_path)
        _edit_iceberg_snap_ts(tbl, {1, 2, 3}, hours=2)
        expire_snapshots_iceberg(tbl, retain_last=2,
                                 older_than_hours=1)
        # the newest 2 stay regardless of age
        assert sorted(_prev_state(tbl)["snapshots"]) == [2, 3]

    def test_rejects_negative_age(self, spark, tmp_path):
        tbl = self._table(spark, tmp_path)
        with pytest.raises(ValueError, match=">= 0"):
            expire_snapshots_iceberg(tbl, older_than_hours=-2)

    def test_upgrade_commit_preserves_legacy_ages(self, spark,
                                                  tmp_path):
        """ADVICE r14: the first commit on a pre-round-14 table (no
        recorded timestamp-ms) must NOT re-stamp historical snapshots
        as born-now — they stamp from their manifest list's mtime, so
        an aged snapshot still expires right after the upgrade."""
        tbl = self._table(spark, tmp_path)
        st = _prev_state(tbl)
        _edit_iceberg_snap_ts(tbl, {1, 2, 3}, hours=None)  # legacy
        for sid in (1, 2):
            _backdate_mtime(os.path.join(tbl, st["snapshots"][sid]), 2)
        # the upgrade commit: a new snapshot on the legacy table
        write_iceberg(spark.createDataFrame([(9,)], "id long"), tbl)
        ts = _prev_state(tbl)["snapshot_ts"]
        now_ms = time.time() * 1000
        for sid in (1, 2):  # stamped from backdated mtime, not NOW
            assert ts[sid] < now_ms - 1.5 * 3600 * 1000
        assert ts[4] > now_ms - 60_000  # the new snapshot is young
        res = expire_snapshots_iceberg(tbl, retain_last=1,
                                       older_than_hours=1)
        assert res["version"] is not None
        assert sorted(_prev_state(tbl)["snapshots"]) == [3, 4]
