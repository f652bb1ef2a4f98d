"""availableNow semantics + the bounded-backfill → readStream HANDOFF
(round 15, VERDICT r14 next-round #4/#6):

- ``trigger(availableNow=True)`` on BOTH readStream change-feed
  sources drains exactly to the launch-instant version and STOPS; a
  later availableNow run off the same checkpoint picks up only the
  tail — the T6 daily-batch lifecycle over the change feed.
- The module-docstring backfill recipe, pinned end to end: drain a
  deep history with `stream_changes(max_versions_per_batch=N)`
  (bounded batches — the admission control the readStream API can't
  negotiate), then hand the returned watermark to the readStream
  source as its starting offset.  The COMPOSED feed equals one batch
  change read over the whole range, rows exactly-once across the
  seam, with a crash + restart inside EACH phase.
"""

from __future__ import annotations

import os

import pytest

from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    delete_where_delta,
    read_changes,
    snapshot,
    update_where_delta,
    write_delta,
)
from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
    _prev_state,
    delete_where_iceberg,
    read_changes_iceberg,
    write_iceberg,
)
from hainan_big_data_recommend_system_spark.streaming.cdf_source import (
    stream_changes,
)
from hainan_big_data_recommend_system_spark.streaming.readstream_cdf import (
    open_change_stream,
    open_changelog_stream,
)

SCH = "id long, v string"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _drain_foreach(sdf, ck: str, sink: list, fail_after: int = -1):
    """availableNow drain into ``sink`` via foreachBatch (memory sinks
    cannot recover checkpoints); ``fail_after`` N batches simulates a
    crash mid-drain.  Returns normally when the query self-stops."""
    state = {"n": 0}

    def fn(df, batch_id):
        rows = [tuple(r) for r in df.collect()]
        state["n"] += 1
        if fail_after >= 0 and state["n"] > fail_after:
            raise RuntimeError("injected crash")
        sink.append((batch_id, rows))

    q = (sdf.writeStream.foreachBatch(fn)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination(300)
    except Exception:
        pass
    assert not q.isActive


def _dedup(batches):
    """Exactly-once view of an at-least-once foreachBatch log: last
    delivery per batch_id wins (Spark reruns a failed batch under the
    SAME id)."""
    seen = {}
    for bid, rows in batches:
        seen[bid] = rows
    return sorted(r for rows in seen.values() for r in rows)


class TestAvailableNowDelta:
    def test_one_shot_drain_then_incremental_handoff(self, spark,
                                                     tmp_path):
        tbl = str(tmp_path / "t")
        ck = str(tmp_path / "ck")
        write_delta(spark.createDataFrame(
            [(1, "a"), (2, "b")], SCH), tbl)                 # v0
        update_where_delta(spark, tbl, "id = 2", {"v": "'B'"})  # v1
        sink: list = []
        _drain_foreach(open_change_stream(spark, tbl), ck, sink)
        want = _rows(read_changes(spark, tbl, -1, 1))
        assert _dedup(sink) == want
        # the drained query STOPPED; later commits need a new run
        delete_where_delta(spark, tbl, "id = 1")             # v2
        write_delta(spark.createDataFrame([(3, "c")], SCH), tbl)  # v3
        sink2: list = []
        _drain_foreach(open_change_stream(spark, tbl), ck, sink2)
        assert _dedup(sink2) == _rows(read_changes(spark, tbl, 1, 3))
        # composed: exactly-once over the whole history
        assert sorted(_dedup(sink) + _dedup(sink2)) == _rows(
            read_changes(spark, tbl, -1, 3))


class TestAvailableNowIceberg:
    def test_one_shot_drain_then_incremental_handoff(self, spark,
                                                     tmp_path):
        tbl = str(tmp_path / "t")
        ck = str(tmp_path / "ck")
        write_iceberg(spark.createDataFrame(
            [(1, "a"), (2, "b")], SCH), tbl)                # sid 1
        write_iceberg(spark.createDataFrame([(3, "c")], SCH), tbl)
        sink: list = []
        _drain_foreach(open_changelog_stream(spark, tbl), ck, sink)
        want = _rows(read_changes_iceberg(spark, tbl, None))
        assert _dedup(sink) == want
        head = _prev_state(tbl)["current"]
        delete_where_iceberg(spark, tbl, "id = 1")
        sink2: list = []
        _drain_foreach(open_changelog_stream(spark, tbl), ck, sink2)
        assert _dedup(sink2) == _rows(
            read_changes_iceberg(spark, tbl, head))


class TestBackfillHandoff:
    """The recipe `streaming/readstream_cdf.py`'s admission-control
    docstring prescribes, with a crash+restart inside each phase."""

    def _build_history(self, spark, tbl):
        write_delta(spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], SCH), tbl)     # v0
        for k in range(3):                                   # v1..v3
            write_delta(spark.createDataFrame(
                [(100 + k, f"n{k}")], SCH), tbl)
        update_where_delta(spark, tbl, "id = 1", {"v": "'U'"})  # v4
        delete_where_delta(spark, tbl, "id = 5")             # v5

    def test_delta_seam_exactly_once(self, spark, tmp_path):
        tbl = str(tmp_path / "t")
        ck1 = str(tmp_path / "ck-backfill")
        ck2 = str(tmp_path / "ck-stream")
        self._build_history(spark, tbl)

        # ---- phase 1: bounded-batch backfill, crash at batch 2 ----
        got1: list = []
        state = {"n": 0}

        def crashy(df, batch_id):
            state["n"] += 1
            if state["n"] == 2:
                raise RuntimeError("injected crash")
            got1.append((batch_id, [tuple(r) for r in df.collect()]))

        with pytest.raises(RuntimeError):
            stream_changes(spark, tbl, ck1, crashy,
                           max_versions_per_batch=2)
        # restart: the dangling batch redelivers under its id, then
        # the drain completes to the current version
        def fine(df, batch_id):
            got1.append((batch_id, [tuple(r) for r in df.collect()]))

        res = stream_changes(spark, tbl, ck1, fine,
                             max_versions_per_batch=2)
        seam = res["last_version"]
        assert seam == snapshot(tbl)["version"] == 5

        # ---- the tail arrives while the stream is not yet up ----
        write_delta(spark.createDataFrame([(200, "tail")], SCH),
                    tbl)                                     # v6
        delete_where_delta(spark, tbl, "id = 2")             # v7

        # ---- phase 2: readStream from the seam, crash mid-drain ----
        got2: list = []
        _drain_foreach(
            open_change_stream(spark, tbl, starting_version=seam),
            ck2, got2, fail_after=0)
        # restart off Spark's own checkpoint finishes the drain
        _drain_foreach(
            open_change_stream(spark, tbl, starting_version=seam),
            ck2, got2)

        # ---- the seam leaks nothing and duplicates nothing ----
        composed = sorted(_dedup(got1) + _dedup(got2))
        assert composed == _rows(read_changes(spark, tbl, -1, 7))

    def test_iceberg_seam_exactly_once(self, spark, tmp_path):
        tbl = str(tmp_path / "t")
        ck1 = str(tmp_path / "ck-backfill")
        ck2 = str(tmp_path / "ck-stream")
        write_iceberg(spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], SCH), tbl)
        for k in range(3):
            write_iceberg(spark.createDataFrame(
                [(100 + k, f"n{k}")], SCH), tbl)
        delete_where_iceberg(spark, tbl, "id = 4")

        got1: list = []

        def fn1(df, batch_id):
            got1.append((batch_id, [tuple(r) for r in df.collect()]))

        res = stream_changes(spark, tbl, ck1, fn1, fmt="iceberg",
                             max_versions_per_batch=2)
        seam = res["last_version"]
        assert seam == _prev_state(tbl)["current"]

        write_iceberg(spark.createDataFrame([(200, "tail")], SCH),
                      tbl)
        delete_where_iceberg(spark, tbl, "id = 0")

        got2: list = []
        _drain_foreach(
            open_changelog_stream(spark, tbl,
                                  starting_snapshot_id=seam),
            ck2, got2)

        # the per-snapshot feed is the SUM of adjacent-snapshot
        # changelogs (an endpoint diff would net out rows inserted
        # then deleted inside the range)
        sids = sorted(_prev_state(tbl)["snapshots"])
        expected: list = []
        prev_sid = None
        for sid in sids:
            expected.extend(_rows(
                read_changes_iceberg(spark, tbl, prev_sid, sid)))
            prev_sid = sid
        composed = sorted(_dedup(got1) + _dedup(got2))
        assert composed == sorted(expected)
