"""The lake change feeds as a streaming source (round 13, VERDICT r12
What's missing #1 / next-round #3):

- stream-equals-batch: the streamed feed over versions (v0, vN] —
  one micro-batch per commit — unions to exactly the batch
  `read_changes` / `read_changes_iceberg` call over the same range;
- restart continuation: a second drain consumes only commits made
  after the first;
- crash-window replay: a dangling uncommitted batch is redelivered
  under its original batch_id, and composing with the txn-watermark
  Delta writer absorbs the replay exactly-once (no duplicate rows in
  the downstream table).
"""

from __future__ import annotations

import json
import os

import pytest

from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    delete_where_delta,
    merge_delta,
    read_changes,
    snapshot,
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
from hainan_big_data_recommend_system_spark.streaming.sinks import (
    delta_table_writer,
)


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _build_delta(spark, tbl):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string")
    write_delta(df, tbl)                                   # v0
    delete_where_delta(spark, tbl, "id = 3")               # v1
    src = spark.createDataFrame([(4, "V4"), (40, "v40")],
                                "id long, v string")
    merge_delta(spark, src, tbl, key_cols=["id"])          # v2
    return snapshot(tbl)["version"]


class TestDeltaStream:
    def test_stream_equals_batch(self, spark, tmp_path):
        tbl = str(tmp_path / "src")
        ck = str(tmp_path / "ck")
        last = _build_delta(spark, tbl)
        batches = []
        res = stream_changes(
            spark, tbl, ck,
            lambda df, bid: batches.append((bid, df.toPandas())),
        )
        assert res["last_version"] == last
        assert res["n_batches"] == last + 1  # one per commit
        assert res["n_redelivered"] == 0
        cols = ["id", "v", "_change_type", "_commit_version"]
        streamed = sorted(
            tuple(row[c] for c in cols)
            for _, pdf in batches for row in pdf.to_dict("records")
        )
        want = _sorted_rows(
            read_changes(spark, tbl, -1, last).select(*cols), cols)
        assert streamed == want

    def test_restart_consumes_only_new_commits(self, spark, tmp_path):
        tbl = str(tmp_path / "src2")
        ck = str(tmp_path / "ck2")
        _build_delta(spark, tbl)
        stream_changes(spark, tbl, ck, lambda df, bid: df.count())
        # nothing new: a drain is a no-op
        res = stream_changes(spark, tbl, ck, lambda df, bid: df.count())
        assert res["n_batches"] == 0
        delete_where_delta(spark, tbl, "id = 5")           # v3
        seen = []
        res = stream_changes(
            spark, tbl, ck,
            lambda df, bid: seen.extend(
                df.select("_commit_version").distinct().collect()),
        )
        assert res["n_batches"] == 1
        assert sorted(r["_commit_version"] for r in seen) == [3]

    def test_crash_window_redelivers_same_batch_id(self, spark, tmp_path):
        tbl = str(tmp_path / "src3")
        ck = str(tmp_path / "ck3")
        last = _build_delta(spark, tbl)
        stream_changes(spark, tbl, ck, lambda df, bid: None)
        # simulate a crash after the intent write but before the
        # commit marker: drop the newest commit marker
        com = os.path.join(ck, "commits")
        newest = max(int(f) for f in os.listdir(com))
        os.unlink(os.path.join(com, str(newest)))
        got = []
        res = stream_changes(
            spark, tbl, ck, lambda df, bid: got.append(bid))
        assert res["n_redelivered"] == 1
        assert got == [newest]
        intent = json.loads(open(
            os.path.join(ck, "offsets", f"{newest}.json")).read())
        assert intent["v_to"] == last

    def test_exactly_once_into_delta_sink(self, spark, tmp_path):
        """The at-least-once replay is absorbed by the txn watermark:
        crash-redelivering a batch into `delta_table_writer` writes no
        duplicate rows."""
        src = str(tmp_path / "src4")
        tgt = str(tmp_path / "tgt4")
        ck = str(tmp_path / "ck4")
        _build_delta(spark, src)
        writer = delta_table_writer(tgt, app_id="cdf-test")

        def apply_batch(df, bid):
            writer(df.select("id", "v", "_change_type"), bid)

        stream_changes(spark, src, ck, apply_batch)
        n_before = snapshot(tgt)["live_rows_after_dv"]
        com = os.path.join(ck, "commits")
        newest = max(int(f) for f in os.listdir(com))
        os.unlink(os.path.join(com, str(newest)))
        res = stream_changes(spark, src, ck, apply_batch)
        assert res["n_redelivered"] == 1
        assert snapshot(tgt)["live_rows_after_dv"] == n_before

    def test_batching_by_range(self, spark, tmp_path):
        tbl = str(tmp_path / "src5")
        ck = str(tmp_path / "ck5")
        last = _build_delta(spark, tbl)
        res = stream_changes(
            spark, tbl, ck, lambda df, bid: None,
            max_versions_per_batch=10,
        )
        assert res["n_batches"] == 1
        assert res["last_version"] == last


class TestIcebergStream:
    def _build(self, spark, tbl):
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string")
        write_iceberg(df, tbl)                              # sid 1
        delete_where_iceberg(spark, tbl, "id = 3")          # sid 2
        write_iceberg(
            spark.createDataFrame([(40, "v40")], "id long, v string"),
            tbl,
        )                                                   # sid 3
        return _prev_state(tbl)["current"]

    def test_stream_equals_batch(self, spark, tmp_path):
        """The per-snapshot streamed feed is FINER than the endpoint
        batch diff (an insert-then-delete of the same row surfaces in
        the stream and cancels in the diff), so the equality that must
        hold is the NET one — the same alive(A) + inserts − deletes ==
        alive(B) equation the `iceberg_changelog_roundtrip` oracle
        pins: applying the streamed feed to the empty table yields
        exactly the final live rows."""
        from collections import Counter

        from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
            read_table,
        )

        tbl = str(tmp_path / "ice")
        ck = str(tmp_path / "ick")
        cur = self._build(spark, tbl)
        batches = []
        res = stream_changes(
            spark, tbl, ck,
            lambda df, bid: batches.append(df.toPandas()),
            fmt="iceberg",
        )
        assert res["last_version"] == cur
        assert res["n_batches"] == 3
        net = Counter()
        for pdf in batches:
            for row in pdf.to_dict("records"):
                key = (row["id"], row["v"])
                if row["_change_type"] == "insert":
                    net[key] += 1
                else:
                    net[key] -= 1
        net = Counter({k: n for k, n in net.items() if n})
        st = read_table(tbl)
        import os as _os

        alive = Counter()
        for r in spark.read.parquet(
            *[_os.path.join(tbl, p) for p in sorted(st["live"])]
        ).collect():
            alive[(r["id"], r["v"])] += 1
        # apply position deletes (the st live set is file-level)
        assert st["live_rows_after_deletes"] == sum(net.values())
        # net stream == endpoint diff of the batch verb
        diff = Counter()
        for r in read_changes_iceberg(spark, tbl, None, cur).collect():
            key = (r["id"], r["v"])
            diff[key] += 1 if r["_change_type"] == "insert" else -1
        assert net == Counter({k: n for k, n in diff.items() if n})

    def test_compaction_snapshot_skipped(self, spark, tmp_path):
        """A rewrite_data_files snapshot changes no logical rows: the
        stream must advance PAST it without pushing the rewritten
        file set through the feed as delete+insert noise."""
        from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
            rewrite_data_files_iceberg,
        )

        tbl = str(tmp_path / "icecomp")
        ck = str(tmp_path / "ickc")
        self._build(spark, tbl)                              # sids 1-3
        stream_changes(spark, tbl, ck, lambda df, bid: None,
                       fmt="iceberg")
        r = rewrite_data_files_iceberg(spark, tbl)           # sid 4
        assert r["version"] is not None
        write_iceberg(
            spark.createDataFrame([(50, "v50")], "id long, v string"),
            tbl,
        )                                                    # sid 5
        seen = []
        res = stream_changes(
            spark, tbl, ck,
            lambda df, bid: seen.extend(df.collect()),
            fmt="iceberg",
        )
        assert res["n_skipped"] == 1
        assert res["n_batches"] == 1
        assert sorted((x["id"], x["_change_type"]) for x in seen) == [
            (50, "insert")
        ]
        # the checkpoint advanced past the replace snapshot
        assert res["last_version"] == 5

    def test_restart_continuation(self, spark, tmp_path):
        tbl = str(tmp_path / "ice2")
        ck = str(tmp_path / "ick2")
        self._build(spark, tbl)
        stream_changes(spark, tbl, ck, lambda df, bid: None,
                       fmt="iceberg")
        delete_where_iceberg(spark, tbl, "id = 5")
        seen = []
        res = stream_changes(
            spark, tbl, ck,
            lambda df, bid: seen.extend(df.collect()),
            fmt="iceberg",
        )
        assert res["n_batches"] == 1
        assert sorted((r["id"], r["_change_type"]) for r in seen) == [
            (5, "delete")
        ]


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown change-feed format"):
        stream_changes(spark, str(tmp_path / "x"), str(tmp_path / "c"),
                       lambda df, bid: None, fmt="hudi")
