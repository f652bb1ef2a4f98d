"""The Delta change feed as a REAL ``spark.readStream`` source
(round 14, VERDICT r13 next-round #2): the Python DataSource API
stream reader (`streaming/readstream_cdf.py`) under Spark's own
MicroBatchExecution — stream-equals-batch against `read_changes`,
restart continuation off Spark's checkpoint, startingVersion tailing,
RESTORE synthesis, partitioned tables, the loud DV-without-cdc
refusal, and the reference's online-recommend loop
(guessLike_u_like.py:179-187) driven by a real streaming query."""

from __future__ import annotations

import os

import pytest

from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    delete_where_delta,
    merge_delta,
    read_changes,
    restore_delta,
    snapshot,
    update_where_delta,
    write_delta,
)
from hainan_big_data_recommend_system_spark.streaming.readstream_cdf import (
    DeltaChangeFeedDataSource,
    feed_schema,
    open_change_stream,
    plan_change_tasks,
)

CDF_COLS = ("_change_type", "_commit_version")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _drain(spark, sdf, name: str, ck: str) -> None:
    q = (sdf.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)


def _mem(spark, name: str):
    return spark.sql(f"select * from {name}")


class TestStreamEqualsBatch:
    def test_mixed_commits(self, spark, tmp_path):
        tbl = str(tmp_path / "t")
        write_delta(spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"),
            tbl)                                            # v0
        delete_where_delta(spark, tbl, "id = 3")            # v1 (cdc)
        merge_delta(
            spark,
            spark.createDataFrame([(4, "V4"), (40, "v40")],
                                  "id long, v string"),
            tbl, key_cols=["id"])                           # v2 (cdc)
        update_where_delta(spark, tbl, "id = 7", {"v": "'seven'"})  # v3
        last = snapshot(tbl)["version"]
        _drain(spark, open_change_stream(spark, tbl), "seb",
               str(tmp_path / "ck"))
        assert _rows(_mem(spark, "seb")) == _rows(
            read_changes(spark, tbl, -1, last))

    def test_partitioned_table(self, spark, tmp_path):
        tbl = str(tmp_path / "p")
        df = spark.createDataFrame(
            [(i, i % 3, f"v{i}") for i in range(12)],
            "id long, part long, v string")
        write_delta(df, tbl, partition_by=["part"])          # v0
        write_delta(df.filter("id >= 10"), tbl,
                    partition_by=["part"])                   # v1
        last = snapshot(tbl)["version"]
        _drain(spark, open_change_stream(spark, tbl), "part",
               str(tmp_path / "ck"))
        # the stream's column order follows the declared schema;
        # read_changes appends partition columns last — compare by
        # NAME-sorted projection
        cols = sorted(_mem(spark, "part").columns)
        got = _rows(_mem(spark, "part").select(cols))
        assert got == _rows(
            read_changes(spark, tbl, -1, last).select(cols))
        # partition values re-attached typed, not None
        pi = cols.index("part")
        assert all(r[pi] is not None for r in got)

    def test_restore_synthesis(self, spark, tmp_path):
        tbl = str(tmp_path / "r")
        a = spark.createDataFrame([(1, "a"), (2, "b")],
                                  "id long, v string")
        write_delta(a.coalesce(1), tbl)                      # v0
        write_delta(
            spark.createDataFrame([(3, "c")], "id long, v string")
            .coalesce(1), tbl, mode="overwrite")             # v1
        restore_delta(tbl, 0)                                # v2
        last = snapshot(tbl)["version"]
        _drain(spark, open_change_stream(spark, tbl), "rst",
               str(tmp_path / "ck"))
        assert _rows(_mem(spark, "rst")) == _rows(
            read_changes(spark, tbl, -1, last))


def _drain_collect(spark, sdf, ck: str, sink: list) -> None:
    """foreachBatch drain — unlike the memory sink, it SUPPORTS
    checkpoint recovery, which the restart tests exercise."""

    def on_batch(df, _bid):
        sink.extend(tuple(r) for r in df.collect())

    q = (sdf.writeStream.foreachBatch(on_batch)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)


class TestRestartAndTailing:
    def test_restart_consumes_only_new_commits(self, spark, tmp_path):
        tbl = str(tmp_path / "t")
        ck = str(tmp_path / "ck")
        write_delta(spark.createDataFrame(
            [(i, "x") for i in range(6)], "id long, v string"), tbl)
        first: list = []
        _drain_collect(spark, open_change_stream(spark, tbl), ck,
                       first)
        assert len(first) == 6
        # new commits; SAME checkpoint: only the delta arrives
        delete_where_delta(spark, tbl, "id = 0")
        write_delta(spark.createDataFrame([(100, "y")],
                                          "id long, v string"), tbl)
        second: list = []
        _drain_collect(spark, open_change_stream(spark, tbl), ck,
                       second)
        assert sorted(second) == _rows(
            read_changes(spark, tbl, 0, snapshot(tbl)["version"]))

    def test_starting_version_tails(self, spark, tmp_path):
        tbl = str(tmp_path / "t")
        write_delta(spark.createDataFrame(
            [(i, "x") for i in range(6)], "id long, v string"), tbl)
        v0 = snapshot(tbl)["version"]
        write_delta(spark.createDataFrame([(7, "y")],
                                          "id long, v string"), tbl)
        _drain(spark,
               open_change_stream(spark, tbl, starting_version=v0),
               "tail", str(tmp_path / "ck"))
        got = _rows(_mem(spark, "tail"))
        assert [r[0] for r in got] == [7]
        assert got == _rows(
            read_changes(spark, tbl, v0, snapshot(tbl)["version"]))

    def test_empty_trigger_no_rows(self, spark, tmp_path):
        tbl = str(tmp_path / "t")
        write_delta(spark.createDataFrame([(1, "x")],
                                          "id long, v string"), tbl)
        ck = str(tmp_path / "ck")
        rows: list = []
        _drain_collect(spark, open_change_stream(spark, tbl), ck, rows)
        assert len(rows) == 1
        # no new commits: a second drain delivers nothing
        rows.clear()
        _drain_collect(spark, open_change_stream(spark, tbl), ck, rows)
        assert rows == []


class TestPlannerContracts:
    def test_dv_without_cdc_fails_loud(self, spark, tmp_path):
        tbl = str(tmp_path / "dv")
        write_delta(
            spark.range(0, 50).selectExpr("id").coalesce(1), tbl)
        delete_where_delta(spark, tbl, "id < 10", inline_threshold=0,
                           change_data=False)
        with pytest.raises(ValueError, match="deletion vectors"):
            plan_change_tasks(tbl, -1, snapshot(tbl)["version"])

    def test_schema_carries_cdf_columns(self, spark, tmp_path):
        tbl = str(tmp_path / "s")
        write_delta(spark.createDataFrame([(1, "x")],
                                          "id long, v string"), tbl)
        names = [f.name for f in feed_schema(tbl).fields]
        assert names == ["id", "v", "_change_type", "_commit_version"]

    def test_one_task_per_change_file(self, spark, tmp_path):
        tbl = str(tmp_path / "n")
        write_delta(spark.createDataFrame(
            [(i, "x") for i in range(8)], "id long, v string")
            .repartition(4), tbl)
        tasks = plan_change_tasks(tbl, -1, 0)
        assert len(tasks) >= 2  # one per part file: parallel read
        assert all(t["kind"] == "file" and t["change"] == "insert"
                   for t in tasks)


class TestOnlineRecommendLoop:
    def test_reference_loop_under_real_streaming_query(
            self, spark, sf_dir, tmp_path):
        """guessLike_u_like.py:179-187 under a REAL streaming query:
        events land in a Delta table, `spark.readStream` tails its
        change feed, foreachBatch recomputes each batch's users'
        recommendations, and the KV store converges to one batch
        recompute over all events."""
        from hainan_big_data_recommend_system_spark.catalog import (
            load_table,
        )
        from hainan_big_data_recommend_system_spark.streaming.recommend import (  # noqa: E501
            build_static_state,
            recommend_batch,
        )
        from hainan_big_data_recommend_system_spark.streaming.sinks import (  # noqa: E501
            memory_kv_writer,
        )

        state = build_static_state(spark, sf_dir)
        events_tbl = str(tmp_path / "events_delta")
        ck = str(tmp_path / "ck")
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id").limit(60)
        write_delta(ev.filter("event_id % 2 = 0"), events_tbl)
        write_delta(ev.filter("event_id % 2 = 1"), events_tbl)

        store: dict = {}
        writer = memory_kv_writer(store)

        def on_batch(df, batch_id):
            writer(recommend_batch(
                df.filter("_change_type = 'insert'"), state),
                batch_id)

        q = (open_change_stream(spark, events_tbl)
             .writeStream.foreachBatch(on_batch)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        want = {
            r["kv_key"]: r["ids_csv"]
            for r in recommend_batch(ev, state).collect()
        }
        assert store == want
        # late events: a restarted query continues from the
        # checkpoint and delivers only the new commit
        more = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id").limit(80).filter("event_id > 0")
        write_delta(more, events_tbl)
        q = (open_change_stream(spark, events_tbl)
             .writeStream.foreachBatch(on_batch)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        want2 = {
            r["kv_key"]: r["ids_csv"]
            for r in recommend_batch(
                ev.unionByName(more), state).collect()
        }
        assert store == want2
        assert all(v for v in store.values())


class TestIcebergChangelogStream:
    """Round 14: the Iceberg changelog as a REAL ``spark.readStream``
    source (`open_changelog_stream`) — the Delta source's format-#2
    twin.  Offsets are snapshot ids; 'replace' (compaction) snapshots
    advance the base without emitting."""

    def _lifecycle_table(self, spark, tmp_path):
        from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (  # noqa: E501
            delete_where_iceberg,
            merge_iceberg,
            rewrite_data_files_iceberg,
            update_where_iceberg,
            write_iceberg,
        )

        tbl = str(tmp_path / "t")
        write_iceberg(spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string")
            .repartition(2), tbl)                          # s1
        delete_where_iceberg(spark, tbl, "id = 3")         # s2 posdel
        merge_iceberg(
            spark,
            spark.createDataFrame([(4, "V4"), (40, "v40")],
                                  "id long, v string"),
            tbl, key_cols=["id"])                          # s3 eqdel
        rewrite_data_files_iceberg(spark, tbl)             # s4 replace
        update_where_iceberg(spark, tbl, "id = 7",
                             {"v": "'seven'"})             # s5
        return tbl

    def _batch_feed(self, spark, tbl):
        from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (  # noqa: E501
            _prev_state,
            read_changes_iceberg,
        )

        st = _prev_state(tbl)
        ops = st["snapshot_ops"]
        frames, base = None, None
        for s in sorted(st["snapshots"]):
            if ops.get(s) == "replace":
                base = s
                continue
            f = read_changes_iceberg(spark, tbl, base, s)
            frames = f if frames is None else frames.unionByName(f)
            base = s
        return frames

    def test_stream_equals_batch_with_compaction(self, spark,
                                                 tmp_path):
        from hainan_big_data_recommend_system_spark.streaming.readstream_cdf import (  # noqa: E501
            open_changelog_stream,
        )

        tbl = self._lifecycle_table(spark, tmp_path)
        _drain(spark, open_changelog_stream(spark, tbl), "icl",
               str(tmp_path / "ck"))
        got = _rows(_mem(spark, "icl"))
        assert got == _rows(self._batch_feed(spark, tbl))
        # the compaction snapshot emitted NOTHING: the feed holds no
        # spurious rewrite noise (every delete has a matching state)
        assert len(got) == 16

    def test_restart_consumes_only_new_snapshots(self, spark,
                                                 tmp_path):
        from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (  # noqa: E501
            _prev_state,
            delete_where_iceberg,
            read_changes_iceberg,
            write_iceberg,
        )
        from hainan_big_data_recommend_system_spark.streaming.readstream_cdf import (  # noqa: E501
            open_changelog_stream,
        )

        tbl = str(tmp_path / "t")
        ck = str(tmp_path / "ck")
        write_iceberg(spark.createDataFrame(
            [(i, "x") for i in range(6)], "id long, v string"), tbl)
        first: list = []
        _drain_collect(spark, open_changelog_stream(spark, tbl), ck,
                       first)
        assert len(first) == 6
        s0 = max(_prev_state(tbl)["snapshots"])
        delete_where_iceberg(spark, tbl, "id = 0")
        write_iceberg(spark.createDataFrame(
            [(100, "y")], "id long, v string"), tbl)
        second: list = []
        _drain_collect(spark, open_changelog_stream(spark, tbl), ck,
                       second)
        want = _rows(read_changes_iceberg(
            spark, tbl, s0, max(_prev_state(tbl)["snapshots"])))
        assert sorted(second) == want

    def test_starting_snapshot_tails(self, spark, tmp_path):
        from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (  # noqa: E501
            _prev_state,
            write_iceberg,
        )
        from hainan_big_data_recommend_system_spark.streaming.readstream_cdf import (  # noqa: E501
            open_changelog_stream,
        )

        tbl = str(tmp_path / "t")
        write_iceberg(spark.createDataFrame(
            [(i, "x") for i in range(6)], "id long, v string"), tbl)
        s0 = max(_prev_state(tbl)["snapshots"])
        write_iceberg(spark.createDataFrame(
            [(7, "y")], "id long, v string"), tbl)
        _drain(spark,
               open_changelog_stream(spark, tbl,
                                     starting_snapshot_id=s0),
               "itail", str(tmp_path / "ck"))
        got = _rows(_mem(spark, "itail"))
        assert [r[0] for r in got] == [7]


class TestExactlyOnceComposition:
    def test_readstream_into_txn_watermark_writer(self, spark,
                                                  tmp_path):
        """End-to-end exactly-once under the REAL streaming engine:
        the Delta change feed (readStream) lands in a second Delta
        table through the txn-watermark writer; rerunning the SAME
        drain (and a forced redelivery via a fresh checkpoint over
        already-absorbed epochs) adds no duplicate rows."""
        from hainan_big_data_recommend_system_spark.sources.delta_sink import (  # noqa: E501
            read_delta_table,
        )
        from hainan_big_data_recommend_system_spark.streaming.sinks import (  # noqa: E501
            delta_table_writer,
        )

        src_tbl = str(tmp_path / "src")
        out_tbl = str(tmp_path / "out")
        ck = str(tmp_path / "ck")
        write_delta(spark.createDataFrame(
            [(i, "x") for i in range(8)], "id long, v string"),
            src_tbl)
        writer = delta_table_writer(out_tbl, app_id="rs-cdf")

        def on_batch(df, epoch_id):
            writer(df.select("id", "v"), epoch_id)

        def drain(ckpt):
            q = (open_change_stream(spark, src_tbl)
                 .writeStream.foreachBatch(on_batch)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(180)

        drain(ck)
        got1 = _rows(read_delta_table(spark, out_tbl))
        assert len(got1) == 8
        # same checkpoint: nothing new, nothing duplicated
        drain(ck)
        assert _rows(read_delta_table(spark, out_tbl)) == got1
        # FRESH checkpoint: the stream redelivers everything under
        # the same epoch ids — the txn watermark absorbs the replay
        drain(str(tmp_path / "ck2"))
        assert _rows(read_delta_table(spark, out_tbl)) == got1


class TestRandomizedLifecycleProperty:
    def test_random_commit_sequences_stream_equals_batch(
            self, spark, tmp_path):
        """PROPERTY: for a seeded random sequence of write verbs
        (append / overwrite / delete / update / merge / restore), the
        streamed feed equals the batch `read_changes` over the same
        range row-for-row — the planner can't drift from the verbs it
        mirrors."""
        import random

        from hainan_big_data_recommend_system_spark.sources.delta_sink import (  # noqa: E501
            restore_delta,
            update_where_delta,
        )

        rng = random.Random(0x14C0DE)
        for trial in range(3):
            tbl = str(tmp_path / f"t{trial}")
            write_delta(spark.createDataFrame(
                [(i, f"v{i}") for i in range(12)],
                "id long, v string"), tbl)
            for step in range(5):
                op = rng.randrange(5)
                if op == 0:
                    write_delta(spark.createDataFrame(
                        [(100 + step * 10 + k, "a") for k in range(3)],
                        "id long, v string"), tbl)
                elif op == 1:
                    write_delta(spark.createDataFrame(
                        [(200 + step, "o")], "id long, v string"),
                        tbl, mode="overwrite")
                elif op == 2:
                    delete_where_delta(
                        spark, tbl, f"id % 7 = {rng.randrange(7)}")
                elif op == 3:
                    update_where_delta(
                        spark, tbl, f"id % 5 = {rng.randrange(5)}",
                        {"v": "'u'"})
                else:
                    cur = snapshot(tbl)["version"]
                    restore_delta(tbl, rng.randrange(cur + 1))
            last = snapshot(tbl)["version"]
            _drain(spark, open_change_stream(spark, tbl),
                   f"rnd{trial}", str(tmp_path / f"ck{trial}"))
            got = _rows(_mem(spark, f"rnd{trial}"))
            want = _rows(read_changes(spark, tbl, -1, last))
            assert got == want, (
                f"trial {trial}: stream diverged from batch "
                f"({len(got)} vs {len(want)} rows)"
            )
