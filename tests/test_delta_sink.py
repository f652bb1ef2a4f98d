"""Delta table SINK (sources/delta_sink.py): transactional commits,
append/overwrite semantics, put-if-absent version claims, checkpoint
cadence, and read-back through the same log resolution the table-read
queries use."""

from __future__ import annotations

import json
import os

import pytest

from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    read_log_commits,
    snapshot,
    write_delta,
)


def _read_live(spark, table_dir):
    snap = snapshot(table_dir)
    paths = [os.path.join(table_dir, p) for p in sorted(snap["live"])]
    if not paths:
        return []
    return sorted(
        (r["k"], r["v"])
        for r in spark.read.parquet(*paths).collect()
    )


def test_append_append_overwrite(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    df2 = spark.createDataFrame([(3, "c")], "k long, v string")
    df3 = spark.createDataFrame([(9, "z")], "k long, v string")
    r1 = write_delta(df1.coalesce(1), t)
    r2 = write_delta(df2.coalesce(1), t)
    assert (r1["version"], r2["version"]) == (0, 1)
    assert r1["n_records"] == 2 and r2["n_records"] == 1
    assert _read_live(spark, t) == [(1, "a"), (2, "b"), (3, "c")]
    r3 = write_delta(df3.coalesce(1), t, mode="overwrite")
    assert r3["version"] == 2 and r3["n_removed"] == 2
    assert _read_live(spark, t) == [(9, "z")]
    # removed files still EXIST on disk (not yet vacuumed) — the log,
    # not the directory, is the source of truth
    snap = snapshot(t)
    on_disk = {f for f in os.listdir(t) if f.endswith(".parquet")}
    assert set(snap["live"]) < on_disk
    # time travel: version 1 still sees the pre-overwrite rows
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        replay_delta_log,
    )

    tt = replay_delta_log(read_log_commits(t)[:2])
    assert tt["live_rows"] == 3


def test_schema_string_is_real_spark_schema(spark, tmp_path):
    t = str(tmp_path / "tbl2")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    write_delta(df.coalesce(1), t)
    snap = snapshot(t)
    schema = json.loads(snap["schema_json"])
    assert [f["name"] for f in schema["fields"]] == ["k", "v"]
    # numRecords in the log came from the HAND footer reader
    assert snap["live_rows"] == 1


def test_put_if_absent_conflict_retries(spark, tmp_path):
    t = str(tmp_path / "tbl3")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    write_delta(df.coalesce(1), t)
    # simulate a rival writer claiming version 1 between the read and
    # the claim: pre-create the commit file the sink will want
    rival = os.path.join(t, "_delta_log", f"{1:020d}.json")
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_commit,
    )

    with open(rival, "w") as fh:
        fh.write(make_commit(
            [{"add": {"path": "rival.parquet", "size": 1,
                      "numRecords": 0, "dataChange": True}}]
        ))
    r = write_delta(df.coalesce(1), t)
    # the sink lost version 1 and retried onto version 2
    assert r["version"] == 2
    snap = snapshot(t)
    assert "rival.parquet" in snap["live"]


def test_checkpoint_cadence_and_fast_path(spark, tmp_path):
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        replay_delta_log,
        replay_from_checkpoint,
    )

    t = str(tmp_path / "tbl4")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    for _ in range(5):
        write_delta(df.coalesce(1), t, checkpoint_interval=5)
    ld = os.path.join(t, "_delta_log")
    assert os.path.exists(os.path.join(ld, f"{4:020d}.checkpoint.parquet"))
    lc = open(os.path.join(ld, "_last_checkpoint")).read()
    ck = open(
        os.path.join(ld, f"{4:020d}.checkpoint.parquet"), "rb"
    ).read()
    commits = read_log_commits(t)
    full = replay_delta_log(commits)
    fast = replay_from_checkpoint(lc, ck, commits[5:])
    for k in ("live", "live_rows", "schema_json"):
        assert fast[k] == full[k]


def test_version_gap_rejected(tmp_path):
    t = str(tmp_path / "tbl5")
    ld = os.path.join(t, "_delta_log")
    os.makedirs(ld)
    for v in (0, 2):
        with open(os.path.join(ld, f"{v:020d}.json"), "w") as fh:
            fh.write('{"add": {"path": "x", "size": 1, "numRecords": 1}}')
    with pytest.raises(ValueError, match="gap"):
        read_log_commits(t)
