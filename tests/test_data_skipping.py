"""Delta per-file statistics + data skipping (round 10).

The sink stamps ``add.stats`` (numRecords/minValues/maxValues, computed
from the hand-parsed parquet footer), the replay tracks them
last-writer-wins, checkpoints carry them as the protocol's stats
string, and `prune_live_files` turns a range predicate into a
provably-safe file subset — the open-a-handful-of-millions lever.
"""

import json
import os

import pytest

from hainan_big_data_recommend_system_spark.operators.deltalog import (
    make_checkpoint_parquet,
    make_commit,
    prune_live_files,
    read_checkpoint_parquet,
    replay_delta_log,
)


def _add(path, rows, mn=None, mx=None, stats=True):
    body = {"path": path, "size": 1000, "numRecords": rows,
            "dataChange": True}
    if stats:
        st = {"numRecords": rows}
        if mn is not None:
            st["minValues"] = {"id": mn}
            st["maxValues"] = {"id": mx}
        body["stats"] = json.dumps(st)
    return {"add": body}


def _commit(*actions):
    return make_commit(list(actions))


def test_replay_tracks_stats():
    snap = replay_delta_log([
        _commit(_add("a.parquet", 10, 0, 99)),
        _commit(_add("b.parquet", 10, 100, 199)),
    ])
    assert set(snap["file_stats"]) == {"a.parquet", "b.parquet"}
    assert snap["file_stats"]["a.parquet"]["maxValues"] == {"id": 99}


def test_remove_and_readd_clear_stats():
    snap = replay_delta_log([
        _commit(_add("a.parquet", 10, 0, 99)),
        _commit({"remove": {"path": "a.parquet", "dataChange": True}}),
        _commit(_add("b.parquet", 5, 0, 9)),
        _commit(_add("b.parquet", 5, stats=False)),  # rewrite w/o stats
    ])
    assert snap["file_stats"] == {}


def test_stats_numrecords_crosscheck():
    bad = {"add": {"path": "x.parquet", "size": 1, "numRecords": 10,
                   "stats": json.dumps({"numRecords": 9}),
                   "dataChange": True}}
    with pytest.raises(ValueError, match="disagrees"):
        replay_delta_log([_commit(bad)])


def test_prune_skips_disjoint_files():
    snap = replay_delta_log([
        _commit(
            _add("f0.parquet", 10, 0, 99),
            _add("f1.parquet", 10, 100, 199),
            _add("f2.parquet", 10, 200, 299),
            _add("f3.parquet", 10, stats=False),  # no stats → kept
        ),
    ])
    pr = prune_live_files(snap, "id", lo=120, hi=150)
    assert set(pr["kept"]) == {"f1.parquet", "f3.parquet"}
    assert (pr["n_kept"], pr["n_skipped"], pr["n_no_stats"]) == (2, 2, 1)
    assert pr["rows_kept_max"] == 20
    # open bounds
    assert set(prune_live_files(snap, "id", lo=250)["kept"]) == {
        "f2.parquet", "f3.parquet"
    }
    assert set(prune_live_files(snap, "id", hi=99)["kept"]) == {
        "f0.parquet", "f3.parquet"
    }
    # a column nobody has stats for keeps everything
    pr2 = prune_live_files(snap, "other", lo=0, hi=0)
    assert pr2["n_kept"] == 4 and pr2["n_no_stats"] == 4
    with pytest.raises(ValueError, match="at least one bound"):
        prune_live_files(snap, "id")


def test_checkpoint_roundtrips_stats():
    snap = replay_delta_log([
        _commit(_add("a.parquet", 10, 0, 99),
                _add("b.parquet", 10, stats=False)),
    ])
    ck = make_checkpoint_parquet(snap)
    live, _, _, _, _, fstats, _, _ = read_checkpoint_parquet(ck)
    assert live == snap["live"]
    assert fstats == snap["file_stats"]
    assert "b.parquet" not in fstats


def test_sink_writes_footer_derived_stats(spark, tmp_path):
    """End-to-end: Spark-written files → hand footer reader → stats on
    the add action → pruning proves disjoint files skippable."""
    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        read_log_commits,
        write_delta,
    )

    tbl = str(tmp_path / "tbl")
    df = spark.range(0, 1000).selectExpr("id", "id * 3 AS v")
    # three commits over disjoint id ranges, one file each
    for k in range(3):
        write_delta(
            df.where(f"id >= {k * 300} AND id < {(k + 1) * 300}")
            .coalesce(1),
            tbl,
        )
    snap = replay_delta_log(read_log_commits(tbl))
    assert len(snap["file_stats"]) == 3
    for st in snap["file_stats"].values():
        assert set(st["minValues"]) == {"id", "v"}
    pr = prune_live_files(snap, "id", lo=0, hi=299)
    assert (pr["n_kept"], pr["n_skipped"], pr["n_no_stats"]) == (1, 2, 0)
    got = spark.read.parquet(
        *[os.path.join(tbl, p) for p in pr["kept"]]
    ).where("id BETWEEN 0 AND 299")
    assert got.count() == 300
    # the v column prunes independently (v = 3*id)
    prv = prune_live_files(snap, "v", lo=900, hi=1000)
    assert prv["n_kept"] == 1


# ---------------------------------------------------------------------------
# partitioned writes + partition pruning (round 10)
# ---------------------------------------------------------------------------

def test_partitioned_write_and_prune(spark, tmp_path):
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        prune_by_partition,
    )
    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        read_log_commits,
        write_delta,
    )

    tbl = str(tmp_path / "tbl")
    df = spark.range(0, 300).selectExpr(
        "id", "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 "
        "THEN 'b' ELSE 'c' END AS cat"
    ).repartition(1)
    r = write_delta(df, tbl, partition_by=["cat"])
    assert r["n_files"] == 3  # one per partition value
    snap = replay_delta_log(read_log_commits(tbl))
    pv = snap["partition_values"]
    assert sorted(v["cat"] for v in pv.values()) == ["a", "b", "c"]
    # data files live under Hive dirs and do NOT contain the column
    (a_path,) = [p for p, v in pv.items() if v["cat"] == "a"]
    assert a_path.startswith("cat=a/")
    cols = spark.read.parquet(os.path.join(tbl, a_path)).columns
    assert cols == ["id"]
    # metaData records the partition columns
    assert '"partitionColumns": ["cat"]' in read_log_commits(tbl)[0] \
        or '"partitionColumns":["cat"]' in read_log_commits(tbl)[0]
    # pruning keeps exactly the wanted partition
    pr = prune_by_partition(snap, {"cat": {"b"}})
    assert pr["n_kept"] == 1 and pr["n_skipped"] == 2
    (b_path,) = pr["kept"]
    got = spark.read.parquet(os.path.join(tbl, b_path))
    assert got.count() == 100
    # stats prune composes inside the survivors
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        prune_live_files,
    )

    sub = dict(snap)
    sub["live"] = pr["kept"]
    pr2 = prune_live_files(sub, "id", lo=0, hi=10)
    assert pr2["n_kept"] == 1  # id range spans all partitions


def test_partition_prune_keeps_unconstrained_files():
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        prune_by_partition,
    )

    snap = {
        "live": {"p.parquet": (1, 1), "q.parquet": (1, 1)},
        "partition_values": {"p.parquet": {"cat": "a"}},
    }
    pr = prune_by_partition(snap, {"cat": {"zzz"}})
    # q has no cat value → must be kept; p provably mismatches
    assert set(pr["kept"]) == {"q.parquet"}
    assert pr["n_no_stats"] == 1
    import pytest

    with pytest.raises(ValueError, match="constraint"):
        prune_by_partition(snap, {})


def test_optimize_partitioned_keeps_partition_values(spark, tmp_path):
    """Round 11 (superseding the r10 loud guard): partitioned tables
    compact PER PARTITION — values preserved, no cross-partition
    file."""
    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        optimize_delta,
        snapshot,
        write_delta,
    )

    tbl = str(tmp_path / "tbl")
    df = spark.range(0, 10).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END AS cat"
    )
    write_delta(df, tbl, partition_by=["cat"])
    write_delta(df.selectExpr("id + 10 AS id", "cat"), tbl,
                partition_by=["cat"])
    res = optimize_delta(spark, tbl)
    assert res["n_compacted"] >= 4 and res["n_files"] == 2
    snap = snapshot(tbl)
    assert sorted(
        v["cat"] for v in snap["partition_values"].values()
    ) == ["x", "y"]
    assert snap["live_rows"] == 20


def test_string_column_bounds_prune_both_formats(spark, tmp_path):
    """Round 11: string keys (dates, languages, ids) skip too — both
    sinks stamp BYTE_ARRAY bounds from the modern footer
    min_value/max_value fields (legacy byte-array stats are never
    trusted: their signed ordering is wrong for UTF-8), and the shared
    pruner compares them lexicographically."""
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        prune_live_files,
        replay_delta_log,
    )
    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        read_log_commits,
        write_delta,
    )
    from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
        read_table,
        write_iceberg,
    )

    days = [f"2024-01-{d:02d}" for d in range(1, 9)]
    dtbl = str(tmp_path / "d")
    itbl = str(tmp_path / "i")
    for day in days:
        df = spark.createDataFrame(
            [(day, i) for i in range(20)], "day string, v long"
        ).coalesce(1)
        write_delta(df, dtbl)
        write_iceberg(df, itbl)

    dsnap = replay_delta_log(read_log_commits(dtbl))
    isnap = read_table(itbl)
    for snap in (dsnap, isnap):
        pr = prune_live_files(snap, "day",
                              lo="2024-01-03", hi="2024-01-04")
        assert pr["n_kept"] == 2 and pr["n_skipped"] == 6, pr
        assert pr["n_no_stats"] == 0
    # a half-open probe works too
    pr = prune_live_files(dsnap, "day", lo="2024-01-07")
    assert pr["n_kept"] == 2
