"""Delta-protocol replay semantics (operators/deltalog.py) — the
PROTOCOL.md reconciliation rules pinned: last-writer-wins, legal
absent-path removes, re-add resurrection with new metadata, and the
forward-compat reader-version gate."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.deltalog import (
    make_commit,
    parse_delta_payload,
    replay_delta_log,
)


def _log(*commits):
    return [make_commit(list(c)) for c in commits]


def test_basic_add_remove_readd():
    m = replay_delta_log(_log(
        [{"protocol": {"minReaderVersion": 1}},
         {"add": {"path": "a", "size": 10, "numRecords": 1}},
         {"add": {"path": "b", "size": 20, "numRecords": 2}}],
        [{"remove": {"path": "a", "dataChange": True}},
         {"add": {"path": "c", "size": 30, "numRecords": 3}}],
        [{"add": {"path": "a", "size": 99, "numRecords": 9}},
         {"commitInfo": {"operation": "MERGE"}}],
    ))
    assert m["version"] == 2
    assert m["live"] == {"a": (99, 9), "b": (20, 2), "c": (30, 3)}
    assert m["live_bytes"] == 149 and m["live_rows"] == 14
    assert m["n_remove_actions"] == 1


def test_absent_path_remove_is_legal():
    m = replay_delta_log(_log(
        [{"add": {"path": "a", "size": 1, "numRecords": 1}},
         {"remove": {"path": "never-added"}}],
    ))
    assert m["n_live"] == 1 and m["n_remove_actions"] == 1


def test_same_commit_remove_then_add_resurrects():
    m = replay_delta_log(_log(
        [{"add": {"path": "a", "size": 1, "numRecords": 1}}],
        [{"remove": {"path": "a"}},
         {"add": {"path": "a", "size": 7, "numRecords": 2}}],
    ))
    assert m["live"] == {"a": (7, 2)}


def test_reader_version_gate():
    # v2 (column mapping) is IMPLEMENTED since round 15 — accepted
    state = replay_delta_log(_log(
        [{"protocol": {"minReaderVersion": 2}},
         {"add": {"path": "a", "size": 1, "numRecords": 1}}],
    ))
    assert state["live"] == {"a": (1, 1)}
    # an unknown future reader version still refuses loudly
    with pytest.raises(ValueError, match="reader version"):
        replay_delta_log(_log(
            [{"protocol": {"minReaderVersion": 4}},
             {"add": {"path": "a", "size": 1, "numRecords": 1}}],
        ))


@pytest.mark.parametrize(
    "bad",
    [
        '{"add": {"path": "a", "size": 1}, "remove": {"path": "b"}}',
        '{"vacuum": {"path": "a"}}',
        '{"add": {"size": 1, "numRecords": 1}}',
        '{"add": {"path": "a", "size": -1, "numRecords": 1}}',
        '{"add": {"path": "a", "size": true, "numRecords": 1}}',
        "not json at all",
        '{"protocol": {"minReaderVersion": "x"}}',
    ],
)
def test_malformed_lines_quarantine_as_valueerror(bad):
    with pytest.raises(ValueError):
        replay_delta_log([bad])


def test_payload_split_and_unicode_gate():
    good = make_commit(
        [{"add": {"path": "a", "size": 1, "numRecords": 1}}]
    ) + "\n\n" + make_commit([{"remove": {"path": "a"}}])
    m = parse_delta_payload(good.encode())
    assert m["version"] == 1 and m["n_live"] == 0
    with pytest.raises(ValueError):
        parse_delta_payload(b"\xff\xfe{bad utf8")


def test_tombstones_track_death_version_and_resurrection():
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        vacuum_plan,
    )

    m = replay_delta_log(_log(
        [{"add": {"path": "a", "size": 10, "numRecords": 1}},
         {"add": {"path": "b", "size": 20, "numRecords": 1}}],
        [{"remove": {"path": "a"}}, {"remove": {"path": "b"}}],
        [{"add": {"path": "b", "size": 25, "numRecords": 1}}],
        [{"remove": {"path": "ghost"}}],  # absent: no tombstone
    ))
    assert m["tombstones"] == {"a": (1, 10)}  # b resurrected
    v = vacuum_plan(m, 1)
    assert (v["n_tombstones"], v["n_eligible"]) == (1, 1)
    assert v["bytes_reclaimable"] == 10
    # retention beyond the death keeps the stone
    assert vacuum_plan(m, 3)["n_eligible"] == 0
    with pytest.raises(ValueError):
        vacuum_plan(m, -1)


# ---------------------------------------------------------------------------
# checkpoints (round 8)
# ---------------------------------------------------------------------------

def _mklog(n: int) -> list[str]:
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_commit,
    )

    commits = []
    for c in range(n):
        acts = [{"protocol": {"minReaderVersion": 1}}] if c == 0 else []
        acts.append({"add": {"path": f"f{c}", "size": 100 + c,
                             "numRecords": 10 + c % 7, "dataChange": True}})
        if c >= 1 and c % 3 == 0:
            acts.append({"remove": {"path": f"f{c - 2}",
                                    "dataChange": True}})
        commits.append(make_commit(acts))
    return commits


def test_checkpoint_plus_tail_equals_full_replay():
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_checkpoint_parquet,
        make_last_checkpoint,
        replay_delta_log,
        replay_from_checkpoint,
    )

    commits = _mklog(27)
    full = replay_delta_log(commits)
    for ck_v in (9, 19, 26):
        state = replay_delta_log(commits[: ck_v + 1])
        ck = make_checkpoint_parquet(state)
        got = replay_from_checkpoint(
            make_last_checkpoint(ck_v, len(ck)), ck, commits[ck_v + 1 :]
        )
        for k in ("version", "n_live", "live_bytes", "live_rows",
                  "live", "tombstones"):
            assert got[k] == full[k], (ck_v, k)


def _mklog_partitioned(n: int) -> list[str]:
    """Adds carry REAL partitionValues maps (dt/region), some empty —
    the delta-io partitioned-table shape."""
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_commit,
    )

    commits = []
    for c in range(n):
        acts = [{"protocol": {"minReaderVersion": 1}}] if c == 0 else []
        pv = (
            {} if c % 5 == 4
            else {"dt": f"2024-01-{c % 9 + 1:02d}", "region": f"r{c % 3}"}
        )
        acts.append({"add": {"path": f"f{c}", "size": 100 + c,
                             "numRecords": 10 + c % 7,
                             "partitionValues": pv, "dataChange": True}})
        if c >= 1 and c % 3 == 0:
            acts.append({"remove": {"path": f"f{c - 2}",
                                    "dataChange": True}})
        commits.append(make_commit(acts))
    return commits


def test_checkpoint_preserves_partition_values():
    """VERDICT r9 item #1 close-out: the checkpoint carries
    add.partitionValues as a REAL parquet MAP column, the hand reader
    Dremel-reassembles it, and checkpoint+tail replay equals the full
    JSON replay on partition_values too."""
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_checkpoint_parquet,
        make_last_checkpoint,
        replay_delta_log,
        replay_from_checkpoint,
    )

    commits = _mklog_partitioned(27)
    full = replay_delta_log(commits)
    assert full["partition_values"]  # fixture genuinely partitioned
    assert any(
        p in full["live"] and p not in full["partition_values"]
        for p in full["live"]
    )  # and some live files carry the empty map
    for ck_v in (9, 19, 26):
        state = replay_delta_log(commits[: ck_v + 1])
        ck = make_checkpoint_parquet(state)
        got = replay_from_checkpoint(
            make_last_checkpoint(ck_v, len(ck)), ck, commits[ck_v + 1 :]
        )
        for k in ("version", "n_live", "live_bytes", "live_rows",
                  "live", "tombstones", "partition_values"):
            assert got[k] == full[k], (ck_v, k)


def test_checkpoint_map_column_is_real_parquet_map():
    """pyarrow must read the partitionValues column back as a MAP —
    proving the layout is the spec shape, not a struct substitution."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_checkpoint_parquet,
        replay_delta_log,
    )

    ck = make_checkpoint_parquet(replay_delta_log(_mklog_partitioned(12)))
    table = pq.read_table(io.BytesIO(ck))
    field = table.schema.field("add").type.field("partitionValues")
    assert pa.types.is_map(field.type)


def test_checkpoint_roundtrip_preserves_tombstone_versions():
    """VACUUM planning after a checkpointed read must equal planning
    after a full replay — death versions ride the checkpoint."""
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_checkpoint_parquet,
        make_last_checkpoint,
        replay_delta_log,
        replay_from_checkpoint,
        vacuum_plan,
    )

    commits = _mklog(25)
    full = replay_delta_log(commits)
    ck = make_checkpoint_parquet(replay_delta_log(commits[:20]))
    got = replay_from_checkpoint(
        make_last_checkpoint(19, len(ck)), ck, commits[20:]
    )
    assert vacuum_plan(got, 5) == vacuum_plan(full, 5)


def test_checkpoint_read_uses_hand_decoder_on_arrow_file():
    """The checkpoint file is genuinely pyarrow-written parquet with
    struct columns; the hand decoder must read the dotted leaves."""
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_checkpoint_parquet,
        read_checkpoint_parquet,
        replay_delta_log,
    )
    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        read_leaf_column,
    )

    state = replay_delta_log(_mklog(25))
    ck = make_checkpoint_parquet(state)
    live, tombstones, pv, schema, dvs, fstats, _, _ = read_checkpoint_parquet(ck)
    assert live == state["live"]
    assert tombstones == state["tombstones"]
    # and pyarrow agrees with the hand decoder on a leaf
    import io

    import pyarrow.parquet as pq

    table = pq.read_table(io.BytesIO(ck))
    want = [r["path"] if r is not None else None
            for r in table.column("add").to_pylist()]
    got = read_leaf_column(ck, 0, "add.path", with_nulls=True)["values"]
    assert got == want


def test_last_checkpoint_serde_rejects_bad_fields():
    import pytest

    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        parse_last_checkpoint,
    )

    for bad in ('{"version": -1, "size": 3}', '{"version": true, "size": 3}',
                '{"size": 3}', "[]", "not json"):
        with pytest.raises(ValueError):
            parse_last_checkpoint(bad)


def test_checkpoint_rejects_conflicting_action_row():
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        read_checkpoint_parquet,
    )

    both = pa.table({
        "add": pa.array([{"path": "a", "size": 1, "numRecords": 1}],
                        type=pa.struct([("path", pa.string()),
                                        ("size", pa.int64()),
                                        ("numRecords", pa.int64())])),
        "remove": pa.array([{"path": "b", "deletionVersion": 1, "size": 1}],
                           type=pa.struct([("path", pa.string()),
                                           ("deletionVersion", pa.int64()),
                                           ("size", pa.int64())])),
    })
    buf = io.BytesIO()
    pq.write_table(both, buf, compression="snappy")
    with pytest.raises(ValueError, match="single action"):
        read_checkpoint_parquet(buf.getvalue())


# ---------------------------------------------------------------------------
# schema evolution (round 9, VERDICT r8 #7)
# ---------------------------------------------------------------------------

_SCHEMA_A = ('{"type":"struct","fields":[{"name":"id","type":"long"},'
             '{"name":"v","type":"string"}]}')
_SCHEMA_B = ('{"type":"struct","fields":[{"name":"id","type":"long"},'
             '{"name":"v","type":"string"},'
             '{"name":"added_col","type":"integer"}]}')


def _mklog_evolving(n: int, change_at: int) -> list[str]:
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_commit,
    )

    commits = []
    for c in range(n):
        acts = []
        if c == 0:
            acts += [{"protocol": {"minReaderVersion": 1}},
                     {"metaData": {"id": "t", "schemaString": _SCHEMA_A}}]
        if c == change_at:  # add-column evolution mid-log
            acts.append(
                {"metaData": {"id": "t", "schemaString": _SCHEMA_B}}
            )
        acts.append({"add": {"path": f"f{c}", "size": 10 + c,
                             "numRecords": 1, "dataChange": True}})
        commits.append(make_commit(acts))
    return commits


def test_schema_evolution_snapshot_and_time_travel():
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        replay_delta_log,
    )

    commits = _mklog_evolving(12, change_at=7)
    full = replay_delta_log(commits)
    assert full["schema_json"] == _SCHEMA_B
    assert full["schema_version"] == 7
    # time travel: a prefix replay surfaces the schema AS OF then
    tt = replay_delta_log(commits[:7])
    assert tt["schema_json"] == _SCHEMA_A
    assert tt["schema_version"] == 0
    at_change = replay_delta_log(commits[:8])
    assert at_change["schema_json"] == _SCHEMA_B


def test_schema_rides_the_checkpoint():
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_checkpoint_parquet,
        make_last_checkpoint,
        replay_delta_log,
        replay_from_checkpoint,
    )

    commits = _mklog_evolving(12, change_at=4)
    full = replay_delta_log(commits)
    # checkpoint AFTER the change: the schema must survive compaction
    # (the metaData action itself is gone from the tail)
    state = replay_delta_log(commits[:10])
    ck = make_checkpoint_parquet(state)
    got = replay_from_checkpoint(
        make_last_checkpoint(9, len(ck)), ck, commits[10:]
    )
    assert got["schema_json"] == full["schema_json"] == _SCHEMA_B
    assert got["live"] == full["live"]
    # checkpoint BEFORE the change: the tail's metaData wins
    commits2 = _mklog_evolving(12, change_at=8)
    state2 = replay_delta_log(commits2[:5])
    ck2 = make_checkpoint_parquet(state2)
    got2 = replay_from_checkpoint(
        make_last_checkpoint(4, len(ck2)), ck2, commits2[5:]
    )
    assert got2["schema_json"] == _SCHEMA_B


def test_bad_schema_string_quarantines():
    import pytest

    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_commit,
        replay_delta_log,
    )

    with pytest.raises(ValueError, match="schemaString"):
        replay_delta_log([make_commit(
            [{"metaData": {"schemaString": 7}},
             {"add": {"path": "a", "size": 1, "numRecords": 1}}]
        )])
