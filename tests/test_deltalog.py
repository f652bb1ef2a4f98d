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
    with pytest.raises(ValueError, match="reader version"):
        replay_delta_log(_log(
            [{"protocol": {"minReaderVersion": 2}},
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
