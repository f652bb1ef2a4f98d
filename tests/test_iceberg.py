"""Iceberg-shaped snapshot resolution (operators/iceberg.py) — the
metadata-tree walk, time travel, and the count cross-check contract.
The cross-engine gate lives in test_oracle.py (iceberg_snapshot_scan)."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.iceberg import (
    make_manifest,
    make_manifest_list,
    make_table_metadata,
    parse_table_metadata,
    snapshot_live_files,
)


def _fixture():
    m1 = make_manifest([
        {"status": 1, "file_path": "f0", "record_count": 10,
         "file_size": 100, "snapshot_id": 100,
         "partition": {"dt": "2024-01-01"}},
        {"status": 1, "file_path": "f1", "record_count": 20,
         "file_size": 200, "partition": {"dt": "2024-01-02"}},
    ], partition_fields=("dt",))
    m2 = make_manifest([
        {"status": 0, "file_path": "f0", "record_count": 10,
         "file_size": 100, "partition": {"dt": "2024-01-01"}},
        {"status": 2, "file_path": "f1", "record_count": 20,
         "file_size": 200, "partition": {"dt": "2024-01-02"}},
        {"status": 1, "file_path": "f2", "record_count": 30,
         "file_size": 300, "partition": {"dt": None}},
    ], partition_fields=("dt",))
    files = {
        "m1": m1,
        "m2": m2,
        "ml1": make_manifest_list([
            {"manifest_path": "m1", "manifest_length": len(m1),
             "added_files_count": 2,
             "existing_files_count": 0, "deleted_files_count": 0}
        ]),
        "ml2": make_manifest_list([
            {"manifest_path": "m2", "manifest_length": len(m2),
             "added_files_count": 1,
             "existing_files_count": 1, "deleted_files_count": 1}
        ]),
    }
    meta = make_table_metadata({100: "ml1", 200: "ml2"}, current=200)
    return meta, files


def test_current_snapshot_and_time_travel():
    meta, files = _fixture()
    snap = snapshot_live_files(meta, files.__getitem__)
    assert snap["snapshot_id"] == 200
    assert snap["live"] == {"f0": (100, 10), "f2": (300, 30)}
    assert snap["n_deleted_entries"] == 1
    # partition tuples ride the nested data_file struct (null kept)
    assert snap["partition_values"] == {
        "f0": {"dt": "2024-01-01"}, "f2": {"dt": None},
    }
    tt = snapshot_live_files(meta, files.__getitem__, snapshot_id=100)
    assert tt["live"] == {"f0": (100, 10), "f1": (200, 20)}
    assert tt["partition_values"]["f1"] == {"dt": "2024-01-02"}


def test_manifest_length_cross_check_fails_loudly():
    meta, files = _fixture()
    files["m2"] = files["m2"] + b"\x00"  # corrupt: one trailing byte
    with pytest.raises(ValueError, match="manifest-list entry declares"):
        snapshot_live_files(meta, files.__getitem__)


def test_manifest_is_spec_nested_layout():
    """The manifest's embedded schema must nest data_file (record) and
    a partition tuple record — not flat fields."""
    import json

    from hainan_big_data_recommend_system_spark.operators.avrocf import (
        parse_avro,
    )

    meta, files = _fixture()
    out = parse_avro(files["m1"])
    assert set(out["records"][0]) == {
        "status", "snapshot_id", "sequence_number", "data_file",
    }
    df = out["records"][0]["data_file"]
    assert df["file_path"] == "f0" and df["file_format"] == "PARQUET"
    assert df["partition"] == {"dt": "2024-01-01"}
    assert out["records"][0]["snapshot_id"] == 100
    assert out["records"][1]["snapshot_id"] is None


def test_manifest_list_count_cross_check_fails_loudly():
    meta, files = _fixture()
    files["ml2"] = make_manifest_list([
        {"manifest_path": "m2", "manifest_length": len(files["m2"]),
         "added_files_count": 2,  # wrong
         "existing_files_count": 1, "deleted_files_count": 1}
    ])
    with pytest.raises(ValueError, match="counts disagree"):
        snapshot_live_files(meta, files.__getitem__)


def test_metadata_validation():
    with pytest.raises(ValueError):
        parse_table_metadata("not json")
    with pytest.raises(ValueError, match="format-version"):
        parse_table_metadata(
            '{"format-version": 9, "current-snapshot-id": 1,'
            ' "snapshots": [{"snapshot-id": 1, "manifest-list": "x"}]}'
        )
    with pytest.raises(ValueError, match="not in the snapshot"):
        parse_table_metadata(
            '{"format-version": 2, "current-snapshot-id": 7,'
            ' "snapshots": [{"snapshot-id": 1, "manifest-list": "x"}]}'
        )
    meta, files = _fixture()
    with pytest.raises(ValueError, match="snapshot 999"):
        snapshot_live_files(meta, files.__getitem__, snapshot_id=999)


def test_unknown_status_quarantines():
    meta, files = _fixture()
    files["m2"] = make_manifest([
        {"status": 7, "file_path": "f0", "record_count": 1,
         "file_size": 1}
    ])
    files["ml2"] = make_manifest_list([
        {"manifest_path": "m2", "manifest_length": len(files["m2"]),
         "added_files_count": 1,
         "existing_files_count": 0, "deleted_files_count": 0}
    ])
    with pytest.raises(ValueError, match="status"):
        snapshot_live_files(meta, files.__getitem__)


# ---------------------------------------------------------------------------
# format-v2 positional deletes (round 9)
# ---------------------------------------------------------------------------

def _pos_delete_fixture():
    from hainan_big_data_recommend_system_spark.operators.iceberg import (
        make_position_delete_parquet,
    )

    m_data = make_manifest([
        {"status": 1, "file_path": "d0", "record_count": 10,
         "file_size": 100},
        {"status": 1, "file_path": "d1", "record_count": 10,
         "file_size": 100},
        {"status": 1, "file_path": "d2", "record_count": 10,
         "file_size": 100},
    ])
    m_data2 = make_manifest([
        {"status": 1, "file_path": "d1", "record_count": 12,
         "file_size": 120},  # rewritten AFTER the delete below
    ])
    dfile = make_position_delete_parquet(
        [("d0", 0), ("d0", 7), ("d1", 3), ("gone", 1)]
    )
    m_del = make_manifest([
        {"status": 1, "file_path": "del-1.parquet", "record_count": 4,
         "file_size": len(dfile), "content": 1},
    ])
    files = {"m_data": m_data, "m_data2": m_data2, "m_del": m_del,
             "del-1.parquet": dfile}
    files["ml"] = make_manifest_list([
        {"manifest_path": "m_data", "manifest_length": len(m_data),
         "sequence_number": 1, "added_files_count": 3,
         "existing_files_count": 0, "deleted_files_count": 0},
        {"manifest_path": "m_del", "manifest_length": len(m_del),
         "content": 1, "sequence_number": 2, "added_files_count": 1,
         "existing_files_count": 0, "deleted_files_count": 0},
        {"manifest_path": "m_data2", "manifest_length": len(m_data2),
         "sequence_number": 3, "added_files_count": 1,
         "existing_files_count": 0, "deleted_files_count": 0},
    ])
    return make_table_metadata({200: "ml"}, current=200), files


def test_position_deletes_apply_with_sequence_rule():
    meta, files = _pos_delete_fixture()
    snap = snapshot_live_files(meta, files.__getitem__)
    # d0's deletes apply; d1 was REWRITTEN at sequence 3 > delete
    # sequence 2, so its stale delete is suppressed; deletes aimed at
    # vanished files are inert
    assert snap["position_deletes"] == {"d0": [0, 7]}
    assert snap["n_position_deletes"] == 2
    assert snap["live_rows"] == 32
    assert snap["live_rows_after_deletes"] == 30


def test_delete_manifest_listing_data_file_rejected():
    meta, files = _pos_delete_fixture()
    bad = make_manifest([
        {"status": 1, "file_path": "d9", "record_count": 1,
         "file_size": 1},  # content 0 inside a content-1 manifest
    ])
    files["m_del"] = bad
    files["ml"] = make_manifest_list([
        {"manifest_path": "m_data",
         "manifest_length": len(files["m_data"]),
         "sequence_number": 1, "added_files_count": 3,
         "existing_files_count": 0, "deleted_files_count": 0},
        {"manifest_path": "m_del", "manifest_length": len(bad),
         "content": 1, "sequence_number": 2, "added_files_count": 1,
         "existing_files_count": 0, "deleted_files_count": 0},
    ])
    with pytest.raises(ValueError, match="non-delete file"):
        snapshot_live_files(meta, files.__getitem__)


def test_position_out_of_range_rejected():
    from hainan_big_data_recommend_system_spark.operators.iceberg import (
        make_position_delete_parquet,
    )

    meta, files = _pos_delete_fixture()
    bad = make_position_delete_parquet([("d2", 10)])  # rows are 0..9
    files["del-1.parquet"] = bad
    files["m_del"] = make_manifest([
        {"status": 1, "file_path": "del-1.parquet", "record_count": 1,
         "file_size": len(bad), "content": 1},
    ])
    files["ml"] = make_manifest_list([
        {"manifest_path": "m_data",
         "manifest_length": len(files["m_data"]),
         "sequence_number": 1, "added_files_count": 3,
         "existing_files_count": 0, "deleted_files_count": 0},
        {"manifest_path": "m_del",
         "manifest_length": len(files["m_del"]),
         "content": 1, "sequence_number": 2, "added_files_count": 1,
         "existing_files_count": 0, "deleted_files_count": 0},
    ])
    with pytest.raises(ValueError, match="out of range"):
        snapshot_live_files(meta, files.__getitem__)


# ---------------------------------------------------------------------------
# format-v2 equality deletes (round 10)
# ---------------------------------------------------------------------------

def _eq_delete_fixture():
    from hainan_big_data_recommend_system_spark.operators.iceberg import (
        make_equality_delete_parquet,
    )

    m_data = make_manifest([
        {"status": 1, "file_path": "d0", "record_count": 10,
         "file_size": 100},
        {"status": 1, "file_path": "d1", "record_count": 10,
         "file_size": 100},
    ])
    # a data file committed WITH the delete (same sequence): untouched
    m_data2 = make_manifest([
        {"status": 1, "file_path": "d2", "record_count": 5,
         "file_size": 50},
    ])
    efile = make_equality_delete_parquet({"name": ["a", "b"]})
    m_del = make_manifest([
        {"status": 1, "file_path": "eq-1.parquet", "record_count": 2,
         "file_size": len(efile), "content": 2, "equality_ids": [2]},
    ])
    files = {"m_data": m_data, "m_data2": m_data2, "m_del": m_del,
             "eq-1.parquet": efile}
    files["ml"] = make_manifest_list([
        {"manifest_path": "m_data", "manifest_length": len(m_data),
         "sequence_number": 1, "added_files_count": 2,
         "existing_files_count": 0, "deleted_files_count": 0},
        {"manifest_path": "m_del", "manifest_length": len(m_del),
         "content": 1, "sequence_number": 2, "added_files_count": 1,
         "existing_files_count": 0, "deleted_files_count": 0},
        {"manifest_path": "m_data2", "manifest_length": len(m_data2),
         "sequence_number": 2, "added_files_count": 1,
         "existing_files_count": 0, "deleted_files_count": 0},
    ])
    return make_table_metadata({300: "ml"}, current=300), files


def test_equality_deletes_resolved():
    meta, files = _eq_delete_fixture()
    snap = snapshot_live_files(meta, files.__getitem__)
    assert snap["n_equality_delete_files"] == 1
    (eq,) = snap["equality_deletes"]
    assert eq["path"] == "eq-1.parquet"
    assert eq["sequence_number"] == 2
    assert eq["equality_ids"] == [2]
    # the scan applies them with the STRICT rule: d0/d1 (seq 1 < 2)
    # affected, d2 (seq 2) not
    seqs = snap["data_sequence_numbers"]
    assert seqs == {"d0": 1, "d1": 1, "d2": 2}
    affected = [p for p, s in seqs.items()
                if s < eq["sequence_number"]]
    assert affected == ["d0", "d1"]


def test_equality_delete_needs_ids():
    meta, files = _eq_delete_fixture()
    bad = make_manifest([
        {"status": 1, "file_path": "eq-1.parquet", "record_count": 2,
         "file_size": 10, "content": 2},  # no equality_ids
    ])
    files["m_del"] = bad
    files["ml"] = make_manifest_list([
        {"manifest_path": "m_data",
         "manifest_length": len(files["m_data"]),
         "sequence_number": 1, "added_files_count": 2,
         "existing_files_count": 0, "deleted_files_count": 0},
        {"manifest_path": "m_del", "manifest_length": len(bad),
         "content": 1, "sequence_number": 2, "added_files_count": 1,
         "existing_files_count": 0, "deleted_files_count": 0},
    ])
    with pytest.raises(ValueError, match="equality_ids"):
        snapshot_live_files(meta, files.__getitem__)


def test_deleted_equality_file_dropped():
    from hainan_big_data_recommend_system_spark.operators.iceberg import (
        make_equality_delete_parquet,
    )

    meta, files = _eq_delete_fixture()
    # a later delete manifest tombstones the equality-delete file
    m_del2 = make_manifest([
        {"status": 2, "file_path": "eq-1.parquet", "record_count": 2,
         "file_size": len(files["eq-1.parquet"]), "content": 2,
         "equality_ids": [2]},
    ])
    files["m_del2"] = m_del2
    files["ml"] = make_manifest_list([
        {"manifest_path": "m_data",
         "manifest_length": len(files["m_data"]),
         "sequence_number": 1, "added_files_count": 2,
         "existing_files_count": 0, "deleted_files_count": 0},
        {"manifest_path": "m_del",
         "manifest_length": len(files["m_del"]),
         "content": 1, "sequence_number": 2, "added_files_count": 1,
         "existing_files_count": 0, "deleted_files_count": 0},
        {"manifest_path": "m_del2", "manifest_length": len(m_del2),
         "content": 1, "sequence_number": 3, "added_files_count": 0,
         "existing_files_count": 0, "deleted_files_count": 1},
    ])
    snap = snapshot_live_files(meta, files.__getitem__)
    assert snap["equality_deletes"] == []
