"""Transactional Iceberg sink (sources/iceberg_sink.py).

The write half of lake format #2: staged Spark parquet data files,
immutable manifest/manifest-list blobs, put-if-absent metadata-pointer
claims, manifest reuse on append, full-table removes on overwrite —
read back through the SAME tree walk (operators/iceberg.py) the
table-read queries use.
"""

import os

import pytest

from hainan_big_data_recommend_system_spark.operators.avrocf import parse_avro
from hainan_big_data_recommend_system_spark.sources import iceberg_sink
from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
    current_version,
    read_table,
    write_iceberg,
)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    tbl = str(tmp_path_factory.mktemp("icebergsink") / "tbl")
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    r0 = write_iceberg(df.where("id < 40").repartition(2), tbl)
    r1 = write_iceberg(df.where("id >= 40 AND id < 70").repartition(1), tbl)
    r2 = write_iceberg(
        df.where("id >= 70").repartition(2), tbl, mode="overwrite"
    )
    return tbl, (r0, r1, r2)


def test_append_overwrite_memberships(spark, table):
    tbl, (r0, r1, r2) = table
    assert [r["version"] for r in (r0, r1, r2)] == [0, 1, 2]
    assert r2["n_removed"] == 3  # 2 + 1 appended files all removed
    cur = read_table(tbl)
    assert cur["snapshot_id"] == r2["snapshot_id"]
    assert (cur["n_live"], cur["live_rows"]) == (2, 30)
    ids = {
        row.id
        for row in spark.read.parquet(
            *[os.path.join(tbl, p) for p in cur["live"]]
        ).collect()
    }
    assert ids == set(range(70, 100))


def test_time_travel_sees_appends(spark, table):
    tbl, (r0, r1, r2) = table
    v1 = read_table(tbl, snapshot_id=r1["snapshot_id"])
    assert (v1["n_live"], v1["live_rows"]) == (3, 70)
    ids = {
        row.id
        for row in spark.read.parquet(
            *[os.path.join(tbl, p) for p in v1["live"]]
        ).collect()
    }
    assert ids == set(range(70))


def test_manifest_reuse_on_append(table):
    """The second append's manifest list must reference the first
    snapshot's manifest VERBATIM — per-commit metadata is O(files
    added), not O(table)."""
    tbl, (r0, r1, _) = table
    assert r1["n_manifests_reused"] == 1

    def ml_paths(version):
        meta = open(
            os.path.join(tbl, "metadata", f"v{version}.metadata.json")
        ).read()
        import json

        obj = json.loads(meta)
        cur = obj["current-snapshot-id"]
        (ml,) = [
            s["manifest-list"]
            for s in obj["snapshots"]
            if s["snapshot-id"] == cur
        ]
        recs = parse_avro(open(os.path.join(tbl, ml), "rb").read())
        return [e["manifest_path"] for e in recs["records"]]

    v0_manifests = ml_paths(0)
    v1_manifests = ml_paths(1)
    assert len(v0_manifests) == 1 and len(v1_manifests) == 2
    assert v1_manifests[0] == v0_manifests[0]  # reused, untouched


def test_sequence_numbers_monotone(table):
    tbl, (_, _, r2) = table
    meta = open(
        os.path.join(tbl, "metadata", "v2.metadata.json")
    ).read()
    import json

    obj = json.loads(meta)
    (ml,) = [
        s["manifest-list"]
        for s in obj["snapshots"]
        if s["snapshot-id"] == obj["current-snapshot-id"]
    ]
    recs = parse_avro(open(os.path.join(tbl, ml), "rb").read())
    seqs = {e["sequence_number"] for e in recs["records"]}
    assert seqs == {3}  # third commit → sequence number 3


def test_version_hint(table):
    tbl, _ = table
    hint = open(
        os.path.join(tbl, "metadata", "version-hint.text")
    ).read()
    assert hint == "2"
    assert current_version(tbl) == 2


def test_empty_table_shape(tmp_path):
    snap = read_table(str(tmp_path / "nope"))
    assert snap == {"snapshot_id": None, "live": {}, "n_live": 0,
                    "live_rows": 0}


def test_conflict_retries_to_next_version(spark, tmp_path, monkeypatch):
    """A writer holding a STALE view of the tree loses the link(2)
    claim and must retry against the re-read state; its dead blobs
    from the lost attempt are unlinked."""
    tbl = str(tmp_path / "tbl")
    df = spark.range(0, 10).selectExpr("id", "id AS v")
    write_iceberg(df.where("id < 5"), tbl)
    write_iceberg(df.where("id >= 5"), tbl)

    real = iceberg_sink.current_version
    calls = {"n": 0}

    def stale_once(table_dir):
        calls["n"] += 1
        if calls["n"] == 1:
            return 0  # stale: v1 already exists → claim of v1 fails
        return real(table_dir)

    monkeypatch.setattr(iceberg_sink, "current_version", stale_once)
    r = write_iceberg(spark.range(10, 12).selectExpr("id", "id AS v"), tbl)
    assert r["version"] == 2
    # the lost attempt's manifest-list blob (ml-*-1.avro from THIS
    # token) must be gone: only v0's, v1's and v2's survive
    mls = [
        f for f in os.listdir(os.path.join(tbl, "metadata"))
        if f.startswith("ml-")
    ]
    assert len(mls) == 3
    cur = read_table(tbl)
    assert cur["live_rows"] == 12


def test_unsupported_mode(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported write mode"):
        write_iceberg(spark.range(1), str(tmp_path / "t"), mode="merge")
