"""Round-12 regression pins for the round-11 ADVICE findings:

- medium #1: CDF over a DV-reinstating RESTORE — `read_changes`
  synthesizes file-level insert/delete rows for restore commits
  instead of raising (and keeps the v_from ± feed == v_to equation).
- medium #2: `delete_where_iceberg`'s retry loop carries a
  logical-conflict check — a concurrent overwrite between the
  position scan and the claim aborts instead of committing a delete
  file referencing no-longer-live paths.
- low #1: an unsupported bloom probe (int against a DOUBLE column)
  keeps the file ("no proof, must scan") instead of aborting the scan.
- low #2: equality deletes apply null-safely (the spec treats null as
  equal; SQL join semantics never match NULL keys).
- low #3: `write_iceberg` append enforces partition-layout agreement
  like the Delta sink does.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.operators.bloom import (
    prune_files_by_bloom,
)
from hainan_big_data_recommend_system_spark.operators.deltalog import (
    resolve_deletion_vector,
)
from hainan_big_data_recommend_system_spark.sources import delta_sink, iceberg_sink
from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    delete_where_delta,
    read_changes,
    restore_delta,
    snapshot,
    write_delta,
)
from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
    _iceberg_conflicts,
    delete_where_iceberg,
    merge_iceberg,
    read_table,
    write_iceberg,
)


def _alive_ids(spark, tbl, col="id"):
    """The table's live rows with deletion vectors applied."""
    snap = snapshot(tbl)

    def fetch(p):
        return open(os.path.join(tbl, p), "rb").read()

    dead = {
        delta_sink._abs_uri(tbl, p): set(resolve_deletion_vector(d, fetch))
        for p, d in snap.get("deletion_vectors", {}).items()
    }
    df = spark.read.parquet(
        *[os.path.join(tbl, p) for p in sorted(snap["live"])]
    ).select(
        F.col("_metadata.file_path").alias("fp"),
        F.col("_metadata.row_index").alias("ri"),
        col,
    )
    return sorted(
        r[col] for r in df.collect()
        if r["ri"] not in dead.get(r["fp"], ())
    )


# ---------------------------------------------------------------------------
# medium #1: CDF across RESTORE commits
# ---------------------------------------------------------------------------

def _feed_equation(spark, tbl, v_from, v_to):
    """alive(v_from) + inserts − deletes must equal alive(v_to) as
    multisets — the same invariant the driver's delta_cdf_roundtrip
    row pins inside its hash gate."""
    from collections import Counter

    feed = read_changes(spark, tbl, v_from, v_to).select(
        "id", "_change_type"
    ).collect()
    ins = Counter(r["id"] for r in feed if r["_change_type"] == "insert")
    dels = Counter(r["id"] for r in feed if r["_change_type"] == "delete")
    return ins, dels


def test_cdf_over_restore_without_dv(spark, tmp_path):
    """RESTORE that resurrects DV-deleted rows (re-add WITHOUT a DV):
    the synthesized feed must balance the snapshots."""
    from collections import Counter

    tbl = str(tmp_path / "tbl")
    write_delta(spark.range(0, 100).selectExpr("id").coalesce(1), tbl)
    delete_where_delta(spark, tbl, "id % 10 = 3")          # v1: 90 live
    r = restore_delta(tbl, 0)                              # v2: 100 live
    assert r["version"] == 2 and r["n_readds"] == 1
    before = Counter(range(100)) - Counter(
        i for i in range(100) if i % 10 == 3
    )
    ins, dels = _feed_equation(spark, tbl, 1, 2)
    after = before + ins - dels
    assert sorted(after.elements()) == list(range(100))
    assert _alive_ids(spark, tbl) == list(range(100))


def test_cdf_over_restore_with_reinstated_dv(spark, tmp_path):
    """RESTORE whose re-adds CARRY deletion-vector descriptors — the
    exact shape ADVICE r11 reported as always failing."""
    from collections import Counter

    tbl = str(tmp_path / "tbl")
    write_delta(spark.range(0, 100).selectExpr("id").coalesce(1), tbl)
    delete_where_delta(spark, tbl, "id % 10 = 3")          # v1: 90 live
    delete_where_delta(spark, tbl, "id % 2 = 0")           # v2: 45 live
    r = restore_delta(tbl, 1)                              # v3: back to 90
    assert r["version"] == 3
    snap = snapshot(tbl)
    assert snap["deletion_vectors"], "restore must reinstate the v1 DV"
    alive_v2 = Counter(
        i for i in range(100) if i % 10 != 3 and i % 2 != 0
    )
    ins, dels = _feed_equation(spark, tbl, 2, 3)
    after = alive_v2 + ins - dels
    assert sorted(after.elements()) == sorted(
        i for i in range(100) if i % 10 != 3
    )
    # and a range SPANNING the restore still reads end-to-end
    ins2, dels2 = _feed_equation(spark, tbl, 0, 3)
    after2 = Counter(range(100)) + ins2 - dels2
    assert sorted(after2.elements()) == sorted(
        i for i in range(100) if i % 10 != 3
    )


def test_dv_commit_without_cdc_still_fails_loudly(spark, tmp_path):
    """The RESTORE carve-out must not weaken the original guard."""
    tbl = str(tmp_path / "tbl")
    write_delta(spark.range(0, 50).selectExpr("id").coalesce(1), tbl)
    delete_where_delta(spark, tbl, "id < 5", change_data=False)
    with pytest.raises(ValueError, match="deletion vectors"):
        read_changes(spark, tbl, 0, 1).collect()


# ---------------------------------------------------------------------------
# medium #2: Iceberg DML retry-loop conflict checks
# ---------------------------------------------------------------------------

def test_iceberg_conflicts_rule():
    prev = {"live": {"a": (10, 5), "b": (20, 9)},
            "data_sequence_numbers": {"a": 1, "b": 2}}
    same = {"live": {"a": (10, 5), "b": (20, 9)},
            "data_sequence_numbers": {"a": 1, "b": 2}}
    assert _iceberg_conflicts(prev, same, ["a", "b"]) == []
    gone = {"live": {"b": (20, 9)}, "data_sequence_numbers": {"b": 2}}
    assert _iceberg_conflicts(prev, gone, ["a", "b"]) == ["a"]
    resized = {"live": {"a": (11, 5), "b": (20, 9)},
               "data_sequence_numbers": {"a": 1, "b": 2}}
    assert _iceberg_conflicts(prev, resized, ["a", "b"]) == ["a"]
    reseq = {"live": {"a": (10, 5), "b": (20, 9)},
             "data_sequence_numbers": {"a": 3, "b": 2}}
    assert _iceberg_conflicts(prev, reseq, ["a", "b"]) == ["a"]


def test_iceberg_delete_aborts_on_concurrent_overwrite(
    spark, tmp_path, monkeypatch
):
    tbl = str(tmp_path / "tbl")
    write_iceberg(spark.range(0, 100).selectExpr("id"), tbl)

    orig = iceberg_sink._stage_position_delete_files

    def wrapper(*args, **kwargs):
        res = orig(*args, **kwargs)
        monkeypatch.setattr(
            iceberg_sink, "_stage_position_delete_files", orig
        )
        # a concurrent overwrite lands between the position scan and
        # the metadata claim
        write_iceberg(spark.range(100, 200).selectExpr("id"), tbl,
                      mode="overwrite")
        return res

    monkeypatch.setattr(
        iceberg_sink, "_stage_position_delete_files", wrapper
    )
    with pytest.raises(ValueError, match="delete conflict"):
        delete_where_iceberg(spark, tbl, "id < 10")
    # the concurrent overwrite's rows are intact, nothing deleted
    snap = read_table(tbl)
    assert snap["live_rows"] == 100
    assert not snap["position_delete_files"]


# ---------------------------------------------------------------------------
# low #1: unsupported bloom probe keeps the file
# ---------------------------------------------------------------------------

def test_bloom_unsupported_probe_type_keeps_file(spark, tmp_path):
    out = str(tmp_path / "pq")
    (
        spark.range(0, 10)
        .selectExpr("cast(id as double) as x")
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#x", "true")
        .parquet(out)
    )
    part = next(
        f for f in os.listdir(out)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    live = {part: (os.path.getsize(os.path.join(out, part)), 10)}
    # an int probe against a DOUBLE column is no proof either way —
    # the file must be KEPT, not the scan aborted
    res = prune_files_by_bloom(out, live, "x", 3)
    assert res["n_kept"] == 1 and res["n_skipped"] == 0


# ---------------------------------------------------------------------------
# low #2: null-safe equality-delete application
# ---------------------------------------------------------------------------

def test_iceberg_merge_supersedes_null_keyed_row(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (None, "b")], "k int, v string"
    )
    write_iceberg(base, tbl)
    merge_iceberg(
        spark,
        spark.createDataFrame([(None, "c")], "k int, v string"),
        tbl, ["k"],
    )
    # the old null-keyed row is DEAD under the spec's null == null
    # rule: deleting its value must find nothing
    assert delete_where_iceberg(
        spark, tbl, "v = 'b'"
    )["n_rows_deleted"] == 0
    # its replacement (and the untouched row) are alive
    assert delete_where_iceberg(
        spark, tbl, "v = 'c'"
    )["n_rows_deleted"] == 1
    assert delete_where_iceberg(
        spark, tbl, "v = 'a'"
    )["n_rows_deleted"] == 1


# ---------------------------------------------------------------------------
# low #3: Iceberg append partition-layout agreement
# ---------------------------------------------------------------------------

def test_iceberg_append_partition_layout_must_agree(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    df = spark.range(0, 20).selectExpr("id", "id % 2 as p")
    write_iceberg(df, tbl, partition_by=["p"])
    # round 13 (hidden partitioning): an append naming NO layout
    # INHERITS the table's recorded partition spec — it lands IN the
    # partitioned layout, which is a stronger guarantee than the old
    # refusal (the r11 danger was silently writing FLAT files; that
    # can no longer happen)
    res = write_iceberg(df, tbl)
    assert res["n_records"] == 20
    from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
        _prev_state,
    )

    pv = _prev_state(tbl)["partition_values"]
    assert all(set(v) == {"p"} for v in pv.values())
    # a MISMATCHED explicit layout still refuses
    with pytest.raises(ValueError, match="partition"):
        write_iceberg(df, tbl, partition_by=["id"])
    # the agreeing layout still appends
    res = write_iceberg(df, tbl, partition_by=["p"])
    assert res["n_records"] == 20
