"""Parquet split-block Bloom filters (round 11): xxHash64 from the
public spec, the SBBF probe, header decode — all validated against
SPARK-WRITTEN filters (the interop direction that matters), then the
file-level point-lookup pruner composed with the Delta sink.
"""

from __future__ import annotations

import glob
import os

import pytest

from hainan_big_data_recommend_system_spark.operators.bloom import (
    bloom_might_contain_file,
    plain_encode,
    prune_files_by_bloom,
    sbbf_might_contain,
    xxhash64,
)


def test_xxhash64_public_vectors():
    # canonical XXH64 vectors, seed 0 (xxhash_spec.md / xxhsum)
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert xxhash64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxhash64(b"abc") == 0x44BC2CF5AD770999
    assert (
        xxhash64(b"Nobody inspects the spammish repetition")
        == 0xFBCEA83C8A378BF1
    )
    # >32-byte input exercises the 4-lane stripe loop
    assert xxhash64(bytes(range(64))) != xxhash64(bytes(range(63)) + b"x")


def test_plain_encode_forms():
    assert plain_encode(5) == (5).to_bytes(8, "little")
    assert plain_encode(-1) == b"\xff" * 8
    assert plain_encode("ab") == b"ab"  # NO length prefix
    assert plain_encode(b"\x00\x01") == b"\x00\x01"
    with pytest.raises(ValueError):
        plain_encode(1.5)
    with pytest.raises(ValueError):
        plain_encode(True)


def test_sbbf_rejects_bad_bitsets():
    with pytest.raises(ValueError, match="32 bytes"):
        sbbf_might_contain(b"\x00" * 31, 1)
    # an all-zero bitset contains nothing
    assert not sbbf_might_contain(b"\x00" * 64, 12345)
    # an all-ones bitset "contains" everything (no proof of absence)
    assert sbbf_might_contain(b"\xff" * 64, 12345)


@pytest.fixture(scope="module")
def bloom_file(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bloom"))
    (
        spark.range(0, 2000)
        .selectExpr("id", "concat('user-', id) AS name")
        .coalesce(1)
        .write.option("parquet.bloom.filter.enabled#name", "true")
        .option("parquet.bloom.filter.expected.ndv#name", "2000")
        .option("parquet.bloom.filter.enabled#id", "true")
        .option("parquet.bloom.filter.expected.ndv#id", "2000")
        .mode("overwrite")
        .parquet(d)
    )
    (pf,) = glob.glob(os.path.join(d, "part-*.parquet"))
    return pf


def test_spark_written_filters_roundtrip(bloom_file):
    # NO false negative, ever — the defining bloom property
    for i in range(0, 2000, 131):
        assert bloom_might_contain_file(bloom_file, "name", f"user-{i}")
        assert bloom_might_contain_file(bloom_file, "id", i)
    # absent probes: overwhelmingly proven absent (fpp ~1%)
    absent = sum(
        1 for i in range(400)
        if bloom_might_contain_file(bloom_file, "name", f"ghost-{i}")
        is False
    )
    assert absent >= 380
    # a column with no filter reports None (no proof either way)
    assert bloom_might_contain_file(bloom_file, "nosuch", 1) is None


def test_delta_sink_bloom_point_lookup_prunes_files(spark, tmp_path):
    from hainan_big_data_recommend_system_spark.sources.delta_sink import (
        snapshot,
        write_delta,
    )

    tbl = str(tmp_path / "tbl")
    # 4 files of distinct high-cardinality keys, UNSORTED in the
    # lookup column — min/max stats cannot prune these
    for k in range(4):
        write_delta(
            spark.range(k * 500, (k + 1) * 500).selectExpr(
                "concat('u', pmod(id * 2654435761, 1000000)) AS user_id",
                "id AS v",
            ).coalesce(1),
            tbl,
            bloom_filter_cols=["user_id"],
        )
    snap = snapshot(tbl)
    # pick a key that lives in file #2
    probe_file = sorted(snap["live"])[2]
    probe = spark.read.parquet(os.path.join(tbl, probe_file)) \
        .select("user_id").first()[0]
    pr = prune_files_by_bloom(tbl, snap["live"], "user_id", probe)
    assert probe_file in pr["kept"]
    assert pr["n_skipped"] >= 2  # bloom proved most files clean
    assert pr["n_no_stats"] == 0
    # never-changes-results: the kept files hold every matching row
    rows = spark.read.parquet(
        *[os.path.join(tbl, p) for p in sorted(pr["kept"])]
    ).filter(f"user_id = '{probe}'").count()
    assert rows >= 1
    # a table written WITHOUT filters keeps everything (no proof)
    tbl2 = str(tmp_path / "tbl2")
    write_delta(
        spark.range(5).selectExpr("concat('u', id) AS user_id")
        .coalesce(1), tbl2,
    )
    snap2 = snapshot(tbl2)
    pr2 = prune_files_by_bloom(tbl2, snap2["live"], "user_id", "u0")
    assert pr2["n_skipped"] == 0 and pr2["n_no_stats"] == 1


def test_iceberg_sink_bloom_point_lookup(spark, tmp_path):
    from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
        read_table,
        write_iceberg,
    )

    tbl = str(tmp_path / "tbl")
    for k in range(3):
        write_iceberg(
            spark.range(k * 300, (k + 1) * 300).selectExpr(
                "concat('u', pmod(id * 2654435761, 1000000)) AS user_id"
            ).coalesce(1),
            tbl, bloom_filter_cols=["user_id"],
        )
    snap = read_table(tbl)
    probe_file = sorted(snap["live"])[1]
    probe = spark.read.parquet(os.path.join(tbl, probe_file)) \
        .select("user_id").first()[0]
    pr = prune_files_by_bloom(tbl, snap["live"], "user_id", probe)
    assert probe_file in pr["kept"]
    assert pr["n_skipped"] >= 1
