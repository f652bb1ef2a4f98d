"""Streaming CDC upsert (streaming/cdc.py): stream-equals-batch for
arbitrary arrival order and batch splits, and the tombstone-zombie
case (a late pre-delete update must not resurrect a deleted key)."""

from __future__ import annotations

import json
import random

from hainan_big_data_recommend_system_spark.operators.cdc import cdc_apply
from hainan_big_data_recommend_system_spark.streaming.cdc import (
    stream_cdc_upsert,
)

_SCHEMA = "key long, seq long, op string, val string"


def _changelog():
    rng = random.Random(42)
    rows = []
    for k in range(1, 21):
        n = 1 + k % 4
        for j in range(n):
            op = "I" if j == 0 else "U"
            if j == n - 1 and k % 5 == 0:
                op = "D"
            rows.append((k, j, op, f"v{k}-{j}"))
    rng.shuffle(rows)  # transport reordering
    return rows


def _run_stream(spark, tmp_path, rows, n_files):
    d = tmp_path / "cdc_in"
    d.mkdir()
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        with open(d / f"part-{i:03d}.jsonl", "w") as fh:
            for k, s, o, v in chunk:
                fh.write(
                    json.dumps({"key": k, "seq": s, "op": o, "val": v})
                    + "\n"
                )
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = (
        stream_cdc_upsert(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cdc_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    rows_out = spark.sql("SELECT * FROM cdc_out").collect()
    q.stop()
    spark.catalog.dropTempView("cdc_out")
    # latest emission per key = the one carrying the highest seq
    latest = {}
    for r in rows_out:
        cur = latest.get(r["key"])
        if cur is None or r["seq"] > cur["seq"]:
            latest[r["key"]] = r
    return latest


def test_stream_equals_batch_under_reordering(spark, tmp_path):
    rows = _changelog()
    latest = _run_stream(spark, tmp_path, rows, n_files=5)

    log = spark.createDataFrame(rows, _SCHEMA)
    batch = {
        r["key"]: (r["seq"], r["val"])
        for r in cdc_apply(log, ["key"], "seq", "op").collect()
    }
    live = {
        k: (r["seq"], r["val"])
        for k, r in latest.items()
        if not r["deleted"]
    }
    assert live == batch
    # deleted keys surfaced as tombstones, exactly the batch-dropped set
    deleted = {k for k, r in latest.items() if r["deleted"]}
    assert deleted == {k for k in range(1, 21) if k % 5 == 0}


def test_late_update_cannot_resurrect_deleted_key(spark, tmp_path):
    # batch 1: insert + DELETE at seq 5; batch 2: a LATE update at seq 3
    rows = [(1, 0, "I", "born"), (1, 5, "D", "-"), (1, 3, "U", "zombie")]
    d = tmp_path / "zombie"
    d.mkdir()
    with open(d / "b0.jsonl", "w") as fh:
        for r in rows[:2]:
            fh.write(json.dumps(dict(zip("key seq op val".split(), r))) + "\n")
    with open(d / "b1.jsonl", "w") as fh:
        fh.write(json.dumps(dict(zip("key seq op val".split(), rows[2]))) + "\n")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = (
        stream_cdc_upsert(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cdc_zombie")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    out = spark.sql("SELECT * FROM cdc_zombie ORDER BY seq").collect()
    q.stop()
    # the newest state is the delete at seq 5 in every emission after it
    assert out[-1]["seq"] == 5 and out[-1]["deleted"]
    assert all(not (r["seq"] == 3) for r in out)  # zombie never emitted
