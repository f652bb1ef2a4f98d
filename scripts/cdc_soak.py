#!/usr/bin/env python3
"""Long-horizon streaming-CDC soak (round 8 — the r7 verdict's #9):
prove the OPERATIONAL claim behind ``streaming/cdc.py``'s
RocksDB-shaped state story, not just its unit semantics — a ~100-epoch
changelog stream through a REAL Structured Streaming query
(applyInPandasWithState, file source, one micro-batch per epoch) keeps

(a) per-epoch wall flat (state lookups stay O(touched keys), never
    O(stream age)),
(b) the state-store directory bounded (delta/snapshot files plateau at
    the retention horizon instead of growing with stream age), and
(c) the merged result EQUAL to the batch ``cdc_apply`` of the whole
    log at the end — stream-equals-batch after 100 epochs, zombies
    included (every epoch re-offers stale lower-seq events for keys
    deleted long ago; none may resurrect).

Each epoch's micro-batch mixes: fresh inserts (key space grows to a
bounded cardinality then wraps to updates), in-order updates, deletes,
transport duplicates, and LATE lower-seq events targeting keys deleted
in earlier epochs (the zombie probe against ALL accumulated state).

Usage::

    python scripts/cdc_soak.py [n_epochs] [keys_per_epoch]

Prints a per-window table (epoch, wall, state files, live keys) and a
PASS/FAIL verdict on the flatness + boundedness + equality claims.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from hainan_big_data_recommend_system_spark.operators.cdc import cdc_apply  # noqa: E402
from hainan_big_data_recommend_system_spark.session import get_spark  # noqa: E402
from hainan_big_data_recommend_system_spark.streaming.cdc import (  # noqa: E402
    stream_cdc_upsert,
)

KEY_SPACE = 2_000  # live-key cardinality bound — state is O(this)
_SCHEMA = "key long, seq long, op string, val string"


def epoch_rows(epoch: int, keys_per_epoch: int) -> list[tuple]:
    """Deterministic changelog slice for one epoch."""
    rows = []
    base = epoch * keys_per_epoch
    for i in range(keys_per_epoch):
        k = (base + i) % KEY_SPACE
        seq = epoch * 10 + i % 7
        op = "D" if (k % 13 == 0 and epoch % 4 == 3) else (
            "I" if epoch * keys_per_epoch + i < KEY_SPACE else "U"
        )
        rows.append((k, seq, op, f"v{k}-{epoch}"))
        if i % 9 == 0:
            rows.append((k, seq, op, f"v{k}-{epoch}"))  # transport dup
    # zombie probes: stale lower-seq updates for keys deleted earlier
    if epoch >= 8:
        for k in range(0, KEY_SPACE, 13 * 17):
            rows.append((k, 1, "U", f"zombie-{k}"))
    return rows


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    keys_per_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = get_spark(app_name="cdc_soak")
    # retention horizon: old per-batch state deltas are reaped past this
    # many batches — the knob that makes claim (b) a plateau, not a slope
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "5")
    # the state-store maintenance thread (snapshot + old-delta reaping)
    # defaults to 60s — a soak's whole point is seeing it fire
    spark.conf.set(
        "spark.sql.streaming.stateStore.maintenanceInterval", "5s"
    )
    root = tempfile.mkdtemp(prefix="cdc_soak_")
    in_dir = os.path.join(root, "in")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(in_dir)
    all_rows: list[tuple] = []

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = (
        stream_cdc_upsert(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cdc_soak_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    walls: list[float] = []
    file_counts: list[int] = []
    print("epoch  wall_s  state_files  rows_in_epoch")
    for epoch in range(n_epochs):
        rows = epoch_rows(epoch, keys_per_epoch)
        all_rows.extend(rows)
        with open(os.path.join(in_dir, f"e{epoch:05d}.jsonl"), "w") as fh:
            for k, s, o, v in rows:
                fh.write(
                    json.dumps({"key": k, "seq": s, "op": o, "val": v})
                    + "\n"
                )
        t0 = time.perf_counter()
        q.processAllAvailable()
        walls.append(time.perf_counter() - t0)
        nf = sum(
            len(files)
            for _, _, files in os.walk(os.path.join(ckpt, "state"))
        )
        file_counts.append(nf)
        if epoch % 10 == 0 or epoch == n_epochs - 1:
            print(
                f"{epoch:5d}  {walls[-1]:6.2f}  {nf:11d}  {len(rows):13d}"
            )

    # (c) stream equals batch over the WHOLE 100-epoch log
    latest = {}
    for r in spark.sql("SELECT * FROM cdc_soak_out").collect():
        cur = latest.get(r["key"])
        if cur is None or r["seq"] > cur["seq"]:
            latest[r["key"]] = r
    q.stop()
    log = spark.createDataFrame(all_rows, _SCHEMA)
    # cdc_apply DROPS terminally-deleted keys; the stream retains them
    # as deleted=true tombstones — compare live rows, and require every
    # stream tombstone to be absent from the batch result
    batch = {
        r["key"]: (r["seq"], r["val"])
        for r in cdc_apply(log, ["key"], "seq", "op").collect()
    }
    live = {
        k: (r["seq"], r["val"])
        for k, r in latest.items()
        if not r["deleted"]
    }
    dead = {k for k, r in latest.items() if r["deleted"]}
    mismatches = {
        k for k in set(batch) | set(live) if batch.get(k) != live.get(k)
    } | (dead & set(batch))
    eq_ok = not mismatches

    head = statistics.median(walls[2:22])
    tail = statistics.median(walls[-20:])
    flat_ok = tail <= 2.0 * head
    plateau = max(file_counts[-20:]) <= 1.5 * max(file_counts[20:40])
    print(
        f"\nwall: median epochs 2-21 = {head:.2f}s, last 20 = {tail:.2f}s "
        f"({'FLAT' if flat_ok else 'DEGRADING'})"
    )
    print(
        f"state files: max(20..40) = {max(file_counts[20:40])}, "
        f"max(last 20) = {max(file_counts[-20:])} "
        f"({'BOUNDED' if plateau else 'GROWING'})"
    )
    print(
        f"stream-equals-batch over {len(all_rows)} events / "
        f"{len(batch)} keys: {'OK' if eq_ok else f'MISMATCH {sorted(mismatches)[:5]}'}"
    )
    verdict = flat_ok and plateau and eq_ok
    print("VERDICT:", "PASS" if verdict else "FAIL")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    sys.exit(0 if verdict else 1)


if __name__ == "__main__":
    main()
