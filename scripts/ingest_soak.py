"""Long-horizon streaming-ingest soak (VERDICT r5 #5): prove the
OPERATIONAL claim behind compaction + erasure, not just their unit
semantics — a ~100-epoch ingest with periodic ``compact_ingest_state``
and interleaved ``forget_docs`` keeps (a) per-epoch ingest wall flat and
(b) state-directory file counts bounded, instead of degrading linearly
with stream age the way the naive one-dir-per-epoch layout would.

Drives ``dedup_ingest_writer``'s foreachBatch function directly with
synthetic batches (the exact mechanism Structured Streaming invokes; the
streaming harness itself is exercised in tests/test_streaming.py), so a
hundred epochs run in minutes.  Each epoch's batch mixes fresh docs,
exact duplicates of earlier epochs (must be dropped by the fingerprint
probe), and near-duplicates (must be dropped by the LSH probe), so every
epoch exercises the full probe path against ALL accumulated state.

Usage::

    python scripts/ingest_soak.py [n_epochs] [compact_every] [forget_every]

Prints a per-window table (epoch, ingest wall, state files, corpus rows)
and a PASS/FAIL verdict on the two flatness claims.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from hainan_big_data_recommend_system_spark.session import get_spark  # noqa: E402
from hainan_big_data_recommend_system_spark.streaming.ingest import (  # noqa: E402
    compact_ingest_state,
    dedup_ingest_writer,
    forget_docs,
    read_ingested_corpus,
)

DOCS_PER_EPOCH = 120
FRESH = 90  # new content
EXACT_DUP = 20  # re-offers of earlier epochs' text (fingerprint probe)
NEAR_DUP = 10  # near-twins of earlier text (LSH probe)


def _text(i: int) -> str:
    # ~20 distinct tokens per doc, content a pure function of i; the
    # per-(i, k) mix is a Knuth-hash so distinct docs share no token
    # runs (an arithmetic-progression generator made most "fresh" docs
    # accidental near-dups of each other and stalled corpus growth)
    return " ".join(
        f"tok{((i * 1_000_003 + k) * 2_654_435_761) % (1 << 32)}"
        for k in range(20)
    )


def _near_text(i: int) -> str:
    # same as _text(i) with one token swapped -> Jaccard ~ 19/21 > 0.5
    toks = _text(i).split()
    toks[3] = f"alt{i % 97}"
    return " ".join(toks)


def _batch(spark, epoch: int):
    rows = []
    base = epoch * DOCS_PER_EPOCH
    for k in range(FRESH):
        i = base + k
        rows.append((i, _text(i)))
    if epoch > 0:
        prev = (epoch - 1) * DOCS_PER_EPOCH
        for k in range(EXACT_DUP):  # exact re-offer of last epoch's text
            rows.append((base + FRESH + k, _text(prev + k)))
        for k in range(NEAR_DUP):  # near-twin of last epoch's text
            rows.append((base + FRESH + EXACT_DUP + k, _near_text(prev + 40 + k)))
    else:
        for k in range(EXACT_DUP + NEAR_DUP):
            rows.append((base + FRESH + k, _text(base + FRESH + k)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _count_files(path: str) -> int:
    n = 0
    for _, _, files in os.walk(path):
        n += len(files)
    return n


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    compact_every = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    forget_every = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    spark = get_spark(app_name="ingest-soak")
    root = "/tmp/spark_graft_ingest_soak"
    shutil.rmtree(root, ignore_errors=True)
    corpus = f"{root}/corpus"
    index = f"{root}/index"
    buckets = f"{root}/buckets"
    write = dedup_ingest_writer(corpus, index, bucket_dir=buckets)

    windows: list[dict] = []
    n_forgotten = 0
    for ep in range(n_epochs):
        t0 = time.perf_counter()
        write(_batch(spark, ep), ep)
        wall = time.perf_counter() - t0
        if ep > 0 and ep % compact_every == 0:
            for d in (corpus, index, buckets):
                compact_ingest_state(spark, d)
        if ep > compact_every and ep % forget_every == 0:
            # erase docs ingested ~one compaction window ago (never the
            # newest epoch — the stream is 'live')
            victim_base = (ep - compact_every) * DOCS_PER_EPOCH
            n_forgotten += forget_docs(
                spark, corpus, index,
                [victim_base + j for j in range(3)],
                bucket_dir=buckets,
            )
        if (ep + 1) % compact_every == 0 or ep == n_epochs - 1:
            windows.append(
                {
                    "epoch": ep,
                    "wall_s": round(wall, 3),
                    "files": _count_files(root),
                    "rows": read_ingested_corpus(spark, corpus).count(),
                }
            )
            w = windows[-1]
            print(
                f"epoch {w['epoch']:3d}  ingest {w['wall_s']:6.3f}s  "
                f"state files {w['files']:4d}  corpus rows {w['rows']:6d}",
                flush=True,
            )

    first, last = windows[0], windows[-1]
    # per-epoch ingest wall must stay flat: the last window's wall within
    # 2x of the first measured window's (both warm; state is ~n_epochs
    # bigger by then — the probes must not care)
    flat_wall = last["wall_s"] <= 2.0 * max(first["wall_s"], 0.5)
    # file count bounded: compaction folds epochs, so files grow with the
    # COMPACTION WINDOW, not the stream age — allow generations + the
    # window's worth of epoch dirs, not O(n_epochs) parquet dirs
    per_epoch_files = windows[1]["files"] if len(windows) > 1 else 1
    bounded_files = last["files"] <= 2.0 * per_epoch_files
    print(
        f"\nforgotten rows: {n_forgotten}; "
        f"wall {first['wall_s']}s -> {last['wall_s']}s "
        f"({'FLAT' if flat_wall else 'GROWING'}); "
        f"files {per_epoch_files} -> {last['files']} "
        f"({'BOUNDED' if bounded_files else 'GROWING'})"
    )
    print("PASS" if (flat_wall and bounded_files) else "FAIL")


if __name__ == "__main__":
    main()
