"""Streaming CDC upsert — stateful last-writer-wins over a change
stream (the live counterpart of operators/cdc.py's batch compaction).

A CDC feed arrives as micro-batches of ``(key, seq, op, payload)``
events, OUT OF ORDER within the transport's reordering window.  The
correct merge is sequence-number-based, never arrival-based: per key,
keep the highest ``seq`` seen so far (state: one tuple per key, O(1)),
ignore any event older than the state, and honor ``op='D'`` as a
tombstone — which must be REMEMBERED, not just emitted, so a late
pre-delete update cannot resurrect the row (the classic CDC zombie).

State layout per key: ``(seq, op, payload)`` of the newest event —
bounded by key cardinality exactly like a RocksDB-backed streaming
dedup; shards by the groupBy key hash across executors.

Equivalence contract (pinned in tests/test_streaming_cdc.py): feeding
any batch split / arrival order of a changelog through this operator
and taking each key's LAST emitted row yields exactly
``operators.cdc.cdc_apply`` of the whole log — stream equals batch,
the lakehouse MERGE invariant.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CDC_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
    ]
)

_STATE_SCHEMA = "seq BIGINT, op STRING, val STRING"


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (k,) = key
    best = state.get if state.exists else None
    for pdf in pdfs:
        for seq, op, val in zip(pdf["seq"], pdf["op"], pdf["val"]):
            if op not in ("I", "U", "D"):
                raise ValueError(f"cdc stream: unknown op {op!r}")
            seq = int(seq)
            # strictly-newer wins; equal seq keeps the first applied
            # (transport duplicates are idempotent)
            if best is None or seq > int(best[0]):
                best = (seq, str(op), None if op == "D" else str(val))
    if best is not None:
        state.update((int(best[0]), best[1], best[2]))
        yield pd.DataFrame(
            {
                "key": [k],
                "seq": [int(best[0])],
                "val": [best[2]],
                "deleted": [best[1] == "D"],
            }
        )


def stream_cdc_upsert(changes: DataFrame) -> DataFrame:
    """Stateful last-writer-wins over a streaming changelog of
    ``(key, seq, op, val)``.  Emits, per micro-batch, each touched
    key's CURRENT merged row (``deleted=true`` rows are retained
    tombstones — a downstream sink drops them; the state keeps them so
    late lower-seq events cannot resurrect deleted keys)."""
    return (
        changes.select("key", "seq", "op", "val")
        .groupBy("key")
        .applyInPandasWithState(
            _update,
            outputStructType=CDC_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
