"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10 extension row — the reference has no event-time or
stateful semantics at all; this is the north-star surface a training-data
pipeline needs: running per-key state that outlives any window).

Operator: **per-user running profile** — cumulative event count, running
value sum (integerized cents — float accumulation order must never reach
state), distinct-event-type count, and last-seen timestamp, emitted once
per micro-batch per updated user.  State is bounded two ways:

- optional processing-time timeout expires idle users, emitting a final
  tombstone row (``expired=true``).  NOTE: with a processing-time timeout
  Spark schedules continuous state-cleanup micro-batches even with no new
  data — ``processAllAvailable()`` never settles; drive such queries with
  ``trigger(availableNow=True)`` or a real processing-time trigger;
- the state value is O(1) per user (counters, not event buffers).

At 100 TB / 1000 executors the state store shards by ``user_id`` hash —
exactly how this groupBy distributes — and RocksDB-backed state keeps the
working set off-heap; nothing here assumes single-node state.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("n_types", T.LongType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("expired", T.BooleanType()),
    ]
)

# state tuple layout: (n_events, value_cents, types_json, last_ts_epoch_us).
# The type set is JSON-encoded — a delimiter-join would let a type value
# containing the delimiter corrupt the set on reload.
_STATE_SCHEMA = "n BIGINT, cents BIGINT, types STRING, last_us BIGINT"


def _round_half_up_cents(values: pd.Series) -> int:
    """Σ round(value·100) with HALF-UP rounding (away from zero) — the
    convention of Spark's ``F.round`` and the DuckDB oracles; pandas'
    ``Series.round`` is half-to-even and would drift on exact .5 cents.
    NULL values contribute 0, matching ``F.sum``'s null-skipping."""
    v = pd.Series(values).astype("float64").to_numpy() * 100.0
    v = v[np.isfinite(v)]
    return int(np.sum(np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64")) if len(v) else 0


def _make_update_fn(idle_timeout_ms: int | None):
    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, cents, types_json, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "value_cents": [cents],
                    "n_types": [len(json.loads(types_json)) if types_json else 0],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                    "expired": [True],
                }
            )
            return

        n, cents, types_json, last_us = (
            state.get if state.exists else (0, 0, "[]", 0)
        )
        seen = set(json.loads(types_json)) if types_json else set()
        for pdf in pdfs:
            n += len(pdf)
            # per-row integerization BEFORE the sum: the running state must
            # be exact integers, never order-dependent float accumulation.
            # A poison row (NULL value/type/ts) must degrade, not crash —
            # the micro-batch would otherwise replay forever from the
            # checkpoint and the query could never pass it.
            cents += _round_half_up_cents(pdf["value"])
            seen.update(t for t in pdf["event_type"].tolist() if t is not None)
            ts_max = pdf["ts"].max()
            if pd.notna(ts_max):
                last_us = max(last_us, ts_max.value // 1000)
        state.update((n, cents, json.dumps(sorted(seen)), last_us))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "value_cents": [cents],
                "n_types": [len(seen)],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "expired": [False],
            }
        )

    return update


def running_user_profiles(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Stateful per-user running profile over a stream of events
    (``event_id, ts, user_id, event_type, value, ...``).

    Each micro-batch emits one row per user updated in that batch carrying
    the lifetime-to-date aggregates.  With ``idle_timeout_ms`` set, users
    idle that long (processing time) expire with a final ``expired=true``
    row and their state is dropped.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.select("user_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(idle_timeout_ms),
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
