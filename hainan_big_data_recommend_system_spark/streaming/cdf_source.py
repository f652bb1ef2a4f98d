"""Lake change feeds as a STREAMING SOURCE (VERDICT r12 What's
missing #1): tail a Delta table's change data feed (`read_changes`)
or an Iceberg table's changelog (`read_changes_iceberg`) in
micro-batches, with the last-consumed version held in an on-disk
checkpoint — the piece that turns the batch change-read verbs into
the "recompute on each change event" loop the reference runs online
(recommender-online/u_like/guessLike_u_like.py:179-187: every
incoming event re-derives that user's recommendations; at lake scale
the event source IS the table's change feed).

Execution model — the same write-ahead discipline Spark's own
MicroBatchExecution keeps in its ``offsets``/``commits`` logs:

1. an intent file ``offsets/<batch_id>.json`` naming the version
   range ``(v_from, v_to]`` is written BEFORE the batch runs;
2. the batch function receives the range's change rows and the
   ``batch_id``;
3. a marker ``commits/<batch_id>`` is written AFTER it returns.

A crash between (1) and (3) leaves a dangling intent: the next run
REDELIVERS exactly that range under the SAME batch_id — at-least-once
delivery that the txn-watermark table writers
(`streaming.sinks.delta_table_writer` / `iceberg_table_writer`)
upgrade to exactly-once, because the redelivered epoch finds its
``(appId, version)`` watermark already recorded and skips.  This is
the composition the sinks were built for; the source side completes
it.

Each call drains everything available and stops (``availableNow``
semantics — the reference's daily-batch lifecycle, `log_analyze.py`);
repeated calls continue from the checkpoint, so a scheduler loop IS
the continuous mode.  At 100 TB nothing here scales with table size:
the driver reads O(new commits) of metadata per drain and each
micro-batch is one incremental change-read (O(seed + range)), never a
snapshot diff.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame

BatchFn = Callable[[DataFrame, int], None]


def _ckpt_dirs(checkpoint_dir: str) -> tuple[str, str]:
    off = os.path.join(checkpoint_dir, "offsets")
    com = os.path.join(checkpoint_dir, "commits")
    os.makedirs(off, exist_ok=True)
    os.makedirs(com, exist_ok=True)
    return off, com


def _last_state(checkpoint_dir: str) -> tuple[int, dict | None]:
    """``(next_batch_id, dangling_offset)`` from the checkpoint WAL —
    ``dangling_offset`` is the intent of an uncommitted batch that
    must be redelivered verbatim."""
    off, com = _ckpt_dirs(checkpoint_dir)
    batches = sorted(
        int(f[:-5]) for f in os.listdir(off)
        if f.endswith(".json") and f[:-5].isdigit()
    )
    if not batches:
        return 0, None
    last = batches[-1]
    intent = json.loads(
        open(os.path.join(off, f"{last}.json"), encoding="utf-8").read()
    )
    if os.path.exists(os.path.join(com, str(last))):
        return last + 1, None
    return last, intent


def _write_offset(checkpoint_dir: str, batch_id: int, intent: dict) -> None:
    off, _ = _ckpt_dirs(checkpoint_dir)
    tmp = os.path.join(off, f"{batch_id}.json.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(json.dumps(intent, sort_keys=True))
    os.replace(tmp, os.path.join(off, f"{batch_id}.json"))


def _write_commit(checkpoint_dir: str, batch_id: int) -> None:
    _, com = _ckpt_dirs(checkpoint_dir)
    with open(os.path.join(com, str(batch_id)), "w") as fh:
        fh.write("")


def _committed_floor(checkpoint_dir: str) -> int | None:
    """The newest committed batch's ``v_to`` (the resume point), or
    None when nothing has committed yet."""
    off, com = _ckpt_dirs(checkpoint_dir)
    done = sorted(
        int(f) for f in os.listdir(com) if f.isdigit()
    )
    if not done:
        return None
    intent = json.loads(
        open(os.path.join(off, f"{done[-1]}.json"),
             encoding="utf-8").read()
    )
    return intent["v_to"]


class _DeltaFeed:
    """Delta CDF adapter: offsets are commit VERSIONS; the pre-table
    origin is version -1 (``read_changes`` ranges are ``(from, to]``)."""

    origin = -1

    def __init__(self, spark, table_dir: str):
        self.spark = spark
        self.table_dir = table_dir

    def available(self, after: int) -> list[int]:
        from ..sources.delta_sink import snapshot

        last = snapshot(self.table_dir)["version"]
        return list(range(after + 1, last + 1))

    def read(self, v_from: int, v_to: int) -> DataFrame:
        from ..sources.delta_sink import read_changes

        return read_changes(self.spark, self.table_dir, v_from, v_to)


class _IcebergFeed:
    """Iceberg changelog adapter: offsets are SNAPSHOT IDS; the
    pre-table origin is 0 (``read_changes_iceberg`` takes None for
    "since the beginning"; snapshot ids start at 1)."""

    origin = 0

    def __init__(self, spark, table_dir: str):
        self.spark = spark
        self.table_dir = table_dir

    def available(self, after: int) -> list[int]:
        from ..sources.iceberg_sink import _prev_state

        prev = _prev_state(self.table_dir)
        self._ops = prev.get("snapshot_ops", {})
        return sorted(s for s in prev["snapshots"] if s > after)

    def skip(self, sid: int) -> bool:
        """'replace' snapshots (compaction / manifest rewrites) change
        no logical rows — reading one through the file-level diff
        would push the WHOLE rewritten file set through the feed as
        delete+insert noise (a 100 TB compaction must not replay the
        table).  The spec's changelog skips them the same way; the
        checkpoint still advances PAST them so ranges never straddle
        the rewrite."""
        return getattr(self, "_ops", {}).get(sid) == "replace"

    def read(self, v_from: int, v_to: int) -> DataFrame:
        from ..sources.iceberg_sink import read_changes_iceberg

        return read_changes_iceberg(
            self.spark, self.table_dir,
            v_from if v_from > 0 else None, v_to,
        )


def stream_changes(
    spark,
    table_dir: str,
    checkpoint_dir: str,
    batch_fn: BatchFn,
    fmt: str = "delta",
    max_versions_per_batch: int = 1,
) -> dict:
    """Drain the table's change feed through ``batch_fn`` in
    micro-batches of at most ``max_versions_per_batch`` commits
    (default one micro-batch PER COMMIT — each commit's changes arrive
    as their own epoch), resuming from ``checkpoint_dir`` and
    redelivering a crash-dangling batch under its original batch_id
    first.  ``batch_fn(df, batch_id)`` is ``foreachBatch``-shaped: the
    df carries the table columns + ``_change_type`` (+
    ``_commit_version`` on Delta), and composing with the txn-watermark
    table writers gives exactly-once end to end.

    Returns ``{n_batches, n_redelivered, n_skipped, last_version}``
    (``n_skipped``: no-logical-change versions — Iceberg 'replace'
    compaction snapshots — the checkpoint advanced past without
    reading)."""
    if fmt == "delta":
        feed = _DeltaFeed(spark, table_dir)
    elif fmt == "iceberg":
        feed = _IcebergFeed(spark, table_dir)
    else:
        raise ValueError(f"unknown change-feed format {fmt!r}")
    if max_versions_per_batch < 1:
        raise ValueError("max_versions_per_batch must be >= 1")

    batch_id, dangling = _last_state(checkpoint_dir)
    n_batches = 0
    n_redelivered = 0
    n_skipped = 0
    last_consumed = None
    if dangling is not None:
        # crash window: the intent was logged but never committed —
        # rerun the SAME range under the SAME batch_id (downstream
        # watermarks dedup the at-least-once replay); a skipped
        # intent just re-commits its marker
        if not dangling.get("skipped"):
            batch_fn(feed.read(dangling["v_from"], dangling["v_to"]),
                     batch_id)
            n_batches += 1
            n_redelivered += 1
        _write_commit(checkpoint_dir, batch_id)
        last_consumed = dangling["v_to"]
        batch_id += 1
    if last_consumed is None:
        floor = _committed_floor(checkpoint_dir)
        last_consumed = floor if floor is not None else feed.origin
    skip_fn = getattr(feed, "skip", lambda v: False)
    pending = feed.available(last_consumed)
    while pending:
        if skip_fn(pending[0]):
            # advance the checkpoint PAST a no-logical-change version
            # without reading it (compaction snapshots)
            v = pending.pop(0)
            _write_offset(checkpoint_dir, batch_id,
                          {"v_from": last_consumed, "v_to": v,
                           "skipped": True})
            _write_commit(checkpoint_dir, batch_id)
            last_consumed = v
            batch_id += 1
            n_skipped += 1
            continue
        chunk = []
        while (pending and len(chunk) < max_versions_per_batch
               and not skip_fn(pending[0])):
            chunk.append(pending.pop(0))
        intent = {"v_from": last_consumed, "v_to": chunk[-1]}
        _write_offset(checkpoint_dir, batch_id, intent)
        batch_fn(feed.read(intent["v_from"], intent["v_to"]), batch_id)
        _write_commit(checkpoint_dir, batch_id)
        last_consumed = chunk[-1]
        batch_id += 1
        n_batches += 1
    return {"n_batches": n_batches, "n_redelivered": n_redelivered,
            "n_skipped": n_skipped, "last_version": last_consumed}
