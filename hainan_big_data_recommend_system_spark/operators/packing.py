"""Sequence packing and distributed prefix sums — the batch-assembly stage
of a training-data pipeline (north-star extension; no reference analogue).

Training consumes documents as fixed-token-budget packs: shuffle the corpus
deterministically, walk it in that order, and start a new pack every
``budget`` tokens.  A document belongs to the pack where it *starts*
(streaming-concat semantics), so pack assignment is a pure function of the
exclusive running token total — a global prefix sum.

The naive Spark spelling — ``sum(tokens) over (order by key)`` — is a
single-partition window: the whole corpus funnels through one task, which
is exactly the plan that dies at 100 TB.  :func:`distributed_prefix_sum`
computes the same numbers with bounded driver state:

1. bucket rows by a *contiguous range* of the order key (the first byte of
   the md5 order key → 256 ordered buckets),
2. aggregate one partial sum per bucket (tiny: ≤256 rows to the driver),
3. turn those into exclusive bucket offsets and broadcast-join them back,
4. run the cumulative window *within* each bucket (partitionBy bucket →
   256-way parallel) and add the offset.

Shuffle cost: one hash partition on the bucket id + one 256-row broadcast
— no global sort, no single-partition stage.  The deterministic shuffle
key is ``md5(id)`` (hex string), bit-identical in Spark and DuckDB, so the
whole pipeline is oracle-checkable even though it embodies a "random"
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from ..session import CHECKPOINT_LEVEL


def distributed_prefix_sum(
    df: DataFrame,
    order_hex_col: str,
    tiebreak_col: str,
    value_col: str,
    out_col: str = "cum_before",
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` over the global order
    ``(order_hex_col, tiebreak_col)`` without a single-partition window.

    ``order_hex_col`` must be a lowercase-hex string (e.g. an md5 digest);
    its first two characters define 256 contiguous range buckets, so
    per-bucket windows plus per-bucket offsets reproduce the global
    running sum exactly.  Driver state is one row per bucket (≤256),
    independent of data size.
    """
    bucket = F.substring(F.col(order_hex_col), 1, 2)
    # materialize once: the bucket totals AND the probe side both consume
    # this relation — lazily the upstream (tokenize/hash projections) would
    # execute twice per pass
    rows = df.withColumn("__bkt", bucket).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)

    # pass 1: one partial sum per bucket; exclusive offsets via a window
    # over ≤256 rows (safely single-partition — it is driver-bounded)
    offsets = (
        rows.groupBy("__bkt")
        .agg(F.sum(F.col(value_col).cast("long")).alias("__bsum"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__bsum").over(
                    Window.orderBy("__bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("long"),
            ),
        )
        .drop("__bsum")
    )

    # pass 2: within-bucket exclusive cumsum (256-way parallel) + offset
    w = (
        Window.partitionBy("__bkt")
        .orderBy(F.col(order_hex_col), F.col(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        rows.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            out_col,
            F.col("__offset")
            + F.coalesce(
                F.sum(F.col(value_col).cast("long")).over(w),
                F.lit(0).cast("long"),
            ),
        )
        .drop("__bkt", "__offset")
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
) -> DataFrame:
    """Assign every document to a training pack of ``budget`` tokens.

    Deterministic shuffle order ``md5(id)``; whitespace token counts; a doc
    belongs to ``pack_id = cum_before div budget`` where ``cum_before`` is
    the token total of all docs ahead of it in shuffle order.  Returns one
    row per doc: (doc_id, shuffle_key, n_tokens, cum_before, pack_id).

    Scale: everything is expression-level except the prefix sum, which is
    the 256-bucket two-pass of :func:`distributed_prefix_sum`.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(id_col).cast("string").cast("binary")).alias("shuffle_key"),
        F.size(F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+"))
        .cast("long")
        .alias("n_tokens"),
    )
    summed = distributed_prefix_sum(
        base, "shuffle_key", "doc_id", "n_tokens", out_col="cum_before"
    )
    return summed.withColumn(
        "pack_id", F.expr(f"cum_before div {int(budget)}")
    )
