"""Sequential-recommendation training examples — the dataset-shaping op
between an event log and a next-item model (GRU4Rec/SASRec-style
training consumes exactly these rows; the reference's recommender
retrains from its click log the same way).

Each qualifying event becomes one supervised example: the user's last
``history_len`` item interactions BEFORE it (most recent last) as the
input sequence, the event's own item as the label.  The construction is
one per-user window pass — ``collect_list`` over a bounded trailing
frame, totally ordered by ``(ts, event_id)`` so ties cannot reorder
between engines — and emits nothing for a user's first interaction
(no history, no example).

100 TB shape: a single hash shuffle on the user id, per-user state
bounded by ``history_len`` (the frame, not the user's full history,
rides the sort), then scan-local label/packing projections.  History is
emitted as a comma-joined string — the artifact a feature store ingests
and a form both engines order identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def next_item_examples(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    item_expr: F.Column | None = None,
    event_id_col: str = "event_id",
    history_len: int = 5,
    event_types: tuple[str, ...] = ("click", "view", "purchase"),
) -> DataFrame:
    """``(user_id, event_id, history, n_history, label)`` — one training
    example per interaction with at least one prior interaction.

    ``item_expr`` defaults to the ``k`` field of the ``props`` JSON (the
    events table's item surrogate); rows whose item is NULL (malformed
    props) are dropped BEFORE the window, so they neither mint examples
    nor pollute histories."""
    if item_expr is None:
        item_expr = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    base = (
        events.filter(F.col("event_type").isin(*event_types))
        .select(
            F.col(user_col).alias("user_id"),
            F.col(event_id_col).alias("event_id"),
            F.col(ts_col).alias("__ts"),
            item_expr.alias("__item"),
        )
        .filter(F.col("__item").isNotNull())
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("__ts", "event_id")
        .rowsBetween(-history_len, -1)
    )
    hist = F.collect_list("__item").over(w)
    return (
        base.select(
            "user_id",
            "event_id",
            F.array_join(hist, ",").alias("history"),
            F.size(hist).cast("long").alias("n_history"),
            F.col("__item").alias("label"),
        )
        .filter(F.col("n_history") >= 1)
    )
