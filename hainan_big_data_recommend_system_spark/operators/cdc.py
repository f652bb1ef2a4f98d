"""CDC changelog application — MERGE-style last-writer-wins compaction.

Warehouse ingestion's core primitive: a stream of change events
``(key, seq, op, payload)`` with ``op ∈ {I, U, D}`` compacts to the
table's final state — the newest event per key wins, and a terminal
delete removes the row.  This is what Debezium/binlog consumers, Hudi
copy-on-write compaction, and Delta MERGE all reduce to.

Spark shape: ONE window partitioned by the key ordered by
``(seq desc, tiebreak)`` — keyed partitions, never global; the
``row_number() = 1`` filter is the whole algorithm.  Ties on ``seq``
are resolved by an explicit tiebreak column so the result is
deterministic and oracle-replayable (real changelogs use the log
offset; relying on arrival order is the classic CDC bug).

Versions are counted per key in the same pass (a window count), so the
output doubles as a compaction audit: ``n_versions`` says how much
churn each key saw.

Public knowledge: last-writer-wins upsert semantics as documented by
any open-source CDC/lakehouse stack (Debezium docs, Delta MERGE docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cdc_apply(
    changelog: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Compact a changelog to final state.

    Keeps every non-``D`` newest row per key, appending ``n_versions``
    (total change events seen for the key).  ``op_col`` values are
    ``'I'``/``'U'``/``'D'``; anything else raises at runtime via an
    assertion column to keep bad feeds loud, not silently dropped.
    """
    order = [F.col(seq_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    guarded = changelog.withColumn(
        "__op",
        F.when(
            F.col(op_col).isin("I", "U", "D"), F.col(op_col)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("cdc_apply: unknown op "), F.col(op_col)
                )
            )
        ),
    )
    ranked = guarded.withColumn(
        "__rn", F.row_number().over(w)
    ).withColumn(
        "n_versions",
        F.count(F.lit(1)).over(Window.partitionBy(*key_cols)).cast("long"),
    )
    return (
        ranked.where((F.col("__rn") == 1) & (F.col("__op") != "D"))
        .drop("__rn", "__op")
    )
