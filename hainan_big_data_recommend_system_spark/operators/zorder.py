"""Z-order (Morton) layout — multi-dimensional data-skipping for writes.

A 100 TB table is pruned at read time by parquet row-group / file min-max
stats, but those only help along the sort key: sorting by ``custkey``
destroys locality in ``price`` and vice versa.  Interleaving the bits of
both dimensions into one Morton code and range-partitioning + sorting by
it gives every output file a small bounding BOX in (dim_a, dim_b) space,
so selective predicates on EITHER dimension skip most files — the
technique behind ``OPTIMIZE ZORDER BY`` in public lakehouse engines
(z-ordering traces to Morton 1966; Orenstein & Merrett 1984 for range
queries over z-curves).

Everything is integer expressions (quantize → interleave → bucket) with
``div`` integer division throughout — ordinary ``/`` goes through DOUBLE
and loses exactness past 2^53, which both breaks the cross-engine oracle
and mis-buckets rows at real key ranges.  JVM codegen end-to-end,
deterministic, fully DuckDB-oracle-able — including the file assignment.

Scale shape: one cheap min/max aggregate (a 1-row broadcast), then a
scan-local projection; the physical write is ``repartitionByRange(zval)``
+ ``sortWithinPartitions(zval)`` — a single range shuffle, the same cost
as any global-sort layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Grid resolution per dimension.  16 bits ⇒ 32-bit z-values; spans of
#: (value - min) * 65535 stay far inside int64 for any realistic key range.
GRID_BITS = 16


def _interleave(qa: Column, qb: Column, bits: int) -> Column:
    """Morton code: bit i of ``qa`` → bit 2i+1, bit i of ``qb`` → bit 2i."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(qa, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(qb, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def zorder_sql_expr(qa: str, qb: str, bits: int = GRID_BITS) -> str:
    """The identical interleave as ANSI SQL text (for oracles), generated
    from the same loop so the two spellings cannot drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({qa} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({qb} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def zorder_layout(
    df: DataFrame,
    key_col: str,
    dim_a: str,
    dim_b: str,
    n_files: int = 16,
    bits: int = GRID_BITS,
) -> DataFrame:
    """Assign every row its Morton code and target file.

    Returns ``(key, zval, file_id)`` where ``file_id`` partitions the
    z-value RANGE evenly (``zval * n_files div 2^(2*bits)``) — a
    deterministic stand-in for ``repartitionByRange``'s sampled splits,
    so the assignment itself is oracle-checkable.  The physical write is
    then ``partitionBy(file_id)`` with ``sortWithinPartitions("zval")``.

    The min/max aggregate is a single-row side, broadcast into every
    task; quantization is ``(v - lo) * (2^bits - 1) div max(hi - lo, 1)``
    — degenerate ranges land every row on cell 0.
    """
    grid_max = (1 << bits) - 1
    stats = df.agg(
        F.min(F.col(dim_a).cast("long")).alias("__alo"),
        F.max(F.col(dim_a).cast("long")).alias("__ahi"),
        F.min(F.col(dim_b).cast("long")).alias("__blo"),
        F.max(F.col(dim_b).cast("long")).alias("__bhi"),
    )
    t = (
        df.select(
            F.col(key_col),
            F.col(dim_a).cast("long").alias("__a"),
            F.col(dim_b).cast("long").alias("__b"),
        )
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__qa",
            F.expr(
                f"((__a - __alo) * {grid_max}L)"
                f" div greatest(__ahi - __alo, 1L)"
            ),
        )
        .withColumn(
            "__qb",
            F.expr(
                f"((__b - __blo) * {grid_max}L)"
                f" div greatest(__bhi - __blo, 1L)"
            ),
        )
        .withColumn(
            "zval", _interleave(F.col("__qa"), F.col("__qb"), bits)
        )
    )
    return t.select(
        key_col,
        "zval",
        F.expr(f"zval * {n_files}L div {1 << (2 * bits)}L")
        .cast("long")
        .alias("file_id"),
    )
