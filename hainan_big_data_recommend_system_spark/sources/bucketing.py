"""Bucketed tables — co-located joins without a shuffle (SURVEY.md §4).

At 100 TB the nightly profile⋈collection join shuffles both sides on every
run unless the tables are *bucketed* on the join key: ``bucketBy(n, key)``
hash-partitions rows into a fixed number of files per partition at WRITE
time, and Catalyst then plans a sort-merge join over matching buckets with
**no Exchange on either side** — the shuffle is paid once at ingest, not on
every query.

This is Spark's native equivalent of the reference's implicit "join happens
inside MySQL" locality (`simility_books.py:37` pushes the tag join to the
server).  Design rules encoded here:

- both sides bucketed by the SAME key into the SAME bucket count (or an
  integer multiple — Spark 3.1+ coalesces compatible counts);
- ``sortBy`` the join key within buckets so the merge needs no extra sort;
- bucket count chosen so a bucket of the big table fits an executor core's
  working memory at target scale (``n_buckets ≈ table_bytes / 256 MB``).

Bucketed tables require the session catalog (``saveAsTable``); plain
``.parquet(path)`` writes drop bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    num_buckets: int,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet table.

    ``sort_cols`` defaults to ``bucket_cols`` — a merge join on the bucket
    key then needs no per-task sort at read time.
    """
    bcols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    scols = (
        bcols
        if sort_cols is None
        else [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    )
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bcols)
        .sortBy(*scols)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog)."""
    return spark.table(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_on: str,
    right_on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their (same-hash) bucket keys.

    With both sides bucketed on their respective key, the plan is a
    sort-merge join whose children are bare scans — no Exchange, no
    broadcast.  ``tests/test_bucketing.py`` asserts that property on the
    executed plan.
    """
    lt, rt = spark.table(left_table), spark.table(right_table)
    if left_on == right_on:
        # USING-style join: one key column in the output — the expression
        # form would keep both sides' identically-named columns and make
        # every later reference to the key ambiguous
        return lt.join(rt, [left_on], how)
    return lt.join(rt, lt[left_on] == rt[right_on], how)
