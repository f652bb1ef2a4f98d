"""JDBC scan/sink wrappers — the reference's MySQL surface (SURVEY.md §2.1
S1–S4, S13) behind the same DataFrame API the parquet tests use.

The reference reads four MySQL tables (`simility_books.py:37,45`,
`guessLike_u_like.py:46,50,58,189`) and appends scraped reviews with
``INSERT IGNORE`` (notebook cell-4).  In Spark:

- scans are ``spark.read.jdbc`` with **predicate/projection pushdown**: pass
  the bare table plus ``.select``/``.filter`` and Catalyst ships the WHERE
  and column list to the server (visible as ``PushedFilters`` in explain) —
  the reference's hand-written SQL pushdown (S2–S4) for free;
- big tables read in parallel via ``partitionColumn/lowerBound/upperBound/
  numPartitions`` — one JDBC cursor per executor slice instead of the
  reference's single-connection serial read;
- the dedup-on-conflict append (S13) is ``dropDuplicates(keys)`` + append
  mode: Spark owns the dedup, the database stays a dumb sink.

Runtime-verified against Apache Derby (the embedded SQL engine Spark
ships for its Hive metastore): tests/test_jdbc.py round-trips the
dedup-append sink, the partitioned parallel scan, and asserts predicate
pushdown reaches the JDBC source.  Production MySQL differs only by URL
and driver class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from ..session import CHECKPOINT_LEVEL


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Projected/parallel JDBC scan (S1/S2).  Follow with ``.select`` /
    ``.filter`` — both push down to the server."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the connector as the literal "None"
            # and die in a NumberFormatException far from the caller
            raise ValueError(
                "partition_column requires both lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_append_dedup(
    df: DataFrame,
    url: str,
    table: str,
    dedup_keys: list[str],
    properties: dict[str, str] | None = None,
) -> None:
    """S13: the notebook's ``INSERT IGNORE`` = dedup-then-append, against
    BOTH the incoming batch and the target table.

    In-batch survivor selection is deterministic (min over the remaining
    columns per key via a window, not ``dropDuplicates``'s partition-order
    pick — a retry must produce the same row); rows whose keys already
    exist in the target are anti-joined away, which is the half of INSERT
    IGNORE a pure batch dedup misses (a re-run would otherwise append
    every overlapping key a second time).  The existing-keys read projects
    only the key columns.

    The key set is MATERIALIZED (eager ``localCheckpoint``) before the
    write starts: left lazy, the JDBC scan of the target is embedded in
    the write plan and re-executed inside every write task — each task
    would open its own cursor against the table it is concurrently
    appending to, and a task retry could see its own partial writes
    (ADVICE r4).  Snapshotting the keys once pins one consistent
    read-before-write.  Cross-JOB atomicity is out of scope: two
    concurrent ``write_jdbc_append_dedup`` jobs can both snapshot before
    either writes and double-append the same key — true INSERT IGNORE
    under concurrency needs a DB-side unique constraint, same as the
    reference's notebook relies on MySQL's.
    """
    from pyspark.sql import Window, functions as F

    value_cols = [c for c in df.columns if c not in dedup_keys]
    order = [F.asc(c) for c in value_cols] or [F.asc(dedup_keys[0])]
    w = Window.partitionBy(*dedup_keys).orderBy(*order)
    batch = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    try:
        existing = (
            read_jdbc_table(batch.sparkSession, url, table, properties=properties)
            .select(*dedup_keys)
            # eager: runs the JDBC key scan NOW, once, and replaces it in
            # the write plan with the snapshot (never a per-task cursor)
            .localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
        )
        batch = batch.join(existing, dedup_keys, "left_anti")
    except Exception as e:
        # first append: the target does not exist yet (Spark creates it on
        # write) — nothing to dedup against.  Anything else is a real error.
        if "does not exist" not in str(e) and "not found" not in str(e).lower():
            raise
    writer = (
        batch
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .mode("append")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
