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
    """S13: the notebook's ``INSERT IGNORE`` ≈ dedup-then-append — survivor
    selection happens in Spark (deterministic: ``dropDuplicates`` keeps the
    first row per key within each partition; pre-sort if a specific survivor
    is required)."""
    writer = (
        df.dropDuplicates(dedup_keys)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .mode("append")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
