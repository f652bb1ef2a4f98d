"""Table catalog: loaders for the canonical parquet tables.

The driver testdata (`TESTDATA.md`) is a TPC-H-ish star schema plus
``events`` / ``documents`` / ``embeddings``.  FIXTURES.md §B maps each table
onto the reference's logical model (`part` ≈ book dim, `orders` ≈ collect
events, `lineitem` ≈ book↔tag fact, …).

Everything is plain ``spark.read.parquet`` — columnar scan with predicate
pushdown / column pruning from Catalyst.  At 100 TB the same call reads a
date/key-partitioned table directory; nothing here assumes single-file
inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize_timestamps(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Cast top-level TIMESTAMP_NTZ columns to TIMESTAMP.

    Fixture parquet has been written both ways across driver rounds
    (``isAdjustedToUTC`` true and false); Spark reads the latter as
    TIMESTAMP_NTZ, which functions like ``unix_micros`` reject.  Under the
    engine's pinned UTC session timezone (session.py) the cast is
    value-identical — it exists so every downstream operator and oracle
    sees one timestamp type regardless of how the fixture was encoded.
    """
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz:
        # the NTZ→TIMESTAMP cast interprets the naive value in the session
        # timezone; pin UTC so it matches the UTC-naive DuckDB oracle even
        # under a caller-provided session
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table as a DataFrame.

    Side effect (deliberate, ADVICE r3): if the fixture encodes timestamps
    as TIMESTAMP_NTZ, this sets ``spark.sql.session.timeZone=UTC`` on the
    caller's session and does NOT restore the prior value.  The NTZ→
    TIMESTAMP cast reads the session timezone lazily at *execution* time,
    so restoring the conf after planning would silently re-interpret the
    returned (lazy) DataFrame in the old timezone at collect time.  The
    engine pins UTC globally anyway (session.py); callers who need a
    different session timezone must materialize this table first.
    ``events`` additionally sets ``spark.sql.legacy.parquet.nanosAsLong``
    for fixtures written with TIMESTAMP(NANOS).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts has been parquet TIMESTAMP(NANOS) in some fixture
        # rounds, which Spark's vectorized reader rejects
        # ([PARQUET_TYPE_ILLEGAL]).  Read nanos as long and truncate to
        # microseconds with INTEGER division — float division would round
        # half the microseconds up, diverging from DuckDB's (and Spark's
        # own) truncating ns→us cast.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _normalize_timestamps(spark, df)
    return _normalize_timestamps(
        spark, spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries mirror the
    DuckDB oracle's pre-registered views one-to-one."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
