"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (hot-items top-30, SURVEY.md §7.2)
on sf0.001.  ``queries()`` / ``oracle_sql()`` expose the oracle-checked
catalog in :mod:`hainan_big_data_recommend_system_spark.queries` — one entry per
implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hainan_big_data_recommend_system_spark import qcatalog as _catalog
from hainan_big_data_recommend_system_spark.qcatalog.relational import q_hot_items

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_hot_items(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return _catalog.oracle_sql()
