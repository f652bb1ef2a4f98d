"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its ANSI-SQL oracle on DuckDB over the
same parquet tables, then compares row count, column names, and
order-insensitive values (stricter than a hash: exact cell equality after
canonicalization)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from hainan_big_data_recommend_system_spark.catalog import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[ns]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype(np.float64).map(repr)
        else:
            df[c] = s.map(lambda v: str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    got = spark_df.toPandas()
    want = con.execute(sql).df()
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != oracle {sorted(want.columns)}"
    )
    g, w = _canon(got), _canon(want)
    if not g.equals(w):
        diff_mask = (g != w).any(axis=1)
        sample = pd.concat(
            {"spark": g[diff_mask].head(5), "oracle": w[diff_mask].head(5)}, axis=1
        )
        raise AssertionError(f"{name}: value mismatch\n{sample}")
