"""One-call table readers (round 13): `read_delta_table` /
`read_iceberg_table` return the LIVE rows as a DataFrame — declared
column order, partition columns re-attached (Delta) / hidden fields
kept out (Iceberg), deletion vectors and position+equality deletes
applied, time travel on Delta.  Plus the MERGE USING <lake table>
form of the SQL front door they unlock.
"""

from __future__ import annotations

import datetime

import pytest

from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    delete_where_delta,
    merge_delta,
    read_delta_table,
    write_delta,
)
from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
    delete_where_iceberg,
    merge_iceberg,
    read_iceberg_table,
    write_iceberg,
)
from hainan_big_data_recommend_system_spark.sources.sql_dml import run_dml

ROWS = [(i, f"n{i}", i % 3) for i in range(12)]
SCHEMA = "id long, name string, p long"


class TestReadDeltaTable:
    def test_live_rows_with_dvs_applied(self, spark, tmp_path):
        tbl = str(tmp_path / "d")
        write_delta(spark.createDataFrame(ROWS, SCHEMA), tbl)
        delete_where_delta(spark, tbl, "id IN (2, 5)")
        got = sorted(
            (r["id"], r["name"], r["p"])
            for r in read_delta_table(spark, tbl).collect()
        )
        assert got == sorted(r for r in ROWS if r[0] not in (2, 5))
        assert read_delta_table(spark, tbl).columns == \
            ["id", "name", "p"]

    def test_partitioned_table_attaches_columns(self, spark, tmp_path):
        tbl = str(tmp_path / "dp")
        write_delta(spark.createDataFrame(ROWS, SCHEMA), tbl,
                    partition_by=["p"])
        got = sorted(
            (r["id"], r["p"])
            for r in read_delta_table(spark, tbl).collect()
        )
        assert got == sorted((i, i % 3) for i in range(12))
        # partition column keeps its DECLARED type, not string
        types = dict(read_delta_table(spark, tbl).dtypes)
        assert types["p"] == "bigint"

    def test_time_travel(self, spark, tmp_path):
        tbl = str(tmp_path / "dt")
        write_delta(spark.createDataFrame(ROWS, SCHEMA), tbl)
        delete_where_delta(spark, tbl, "id < 6")
        assert read_delta_table(spark, tbl).count() == 6
        assert read_delta_table(spark, tbl, version=0).count() == 12

    def test_empty_table_keeps_schema(self, spark, tmp_path):
        tbl = str(tmp_path / "de")
        df = spark.createDataFrame(ROWS, SCHEMA)
        write_delta(df, tbl)
        write_delta(df.limit(0), tbl, mode="overwrite")
        got = read_delta_table(spark, tbl)
        assert got.count() == 0
        assert got.columns == ["id", "name", "p"]


class TestReadIcebergTable:
    def test_live_rows_with_deletes_applied(self, spark, tmp_path):
        tbl = str(tmp_path / "i")
        write_iceberg(spark.createDataFrame(ROWS, SCHEMA), tbl)
        delete_where_iceberg(spark, tbl, "id IN (2, 5)")   # position
        src = spark.createDataFrame([(7, "N7", 1)], SCHEMA)
        merge_iceberg(spark, src, tbl, key_cols=["id"])    # equality
        got = sorted(
            (r["id"], r["name"])
            for r in read_iceberg_table(spark, tbl).collect()
        )
        want = sorted(
            (i, "N7" if i == 7 else f"n{i}")
            for i in range(12) if i not in (2, 5)
        )
        assert got == want
        assert read_iceberg_table(spark, tbl).columns == \
            ["id", "name", "p"]

    def test_hidden_partition_fields_stay_metadata(self, spark,
                                                   tmp_path):
        tbl = str(tmp_path / "ih")
        rows = [(i, datetime.datetime(2026, 1, 1 + i % 3, 8, 0, 0))
                for i in range(9)]
        write_iceberg(
            spark.createDataFrame(rows, "id long, ts timestamp"),
            tbl, partition_by=["days(ts)"])
        got = read_iceberg_table(spark, tbl)
        assert got.columns == ["id", "ts"]
        assert got.count() == 9


class TestMergeUsingLakeTable:
    def test_delta_to_delta(self, spark, tmp_path):
        tgt = str(tmp_path / "tgt")
        srctbl = str(tmp_path / "src")
        write_delta(spark.createDataFrame(ROWS, SCHEMA), tgt)
        write_delta(
            spark.createDataFrame([(0, "UP", 9), (77, "new", 9)],
                                  SCHEMA), srctbl)
        run_dml(
            spark,
            "MERGE INTO t USING s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
            {"t": tgt, "s": srctbl},
        )
        got = dict(
            (r["id"], r["name"])
            for r in read_delta_table(spark, tgt).collect()
        )
        assert got[0] == "UP" and got[77] == "new"
        assert len(got) == 13

    def test_iceberg_to_iceberg(self, spark, tmp_path):
        tgt = str(tmp_path / "itgt")
        srctbl = str(tmp_path / "isrc")
        write_iceberg(spark.createDataFrame(ROWS, SCHEMA), tgt)
        write_iceberg(
            spark.createDataFrame([(0, "UP", 9), (77, "new", 9)],
                                  SCHEMA), srctbl)
        run_dml(
            spark,
            "MERGE INTO t USING s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
            {"t": tgt, "s": srctbl},
            fmt="iceberg",
        )
        got = dict(
            (r["id"], r["name"])
            for r in read_iceberg_table(spark, tgt).collect()
        )
        assert got[0] == "UP" and got[77] == "new"
        assert len(got) == 13

    def test_unknown_source_message(self, spark, tmp_path):
        with pytest.raises(ValueError, match="not found in sources"):
            run_dml(spark,
                    "MERGE INTO t USING ghost ON t.id = ghost.id "
                    "WHEN MATCHED THEN DELETE",
                    {"t": str(tmp_path / "x")})
