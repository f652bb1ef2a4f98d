"""Real JDBC round-trip contract tests (S1–S4 scan, S13 dedup-append).

Spark ships Apache Derby (for the Hive metastore), which is a complete
embedded SQL engine with a JDBC driver — so the JDBC source/sink path CAN
run for real in this container: write through ``write_jdbc_append_dedup``,
read back through ``read_jdbc_table`` (serial and partitioned), and check
pushdown survives the connector.  MySQL in production differs only by URL
and driver class.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.sources.jdbc import (
    read_jdbc_table,
    write_jdbc_append_dedup,
)

DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_roundtrip_with_dedup(spark, derby_url):
    rows = [(i % 7, f"user_{i % 7}", float(i)) for i in range(21)]
    df = spark.createDataFrame(rows, "uid int, name string, score double")
    # S13: INSERT IGNORE ≈ dedup-on-key then append
    write_jdbc_append_dedup(df, derby_url, "dedup_users", ["uid"], DRIVER)

    back = read_jdbc_table(spark, derby_url, "dedup_users", properties=DRIVER)
    got = {r["uid"]: r["name"] for r in back.collect()}
    assert got == {i: f"user_{i}" for i in range(7)}  # one survivor per key

    # INSERT IGNORE semantics vs the EXISTING table too: a re-run with
    # overlapping keys appends only the new ones (code-review r4 — the
    # pure in-batch dedup re-appended every overlapping key)
    rerun = spark.createDataFrame(
        [(0, "user_0_again", 99.0), (7, "user_7", 7.0)],
        "uid int, name string, score double",
    )
    write_jdbc_append_dedup(rerun, derby_url, "dedup_users", ["uid"], DRIVER)
    back2 = read_jdbc_table(spark, derby_url, "dedup_users", properties=DRIVER)
    got2 = {r["uid"]: r["name"] for r in back2.collect()}
    assert len(back2.collect()) == 8  # no duplicate uid=0 row
    assert got2[0] == "user_0"  # existing row wins, like INSERT IGNORE
    assert got2[7] == "user_7"


def test_jdbc_partitioned_scan_and_pushdown(spark, derby_url):
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "k int, v int"
    )
    df.write.format("jdbc").option("url", derby_url).option(
        "dbtable", "wide_scan"
    ).option("driver", DRIVER["driver"]).mode("overwrite").save()

    # S1/S2: parallel scan — one JDBC slice per partition
    scanned = read_jdbc_table(
        spark, derby_url, "wide_scan",
        partition_column="k", lower_bound=0, upper_bound=100,
        num_partitions=4, properties=DRIVER,
    )
    assert scanned.rdd.getNumPartitions() == 4
    filtered = scanned.filter(F.col("k") >= 90).select("v")
    assert sorted(r["v"] for r in filtered.collect()) == [
        900, 910, 920, 930, 940, 950, 960, 970, 980, 990
    ]
    # predicate pushdown reaches the JDBC source (S2's hand-written WHERE,
    # done by Catalyst): the concrete filter must appear INSIDE the
    # PushedFilters bracket list (an empty list plus 'k' in ReadSchema
    # must not pass)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan, plan
    pushed = plan.split("PushedFilters", 1)[1]
    pushed = pushed[pushed.index("[") : pushed.index("]") + 1]
    assert "GreaterThanOrEqual(k,90)" in pushed.replace(" ", ""), plan
