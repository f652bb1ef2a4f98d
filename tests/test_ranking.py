"""Distributed global rank (operators/ranking.py): equality with the
single-window formulation on tie-heavy data, descending order, and the
bucket formula's exact edges.  The composed customer query is
hash-oracled in tests/test_oracle.py (`rfm_segments`)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from hainan_big_data_recommend_system_spark.operators.ranking import (
    distributed_global_rank,
    quantile_bucket,
)


def _df(spark):
    # heavy ties: values 0..4 cycling over 50 rows, unique id tiebreak
    rows = [(i, i % 5) for i in range(50)]
    return spark.createDataFrame(rows, "id long, v long")


def test_rank_equals_global_window(spark):
    df = _df(spark)
    got = {
        r["id"]: r["rank"]
        for r in distributed_global_rank(df, "v", ["id"]).collect()
    }
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


def test_rank_descending(spark):
    df = _df(spark)
    got = {
        r["id"]: r["rank"]
        for r in distributed_global_rank(
            df, "v", ["id"], descending=True
        ).collect()
    }
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("v").desc(), F.col("id").desc())
            ),
        ).collect()
    }
    assert got == want


def test_quantile_bucket_edges(spark):
    # n=10, q=5: ranks 1-2 -> 1, 3-4 -> 2, ..., 9-10 -> 5
    rows = [(i, 0) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "rank long, z long").withColumn(
        "__n", F.lit(10)
    )
    got = [
        r["b"]
        for r in df.select(
            "rank", quantile_bucket("rank", "__n", 5).alias("b")
        )
        .orderBy("rank")
        .collect()
    ]
    assert got == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]


def test_bounds_fast_path_matches_sampled_path(spark):
    # round 16: precomputed (lo, hi) bounds replace repartitionByRange's
    # sampling pass with arithmetic bucket ids — ranks must be IDENTICAL
    # to the sampled path (and to the single-window formulation), on
    # tie-heavy data, both directions, including bounds wider than the
    # data and a one-value domain
    rows = [(i, (i * 7) % 13) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long")
    for desc in (False, True):
        base = {
            (r["id"], r["rank"]) for r in distributed_global_rank(
                df, "v", ["id"], descending=desc,
                tiebreak_descending=[False],
            ).collect()
        }
        fast = {
            (r["id"], r["rank"]) for r in distributed_global_rank(
                df, "v", ["id"], descending=desc,
                tiebreak_descending=[False], bounds=(0, 12),
            ).collect()
        }
        wide = {
            (r["id"], r["rank"]) for r in distributed_global_rank(
                df, "v", ["id"], descending=desc,
                tiebreak_descending=[False], bounds=(-100, 1000),
            ).collect()
        }
        assert fast == base and wide == base
    one = spark.createDataFrame([(i, 42) for i in range(10)],
                                "id long, v long")
    got = sorted(
        (r["id"], r["rank"]) for r in distributed_global_rank(
            one, "v", ["id"], bounds=(42, 42)
        ).collect()
    )
    assert got == [(i, i + 1) for i in range(10)]
