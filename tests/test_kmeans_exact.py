"""Exact integer Lloyd (operators/kmeans_exact.py) — the hash-checked
KMeans twin.  The full cross-engine gate lives in test_oracle.py
(driver row `doc_clusters_exact`); these pin the operator contract."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.kmeans_exact import (
    _floor_safe_div,
    lloyd_exact,
)

SF = "/root/testdata/sf0.01"


def test_floor_safe_div_truncates_toward_zero():
    assert _floor_safe_div(7, 2) == 3
    assert _floor_safe_div(-7, 2) == -3   # python // alone would give -4
    assert _floor_safe_div(0, 5) == 0
    assert _floor_safe_div(-1, 3) == 0


def test_deterministic_across_runs_and_partitionings(spark):
    from hainan_big_data_recommend_system_spark.catalog import load_table

    emb = load_table(spark, SF, "embeddings")
    a = sorted(
        tuple(r) for r in lloyd_exact(emb, "vec_id", "embedding").collect()
    )
    b = sorted(
        tuple(r)
        for r in lloyd_exact(
            emb.repartition(7), "vec_id", "embedding"
        ).collect()
    )
    assert a == b
    assert sum(r[1] for r in a) == emb.count()  # every vector assigned


def test_too_few_vectors_raises(spark):
    df = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="seed"):
        lloyd_exact(df, "vec_id", "embedding", k=8, dim=4)
