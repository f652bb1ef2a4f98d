"""Seeded negative sampling (operators/negatives.py, round 7).
negative_samples is oracle-gated in test_oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.operators.negatives import (
    sample_negatives,
)


def _inter(spark):
    # user 1 saw items 1-3, user 2 saw item 10 twice (dup interaction)
    return spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (2, 10), (2, 10)],
        "user_id long, item_id long",
    )


def test_negatives_never_positive_and_deterministic(spark):
    out = sample_negatives(_inter(spark), k=5, n_items=50).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    pos = {1: {1, 2, 3}, 2: {10}}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r["neg_rank"])
        items = [r["neg_item"] for r in rows]
        assert len(items) == 5
        assert len(set(items)) == 5  # distinct negatives
        assert not (set(items) & pos[uid])  # never a positive
        assert [r["neg_rank"] for r in rows] == [1, 2, 3, 4, 5]
        assert all(1 <= i <= 50 for i in items)
    # bit-identical on rerun (seeded)
    again = sample_negatives(_inter(spark), k=5, n_items=50).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # a different seed draws a different set
    other = sample_negatives(
        _inter(spark), k=5, n_items=50, seed="neg-v2"
    ).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_negatives_exhausted_catalog_shrinks_honestly(spark):
    # user saw 7 of 8 items: at most 1 distinct negative can exist
    inter = spark.createDataFrame(
        [(1, i) for i in range(1, 8)], "user_id long, item_id long"
    )
    out = sample_negatives(inter, k=4, n_items=8, oversample=8).collect()
    items = {r["neg_item"] for r in out}
    assert items <= {8} and len(out) <= 1


def test_negatives_validation(spark):
    with pytest.raises(ValueError, match="must exceed"):
        sample_negatives(_inter(spark), k=5, n_items=5)
    with pytest.raises(ValueError, match="must be >= 1"):
        sample_negatives(_inter(spark), k=0, n_items=50)


def test_negatives_plan_single_antijoin_no_blowup(spark):
    df = sample_negatives(_inter(spark), k=5, n_items=50)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
