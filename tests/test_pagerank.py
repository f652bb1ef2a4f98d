"""Integer PageRank: closed-form fixed points and orderings on synthetic
graphs (the oracle covers the corpus-scale path)."""

from __future__ import annotations

from hainan_big_data_recommend_system_spark.operators.pagerank import (
    UNIT,
    pagerank_micro,
)


def _ranks(spark, edges, n_iter=5):
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    return {
        r["doc_id"]: r["rank_micros"]
        for r in pagerank_micro(df, n_iter=n_iter).collect()
    }


def test_regular_graph_is_fixed_at_unit(spark):
    """On a k-regular graph every node keeps rank exactly 1.0 (in micros):
    each round Σ contrib = r, so r' = 150000 + 850000·r div 1e6 = r at
    r = 1e6.  A 4-cycle is 2-regular."""
    got = _ranks(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    assert got == {1: UNIT, 2: UNIT, 3: UNIT, 4: UNIT}


def test_star_center_outranks_leaves(spark):
    got = _ranks(spark, [(0, i) for i in range(1, 6)])
    center = got[0]
    leaves = [got[i] for i in range(1, 6)]
    assert all(center > lv for lv in leaves)
    assert len(set(leaves)) == 1  # symmetry: all leaves identical


def test_deterministic_across_runs(spark):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    assert _ranks(spark, edges) == _ranks(spark, edges)


def test_rank_floor_is_teleport(spark):
    got = _ranks(spark, [(1, 2), (2, 3), (3, 4), (1, 3)])
    assert all(v >= 150_000 for v in got.values())
