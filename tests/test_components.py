"""Connected components (operators/components.py) — convergence and
correctness on shapes the LSH pair lists don't exercise (long chains force
multiple propagation rounds; the catalog query's clusters are near-cliques
that converge in ~2)."""

from __future__ import annotations

from hainan_big_data_recommend_system_spark.operators.components import (
    connected_components,
)


def _cc_dict(edges_df):
    return {
        r["node"]: r["component"]
        for r in connected_components(edges_df).collect()
    }


def test_two_components_and_min_label(spark):
    edges = spark.createDataFrame(
        [(5, 9), (9, 7), (20, 30)], ["a_id", "b_id"]
    )
    got = _cc_dict(edges)
    assert got == {5: 5, 9: 5, 7: 5, 20: 20, 30: 20}


def test_long_chain_converges_to_global_min(spark):
    # 0-1-2-...-19: diameter 19, min label must traverse the whole chain
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], ["a_id", "b_id"]
    )
    got = _cc_dict(edges)
    assert set(got.values()) == {0}
    assert len(got) == 20


def test_direction_and_duplicate_edges_irrelevant(spark):
    e1 = spark.createDataFrame([(3, 1), (1, 3), (3, 1), (2, 3)], ["a_id", "b_id"])
    assert _cc_dict(e1) == {1: 1, 2: 1, 3: 1}
