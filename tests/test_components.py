"""Connected components (operators/components.py) — convergence and
correctness on shapes the LSH pair lists don't exercise (long chains force
multiple propagation rounds; the catalog query's clusters are near-cliques
that converge in ~2)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from hainan_big_data_recommend_system_spark.operators.components import (
    connected_components,
    connected_components_star,
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize to the component MIN (find() roots are already mins
    # because unions always parent the larger root under the smaller)
    return {x: find(x) for x in parent}


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


def test_self_loop_only_nodes_are_singletons_in_both(spark):
    edges = spark.createDataFrame([(7, 7), (1, 2)], ["a_id", "b_id"])
    prop = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    star = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    assert prop == {7: 7, 1: 1, 2: 1}
    assert star == {7: 7, 1: 1, 2: 1}


def test_star_long_chain_converges_fast(spark):
    # diameter 39 — propagation would need ~39 rounds; large-star/small-star
    # collapses it in O(log^2 n)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], ["a_id", "b_id"]
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(edges, max_rounds=12).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 40


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_both_implementations_match_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    want = _union_find(edges)
    df = spark.createDataFrame(edges, ["a_id", "b_id"])
    prop = {r["node"]: r["component"] for r in connected_components(df).collect()}
    star = {
        r["node"]: r["component"]
        for r in connected_components_star(df).collect()
    }
    assert prop == want
    assert star == want
