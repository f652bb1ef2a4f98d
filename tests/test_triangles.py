"""Triangle counting (operators/triangles.py): brute-force equality on
random graphs (each triangle counted once per member node), duplicate/
reversed-edge tolerance, and hub-graph sanity.  The composed
co-purchase query is hash-oracled (`copurchase_triangles`)."""

from __future__ import annotations

import itertools
import random

from hainan_big_data_recommend_system_spark.operators.triangles import (
    count_triangles,
)


def _brute(edge_set):
    adj = {}
    for u, v in edge_set:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _run(spark, edges):
    df = spark.createDataFrame(list(edges), "a long, b long")
    return {
        r["node"]: r["n_triangles"]
        for r in count_triangles(df, "a", "b").collect()
    }


def test_matches_brute_force_on_random_graph(spark):
    rng = random.Random(7)
    nodes = range(24)
    edges = {
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.25
    }
    assert _run(spark, edges) == _brute(edges)


def test_duplicates_reversals_and_self_loops_ignored(spark):
    base = [(1, 2), (2, 3), (1, 3)]
    noisy = base + [(2, 1), (3, 2), (1, 1), (1, 2)]
    got = _run(spark, noisy)
    assert got == {1: 1, 2: 1, 3: 1}


def test_hub_star_has_no_triangles_k4_has_four(spark):
    star = [(0, i) for i in range(1, 30)]
    assert _run(spark, star) == {}
    k4 = list(itertools.combinations(range(4), 2))
    # K4: each node sits in C(3,2)=3 triangles, 4 triangles total
    assert _run(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}
