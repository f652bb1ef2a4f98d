"""Bounded BFS semantics (operators/bfs.py) on a hand graph:
first-visit-is-min, undirected symmetrization, seed dedup, unreached
nodes absent, hop cap honored."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.bfs import bfs_hops

# path 0-1-2-3-4 plus a triangle 1-5-6-1 and an island 9-10
EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 1), (9, 10)]


def _run(spark, seeds, k):
    e = spark.createDataFrame(EDGES, "a long, b long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = bfs_hops(e, "a", "b", s, "node", k).collect()
    return {r["node"]: r["hops"] for r in got}


def test_min_hops_from_single_seed(spark):
    assert _run(spark, [0], 3) == {
        0: 0, 1: 1, 2: 2, 3: 3, 5: 2, 6: 2,
    }  # 4 is 4 hops out; island unreached


def test_multi_seed_takes_nearest_and_dedups(spark):
    got = _run(spark, [0, 4, 4], 1)
    assert got == {0: 0, 4: 0, 1: 1, 3: 1}


def test_zero_hops_is_seed_set_only(spark):
    assert _run(spark, [2, 9], 0) == {2: 0, 9: 0}


def test_negative_cap_rejects(spark):
    e = spark.createDataFrame(EDGES, "a long, b long")
    with pytest.raises(ValueError):
        bfs_hops(e, "a", "b", e.select("a"), "a", -1)


def test_random_graphs_match_reference_bfs(spark):
    """Seeded random graphs: the distributed frontier expansion must
    equal a plain Python BFS (collections.deque) on every graph."""
    import random
    from collections import deque

    rng = random.Random(42)
    for _ in range(4):
        n = rng.randrange(8, 20)
        edges = sorted({
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(rng.randrange(5, 30))
        })
        seeds = rng.sample(range(n), rng.randrange(1, 3))
        k = rng.randrange(0, 4)
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {s: 0 for s in seeds}
        q = deque((s, 0) for s in seeds)
        while q:
            node, d = q.popleft()
            if d == k:
                continue
            for nb in adj.get(node, ()):
                if nb not in want:
                    want[nb] = d + 1
                    q.append((nb, d + 1))
        e = spark.createDataFrame(edges, "a long, b long")
        s = spark.createDataFrame([(x,) for x in seeds], "node long")
        got = {
            r["node"]: r["hops"]
            for r in bfs_hops(e, "a", "b", s, "node", k).collect()
        }
        assert got == want, (edges, seeds, k)
