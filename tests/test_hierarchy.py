"""Pointer doubling (operators/hierarchy.py): random forests and a
worst-case deep chain against a plain Python parent-walk."""

from __future__ import annotations

import random

import pytest

from hainan_big_data_recommend_system_spark.operators.hierarchy import (
    resolve_roots,
)


def _walk(parents: dict[int, int | None]):
    out = {}
    for node in parents:
        cur, d = node, 0
        while parents[cur] is not None:
            cur = parents[cur]
            d += 1
        out[node] = (cur, d)
    return out


def _run(spark, parents):
    df = spark.createDataFrame(
        [(n, p) for n, p in parents.items()], "node long, parent long"
    )
    got = resolve_roots(df, "node", "parent").collect()
    assert len(got) == len(parents)
    return {r["node"]: (r["root"], r["depth"]) for r in got}


def test_random_forests_match_python_walk(spark):
    rng = random.Random(7)
    for _ in range(3):
        n = rng.randrange(10, 40)
        parents = {0: None}
        for node in range(1, n):
            # parent strictly smaller -> acyclic; some extra roots
            parents[node] = (
                None if rng.random() < 0.15 else rng.randrange(node)
            )
        assert _run(spark, parents) == _walk(parents)


def test_deep_chain_resolves_within_rounds(spark):
    # depth 50 < 2^6: six doubling rounds must fully resolve it
    parents = {0: None}
    parents.update({i: i - 1 for i in range(1, 51)})
    got = _run(spark, parents)
    assert got[50] == (0, 50) and got[1] == (0, 1)


def test_negative_rounds_reject(spark):
    df = spark.createDataFrame([(0, None)], "node long, parent long")
    with pytest.raises(ValueError):
        resolve_roots(df, "node", "parent", rounds=-1)
