"""Property tests for the subtle reference semantics (SURVEY.md §5 item 4):

- F11: normalized tag weight lands in {1..levels} for ANY num distribution,
  is monotone in num, and the per-key max always gets the top level
  (`simility_books.py:38`).
- A8: the rank-discounted score fold is invariant under how similarity TIES
  are broken — tied contributors occupy the same set of rank slots, so the
  contribution multiset (and the integer-scaled sum) cannot change
  (`guessLike_u_like.py:119-124`).
- P10/F8: title normalization is idempotent — one pass removes every
  character either regex can ever match, so a second pass is the identity
  (`simility_books.py:74-88`); hence title-dedup survivors are a fixpoint.

Each example is tiny (≤ 24 rows) but runs through the real Spark operators,
not a reimplementation.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.functions.text import normalize_title
from hainan_big_data_recommend_system_spark.operators.scoring import (
    rank_discounted_score,
)
from hainan_big_data_recommend_system_spark.operators.weights import (
    normalize_weights,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(nums=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=20))
def test_f11_weight_bounds_and_monotonicity(spark, nums):
    df = spark.createDataFrame(
        [(1, i, n) for i, n in enumerate(nums)], "key int, idx int, num long"
    )
    rows = (
        normalize_weights(df, "key", "num")
        .select("idx", "num", "weight")
        .collect()
    )
    by_idx = {r.idx: r for r in rows}
    assert all(1 <= r.weight <= 4 for r in rows), rows
    # the max always maps to the top level: (max+0.1-min)*4/(max+0.1-min) == 4
    mx = max(nums)
    assert all(r.weight == 4 for r in rows if r.num == mx), rows
    # monotone: higher num never gets a lower weight
    ordered = sorted(rows, key=lambda r: r.num)
    for lo, hi in zip(ordered, ordered[1:]):
        assert lo.weight <= hi.weight, (lo, hi)
    assert len(by_idx) == len(nums)


@_SETTINGS
@given(
    sims=st.lists(
        # small finite grid forces frequent exact ties
        st.sampled_from([0.25, 0.5, 0.75, 1.0]),
        min_size=1,
        max_size=12,
    )
)
def test_a8_score_fold_invariant_under_tie_order(spark, sims):
    df = spark.createDataFrame(
        [(7, s, i) for i, s in enumerate(sims)], "item int, sim double, tie int"
    )

    def score(tiebreak):
        return (
            rank_discounted_score(
                df, "item", "sim", [F.desc("sim"), tiebreak], int_scale=1_000_000
            )
            .collect()[0]["score"]
        )

    assert score(F.asc("tie")) == score(F.desc("tie"))


_TITLE_ALPHABET = (
    "abcXYZ019 .·・《》-（）【】/(),第:精"
    "红楼梦三国演义活着围城我们仨！？、"
)


@_SETTINGS
@given(
    titles=st.lists(
        st.text(alphabet=_TITLE_ALPHABET, max_size=24), min_size=1, max_size=8
    )
)
def test_p10_title_normalization_idempotent(spark, titles):
    df = spark.createDataFrame([(t,) for t in titles], "title string")
    once = normalize_title(F.col("title"))
    rows = df.select(
        once.alias("n1"), normalize_title(once).alias("n2")
    ).collect()
    for r in rows:
        assert r.n1 == r.n2, r
