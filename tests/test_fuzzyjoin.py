"""Edit-distance join: hand-pinned semantics + the lossless-candidate
guarantee at its boundary."""

from __future__ import annotations

from hainan_big_data_recommend_system_spark.operators.fuzzyjoin import (
    edit_distance_join,
)


def _pairs(spark, rows, max_dist=2, q=4):
    df = spark.createDataFrame(rows, "id long, s string")
    out = edit_distance_join(df, "id", "s", max_dist=max_dist, q=q)
    return {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}


def test_substitution_insertion_deletion_found(spark):
    rows = [
        (1, "the quick brown fox."),
        (2, "the quick brown fux."),   # 1 substitution
        (3, "the quick browwn fox."),  # 1 insertion
        (4, "the quick brwn fox."),    # 1 deletion
        (5, "a completely different string"),
    ]
    got = _pairs(spark, rows)
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 1
    assert got[(1, 4)] == 1
    assert (2, 3) in got and got[(2, 3)] == 2
    assert all(5 not in k for k in got)


def test_distance_boundary_exclusive(spark):
    rows = [
        (1, "abcdefghijklmnop"),
        (2, "abcdefghijklmnXY"),   # distance 2: kept
        (3, "abcdefghijklmXYZ"),   # distance 3: dropped
    ]
    got = _pairs(spark, rows, max_dist=2, q=4)
    assert got.get((1, 2)) == 2
    assert (1, 3) not in got


def test_short_strings_filtered_by_contract(spark):
    # below q*(k+1) the shared-gram guarantee fails → contractually excluded
    got = _pairs(spark, [(1, "abc"), (2, "abd")], max_dist=2, q=4)
    assert got == {}


def test_exact_duplicates_report_distance_zero(spark):
    got = _pairs(spark, [(1, "twin string twin string"), (2, "twin string twin string")])
    assert got == {(1, 2): 0}


def test_worst_case_pair_with_disjoint_middle_still_found(spark):
    """Two edits q chars apart destroy the maximum number of grams —
    the bound L >= q(k+1) is tight, so verify a pair engineered at the
    boundary still surfaces."""
    a = "abcdefgh" + "ijklmnop"          # L = 16 = q(k+1) with q=4? no: 12
    b = "abcdXfgh" + "ijklXnop"          # 2 substitutions, q apart
    got = _pairs(spark, [(1, a), (2, b)], max_dist=2, q=4)
    assert got == {(1, 2): 2}
