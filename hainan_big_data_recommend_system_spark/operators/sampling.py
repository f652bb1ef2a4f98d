"""Seeded, reproducible sampling (SURVEY.md §2.6 O4).

Reference semantics: ``random.sample(hot_bookid, 5)`` exploration picks
(`guessLike_u_like.py:126`) and a cap of 20 log books per user
(`log_analyze.py:57`) — unseeded in the reference, which makes reruns
non-reproducible.  The build makes sampling a deterministic function of the
row key: order by ``md5(seed || key)`` and take the first k.  That is a
reproducible pseudo-random permutation, identical across engines and across
reruns/retries — at scale, task retries MUST NOT resample (a nondeterministic
sample feeding a downstream join produces phantom rows under retry).

``md5`` is bit-identical in Spark and DuckDB, so sampled queries stay
oracle-checkable — unlike ``rand(seed)``, whose stream is engine-specific.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def hash_rank(key: Column, seed: str = "42") -> Column:
    """Deterministic pseudo-random sort key for ``key`` under ``seed``."""
    return F.md5(F.concat(F.lit(seed), F.lit(":"), key.cast("string")))


def sample_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    key: Column,
    k: int,
    seed: str = "42",
    rank_col: str = "rn",
) -> DataFrame:
    """O4: k pseudo-random rows per group, reproducible under ``seed``.

    Deterministic even under hash ties (secondary sort on the key itself).
    """
    w = Window.partitionBy(*partition_by).orderBy(
        hash_rank(key, seed).asc(), key.asc()
    )
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def hash_uniform(key: Column, seed: str = "42") -> Column:
    """Deterministic uniform [0,1) from the row key: first 8 md5 hex chars
    as an integer over 16⁸.  Same bits in Spark and DuckDB → stratified
    samples stay oracle-checkable, and task retries can never resample."""
    return (
        F.conv(F.substring(hash_rank(key, seed), 1, 8), 16, 10).cast("double")
        / F.lit(float(16**8))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key: Column,
    seed: str = "42",
) -> DataFrame:
    """Per-stratum Bernoulli sample at exact, reproducible rates — the
    class-rebalancing primitive of a training-data pipeline (down-weight
    dominant classes, keep all of rare ones).

    A row survives iff ``hash_uniform(key) < fractions[stratum]``; missing
    strata default to 0 (dropped).  Unlike ``DataFrame.sampleBy`` the
    decision is a pure function of (seed, key) — identical across engines,
    retries, and partitionings.
    """
    u = hash_uniform(key, seed)
    frac = None
    for value, p in fractions.items():
        cond = F.col(strata_col) == value
        frac = F.when(cond, F.lit(p)) if frac is None else frac.when(cond, F.lit(p))
    if frac is None:  # empty fractions: every stratum defaults to 0
        return df.filter(F.lit(False))
    return df.filter(u < frac.otherwise(F.lit(0.0)))
