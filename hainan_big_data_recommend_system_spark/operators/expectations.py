"""Data-quality expectations — a Deequ/dbt-test-style rule engine.

Warehouse ingestion gates on declarative expectations: null rates,
uniqueness, accepted values, ranges, referential integrity.  Each rule
here compiles to ONE aggregate (or one anti-join + aggregate for
foreign keys) over the target relation, and a suite is the union of
one-row results — so a 50-rule suite over a 100 TB table is a handful
of scans Catalyst can share, never a per-rule collect loop.

Report schema (one row per rule):
``(rule_id, rule, target, n_checked, n_violations, passed)`` — exact
integer counts, ``passed`` as 0/1 so the report hashes cross-engine.

Public knowledge: the expectation vocabulary of open-source data-
quality tooling (AWS Deequ paper, Schelter et al. VLDB 2018; dbt
tests; Great Expectations docs) — reimplemented as plain aggregates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

_REPORT_COLS = [
    "rule_id", "rule", "target", "n_checked", "n_violations", "passed",
]


def _report(rule_id: int, rule: str, target: str, df: DataFrame,
            violation_col) -> DataFrame:
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.sum(violation_col.cast("long")).cast("long").alias(
            "n_violations"
        ),
    ).select(
        F.lit(rule_id).cast("long").alias("rule_id"),
        F.lit(rule).alias("rule"),
        F.lit(target).alias("target"),
        F.coalesce(F.col("n_checked"), F.lit(0)).alias("n_checked"),
        F.coalesce(F.col("n_violations"), F.lit(0)).alias(
            "n_violations"
        ),
        (F.coalesce(F.col("n_violations"), F.lit(0)) == 0)
        .cast("long")
        .alias("passed"),
    )


def expect_not_null(rule_id: int, df: DataFrame, col: str) -> DataFrame:
    return _report(
        rule_id, "not_null", col, df, F.col(col).isNull()
    )


def expect_unique(rule_id: int, df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations = rows beyond the first per key (0 iff key unique)."""
    dup = df.groupBy(*cols).agg(
        (F.count(F.lit(1)) - 1).alias("__extra")
    )
    return dup.agg(
        (F.sum("__extra") + F.count(F.lit(1))).cast("long").alias(
            "n_checked"
        ),
        F.sum("__extra").cast("long").alias("n_violations"),
    ).select(
        F.lit(rule_id).cast("long").alias("rule_id"),
        F.lit("unique").alias("rule"),
        F.lit(",".join(cols)).alias("target"),
        F.coalesce(F.col("n_checked"), F.lit(0)).alias("n_checked"),
        F.coalesce(F.col("n_violations"), F.lit(0)).alias(
            "n_violations"
        ),
        (F.coalesce(F.col("n_violations"), F.lit(0)) == 0)
        .cast("long")
        .alias("passed"),
    )


def expect_accepted_values(
    rule_id: int, df: DataFrame, col: str, values: list[str]
) -> DataFrame:
    cond = ~F.col(col).isin(values) | F.col(col).isNull()
    return _report(rule_id, "accepted_values", col, df, cond)


def expect_in_range(
    rule_id: int, df: DataFrame, col, target: str, lo: int, hi: int
) -> DataFrame:
    """``col`` must be an integral expression (integerize floats to
    cents/micros at the call site); NULL counts as a violation."""
    c = col if not isinstance(col, str) else F.col(col)
    cond = c.isNull() | (c < lo) | (c > hi)
    return _report(rule_id, "in_range", target, df, cond)


def expect_foreign_key(
    rule_id: int,
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
) -> DataFrame:
    """Orphan child rows (fk not found in parent; NULL fk is an
    orphan).  One anti-join + one count — the join strategy (broadcast
    vs shuffle) is Catalyst's call from the parent's size."""
    orphans = child.select(F.col(fk).alias("__fk")).join(
        parent.select(F.col(pk).alias("__fk")).distinct(),
        "__fk",
        "left_anti",
    )
    total = child.agg(F.count(F.lit(1)).cast("long").alias("n"))
    bad = orphans.agg(F.count(F.lit(1)).cast("long").alias("v"))
    return total.crossJoin(bad).select(
        F.lit(rule_id).cast("long").alias("rule_id"),
        F.lit("foreign_key").alias("rule"),
        F.lit(fk).alias("target"),
        F.col("n").alias("n_checked"),
        F.col("v").alias("n_violations"),
        (F.col("v") == 0).cast("long").alias("passed"),
    )


def run_suite(rules: list[DataFrame]) -> DataFrame:
    """Union the one-row rule reports into the suite report."""
    if not rules:
        raise ValueError("empty expectation suite")
    return reduce(lambda a, b: a.unionByName(b), rules)
