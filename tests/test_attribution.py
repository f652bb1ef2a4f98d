"""Multi-touch attribution semantics (operators/attribution.py): the
oracle pins the composed event-table result; these pin the credit
arithmetic, the accounting identity, and the window edges."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.operators.attribution import (
    channel_report,
    position_attribution,
)


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


def _frames(spark, convs, touches):
    conv = spark.createDataFrame(
        convs, "user long, ts timestamp, conv_id long"
    )
    tch = spark.createDataFrame(
        touches, "user long, ts timestamp, channel string"
    )
    return conv, tch


def test_u_shape_and_remainder_distribution(spark):
    # 5 touches: first 4000, last 4000; middle 3 share 2000 ->
    # 666 each, remainder 2 -> the two EARLIEST middles get +1
    conv, tch = _frames(
        spark,
        [(1, _ts(10), 100)],
        [(1, _ts(9, h), f"c{h}") for h in range(1, 6)],
    )
    rows = sorted(
        position_attribution(conv, tch).collect(),
        key=lambda r: r["touch_rank"],
    )
    assert [r["credit_bp"] for r in rows] == [4000, 667, 667, 666, 4000]
    assert sum(r["credit_bp"] for r in rows) == 10_000


def test_one_and_two_touch_splits(spark):
    conv, tch = _frames(
        spark,
        [(1, _ts(10), 100), (2, _ts(10), 200)],
        [
            (1, _ts(9), "a"),
            (2, _ts(9, 1), "a"), (2, _ts(9, 2), "b"),
        ],
    )
    out = {
        (r["conv_id"], r["touch_rank"]): r["credit_bp"]
        for r in position_attribution(conv, tch).collect()
    }
    assert out[(100, 1)] == 10_000
    assert out[(200, 1)] == 6_000 and out[(200, 2)] == 4_000


def test_window_edges_strict_before_and_lookback(spark):
    conv, tch = _frames(
        spark,
        [(1, _ts(10), 100)],
        [
            (1, _ts(10), "same_instant"),       # ts == conv: excluded
            (1, _ts(7), "at_lookback_edge"),    # exactly conv-3d: included
            (1, _ts(6, 23), "too_old"),         # outside lookback
        ],
    )
    rows = position_attribution(conv, tch, lookback_seconds=3 * 86400)
    got = [(r["channel"], r["credit_bp"]) for r in rows.collect()]
    assert got == [("at_lookback_edge", 10_000)]


def test_untouched_conversion_gets_none_channel(spark):
    conv, tch = _frames(
        spark, [(1, _ts(10), 100)], [(2, _ts(9), "a")]
    )
    rows = position_attribution(conv, tch).collect()
    assert [(r["channel"], r["n_touches"], r["credit_bp"]) for r in rows] \
        == [("(none)", 0, 10_000)]


def test_accounting_identity_total_credit(spark):
    # random-ish lattice: every conversion must contribute exactly
    # 10000 bp no matter its touch count
    convs = [(u, _ts(10 + u % 3), 100 + u) for u in range(8)]
    touches = [
        (u, _ts(8 + (u + k) % 3, k), f"c{k % 3}")
        for u in range(8)
        for k in range(u % 5)
    ]
    conv, tch = _frames(spark, convs, touches)
    credits = position_attribution(conv, tch)
    total = credits.agg(F.sum("credit_bp")).collect()[0][0]
    assert total == 10_000 * len(convs)
    report = channel_report(credits)
    assert report.agg(F.sum("credit_bp_total")).collect()[0][0] == total


def test_plan_is_python_free_and_conv_partitioned(spark):
    conv, tch = _frames(spark, [(1, _ts(10), 100)], [(1, _ts(9), "a")])
    plan = position_attribution(conv, tch)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan
    assert "WindowExec: No Partition Defined" not in plan
