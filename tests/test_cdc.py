"""CDC compaction semantics (operators/cdc.py): last-writer-wins,
terminal-delete removal, non-terminal deletes resurrected by later
upserts, seq-tie determinism, and the loud unknown-op path.  The
composed orders query is hash-oracled (`orders_cdc_apply`)."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.cdc import cdc_apply


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "key long, seq long, op string, val string"
    )


def test_last_writer_wins_and_terminal_delete(spark):
    rows = [
        (1, 0, "I", "a"), (1, 1, "U", "b"), (1, 2, "U", "c"),
        (2, 0, "I", "x"), (2, 1, "D", "-"),
        (3, 0, "I", "only"),
    ]
    got = {
        r["key"]: (r["val"], r["n_versions"])
        for r in cdc_apply(_log(spark, rows), ["key"], "seq", "op")
        .collect()
    }
    assert got == {1: ("c", 3), 3: ("only", 1)}  # key 2 deleted


def test_delete_then_reinsert_survives(spark):
    rows = [(1, 0, "I", "a"), (1, 1, "D", "-"), (1, 2, "I", "back")]
    got = cdc_apply(_log(spark, rows), ["key"], "seq", "op").collect()
    assert [(r["val"], r["n_versions"]) for r in got] == [("back", 3)]


def test_seq_tie_broken_deterministically(spark):
    rows = [(1, 5, "U", "lo"), (1, 5, "U", "hi")]
    got = cdc_apply(
        _log(spark, rows), ["key"], "seq", "op", tiebreak_cols=["val"]
    ).collect()
    assert [r["val"] for r in got] == ["lo"]  # desc tiebreak: max('lo','hi')


def test_unknown_op_fails_loudly(spark):
    rows = [(1, 0, "Z", "a")]
    with pytest.raises(Exception, match="unknown op"):
        cdc_apply(_log(spark, rows), ["key"], "seq", "op").collect()
