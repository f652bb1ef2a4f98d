"""RAG passage chunking (operators/chunking.py, round 7).
document_chunks is oracle-gated in test_oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.operators.chunking import (
    chunk_documents,
)


def _doc(spark, n_tokens):
    text = " ".join(f"w{i}" for i in range(n_tokens))
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_windows_cover_everything_with_overlap(spark):
    rows = sorted(
        chunk_documents(_doc(spark, 100), "doc_id", "text",
                        chunk_tokens=64, overlap=16).collect(),
        key=lambda r: r["chunk_index"],
    )
    assert [r["start_token"] for r in rows] == [0, 48]
    assert [r["n_tokens"] for r in rows] == [64, 52]
    c0 = rows[0]["chunk_text"].split(" ")
    c1 = rows[1]["chunk_text"].split(" ")
    assert c0 == [f"w{i}" for i in range(64)]
    assert c1 == [f"w{i}" for i in range(48, 100)]
    assert c0[48:] == c1[:16]  # the 16-token overlap is verbatim


def test_short_doc_single_chunk_and_exact_fit(spark):
    one = chunk_documents(_doc(spark, 10), "doc_id", "text",
                          chunk_tokens=64, overlap=16).collect()
    assert len(one) == 1 and one[0]["n_tokens"] == 10
    # exact multiple: no empty trailing window
    fit = chunk_documents(_doc(spark, 64 + 48), "doc_id", "text",
                          chunk_tokens=64, overlap=16).collect()
    assert len(fit) == 2
    assert max(r["start_token"] + r["n_tokens"] for r in fit) == 112


def test_every_token_in_at_least_one_chunk(spark):
    for n in (1, 63, 64, 65, 111, 112, 113, 200):
        rows = chunk_documents(_doc(spark, n), "doc_id", "text",
                               chunk_tokens=64, overlap=16).collect()
        covered = set()
        for r in rows:
            covered |= set(
                range(r["start_token"], r["start_token"] + r["n_tokens"])
            )
        assert covered == set(range(n)), n


def test_overlap_validation(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_doc(spark, 10), "doc_id", "text",
                        chunk_tokens=32, overlap=32)


def test_plan_is_scan_local(spark):
    df = chunk_documents(_doc(spark, 100), "doc_id", "text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan, plan
