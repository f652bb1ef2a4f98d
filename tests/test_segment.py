"""M1 gated segmentation: Arrow UDF contract + reference token filter
(len>=2, non-digit) hold on the fallback path (jieba absent here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.functions.segment import (
    segmented_tokens,
)


def test_segment_filter_and_schema(spark):
    df = spark.createDataFrame(
        [(1, "spark sql engine 42 ok"), (2, ""), (3, None)], ["id", "t"]
    )
    out = df.select("id", segmented_tokens(F.col("t")).alias("toks"))
    assert out.schema["toks"].dataType.simpleString() == "array<string>"
    rows = {r["id"]: r["toks"] for r in out.collect()}
    # len>=2 drops nothing here but '42' must be dropped (all digits),
    # 'ok' kept (len 2)
    assert rows[1] == ["spark", "sql", "engine", "ok"]
    assert rows[2] == []
    assert rows[3] == []


def test_segment_cjk_fallback_emits_bigrams(spark):
    import hainan_big_data_recommend_system_spark.functions.segment as seg

    if seg._jieba is not None:  # pragma: no cover - env-dependent
        import pytest

        pytest.skip("jieba present: dictionary words, not bigrams")
    # dictionary-free fallback must still tokenize CJK: character bigrams
    # survive the reference's len>=2 filter (a 1-char-per-codepoint
    # fallback would return [] for all Chinese text)
    df = spark.createDataFrame([(1, "海南大数据 spark 系统")], ["id", "t"])
    toks = df.select(segmented_tokens(F.col("t")).alias("x")).collect()[0]["x"]
    assert "spark" in toks
    cjk = [t for t in toks if not t.isascii()]
    assert cjk and all(len(t) == 2 for t in cjk)
    assert "海南" in cjk and "系统" in cjk
