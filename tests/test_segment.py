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
