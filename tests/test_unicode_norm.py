"""Unicode normalization (functions/unicode_norm.py, round 7):
fullwidth folding and invisible stripping as pure column expressions.
unicode_normalize_scan is oracle-gated in test_oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.functions.unicode_norm import (
    ASCII_FORMS,
    FULLWIDTH_FORMS,
    fold_fullwidth,
    normalize_text,
    strip_invisible,
)


def test_fullwidth_folds_to_ascii(spark):
    df = spark.createDataFrame(
        [("ＨｅｌｌｏＷｏｒｌｄ！　１２３",), ("plain ascii stays",)],
        "t string",
    )
    got = [r["o"] for r in df.select(fold_fullwidth("t").alias("o")).collect()]
    assert got == ["HelloWorld! 123", "plain ascii stays"]


def test_invisibles_stripped_and_dedup_restored(spark):
    clean = "the same sentence exactly"
    noisy = clean.replace(" ", " ​") + "­﻿"
    df = spark.createDataFrame([(1, clean), (2, noisy)], "i long, t string")
    out = df.select("i", normalize_text(F.col("t")).alias("n"))
    fps = out.select(F.md5(F.col("n").cast("binary")).alias("fp")).distinct()
    assert fps.count() == 1  # dedup fingerprints reunite after the pass


def test_mapping_tables_are_aligned():
    assert len(FULLWIDTH_FORMS) == len(ASCII_FORMS) == 94
    for fw, asc in zip(FULLWIDTH_FORMS, ASCII_FORMS):
        assert ord(fw) - 0xFF01 == ord(asc) - 0x21


def test_cjk_text_untouched(spark):
    df = spark.createDataFrame([("中文文本保持不变",)], "t string")
    assert (
        df.select(normalize_text(F.col("t")).alias("o")).collect()[0]["o"]
        == "中文文本保持不变"
    )


def test_plan_is_scan_local(spark):
    df = spark.createDataFrame([("x",)], "t string")
    plan = (
        df.select(normalize_text(F.col("t")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "Exchange" not in plan, plan
