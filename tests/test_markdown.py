"""Markdown prose extraction (operators/markdown.py) rule-level pins.
The catalog query is oracle-gated in test_oracle."""

from __future__ import annotations

from hainan_big_data_recommend_system_spark.operators.markdown import (
    markdown_to_text,
)


def _run(spark, md: str) -> str:
    df = spark.createDataFrame([(md,)], "md string")
    return df.select(markdown_to_text("md").alias("t")).collect()[0]["t"]


def test_rules(spark):
    assert _run(spark, "# Head\nbody") == "Head body"
    assert _run(spark, "a **b** *c* `d` e") == "a b c d e"
    assert _run(spark, "[text](http://u) and ![alt](i.png)") == "text and alt"
    assert _run(spark, "- one\n- two\n1. three") == "one two three"
    assert _run(spark, "> quoted\n---\nafter") == "quoted after"
    assert (
        _run(spark, "before\n```\ncode *not* emphasized\n```\nafter")
        == "before after"
    )


def test_fences_are_non_greedy(spark):
    # two fences: the text BETWEEN them must survive
    md = "```a```keep me```b```"
    assert _run(spark, md) == "keep me"


def test_plan_scan_local(spark):
    df = spark.createDataFrame([("x",)], "md string")
    plan = (
        df.select(markdown_to_text("md").alias("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "Exchange" not in plan
