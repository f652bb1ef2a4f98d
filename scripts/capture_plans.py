#!/usr/bin/env python3
"""Capture .explain("formatted") for every driver-registry query into
plans/<tag>/<query>_<suffix>.txt (guide §1: record the plan shape —
Exchange count, join strategy, PushedFilters, BatchEvalPython nodes —
before and after each optimization).

Usage: python scripts/capture_plans.py <suffix> [query ...]
  suffix: "before" or "after" (file name suffix)
  query:  optional subset; default = all registry queries
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_PLAN_DIR (default plans/r16).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hainan_big_data_recommend_system_spark.qcatalog import REGISTRY  # noqa: E402
from hainan_big_data_recommend_system_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(REGISTRY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLAN_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "plans", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    for name in names:
        spec = REGISTRY[name]
        try:
            df = spec.fn(spark, sf_dir)
            # public API capture (ADVICE r15 low: the former
            # PythonSQLUtils.explainString reach-in can break across
            # PySpark versions)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # a query that fails to plan still gets a file
            plan = f"PLAN CAPTURE FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
