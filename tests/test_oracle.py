"""Every SQL-expressible catalog query must match its DuckDB oracle —
this mirrors the driver's t2 correctness gate (row count + schema +
order-insensitive values) at sf0.01."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.qcatalog import REGISTRY
from tests.oracle_utils import compare, duck_con

_ORACLED = [n for n, s in REGISTRY.items() if s.oracle is not None]


@pytest.fixture(scope="module")
def con(sf_oracle_dir):
    c = duck_con(sf_oracle_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _ORACLED)
def test_oracle_match(name, spark, sf_oracle_dir, con):
    spec = REGISTRY[name]
    compare(spec.fn(spark, sf_oracle_dir), con, spec.oracle, name)


def test_rows_only_queries_run(spark, sf_oracle_dir):
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            assert spec.fn(spark, sf_oracle_dir).count() >= 0, name
