"""Every SQL-expressible catalog query must match its DuckDB oracle —
this mirrors the driver's t2 correctness gate (row count + schema +
order-insensitive values) at sf0.01."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.qcatalog import (
    DRIVER_CHECK_LIMIT,
    EXTRA_REGISTRY,
    REGISTRY,
)
from tests.oracle_utils import compare, duck_con

# driver-exported queries AND the locally-verified extras are held to the
# same DuckDB gate; only the first DRIVER_CHECK_LIMIT exported entries get
# a driver row, so the export registry must never exceed it
_ALL = {**REGISTRY, **EXTRA_REGISTRY}
_ORACLED = [n for n, s in _ALL.items() if s.oracle is not None]


def test_driver_registry_within_check_window():
    assert len(REGISTRY) <= DRIVER_CHECK_LIMIT, (
        f"{len(REGISTRY)} exported queries; driver only checks the first "
        f"{DRIVER_CHECK_LIMIT} — move overflow to register_extra"
    )


@pytest.fixture(scope="module")
def con(sf_oracle_dir):
    c = duck_con(sf_oracle_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _ORACLED)
def test_oracle_match(name, spark, sf_oracle_dir, con):
    spec = _ALL[name]
    compare(spec.fn(spark, sf_oracle_dir), con, spec.oracle, name)


def test_rows_only_queries_run(spark, sf_oracle_dir):
    for name, spec in _ALL.items():
        if spec.oracle is None:
            assert spec.fn(spark, sf_oracle_dir).count() >= 0, name
