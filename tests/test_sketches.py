"""Invariant checks for the sketch aggregates (rows-only catalog entry
``sketch_event_stats``): HLL++ distinct counts within the configured error
of exact, approximate percentiles ordered and inside [min, max]."""

from __future__ import annotations

from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.catalog import load_table
from hainan_big_data_recommend_system_spark.qcatalog import EXTRA_REGISTRY

SF_DIR = "/root/testdata/sf0.01"


def test_sketch_stats_invariants(spark):
    got = {
        r["event_type"]: r
        for r in EXTRA_REGISTRY["sketch_event_stats"].fn(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    assert set(got) == set(exact) and len(got) == 5
    for et, row in got.items():
        ex = exact[et]
        # rsd=0.02 → allow 5x headroom for the small-cardinality regime
        assert abs(row["approx_users"] - ex["users"]) <= max(3, 0.10 * ex["users"]), (
            et, row["approx_users"], ex["users"],
        )
        p50, p95 = row["value_p50"], row["value_p95"]
        assert ex["vmin"] <= p50 <= p95 <= ex["vmax"], (et, p50, p95)


def test_sketch_stats_scalar_columns_only(spark):
    """Driver-canonicalizer contract: no array/map/struct columns in any
    catalog result (pandas sort_values crashes on unhashable cells)."""
    df = EXTRA_REGISTRY["sketch_event_stats"].fn(spark, SF_DIR)
    for f in df.schema.fields:
        assert f.dataType.typeName() not in ("array", "map", "struct"), f.name


def test_cms_heavy_hitters_bounds(spark):
    """Count-min never undercounts, and with eps=0.001 the overcount on
    this fixture is bounded by eps * stream length (99% confidence; seed
    pinned, so this is deterministic in practice)."""
    got = EXTRA_REGISTRY["cms_heavy_hitters"].fn(spark, SF_DIR).collect()
    assert len(got) == 10
    n_events = load_table(spark, SF_DIR, "events").count()
    for r in got:
        assert r["cms_n"] >= r["exact_n"], r  # CMS is one-sided
        assert r["cms_n"] <= r["exact_n"] + 0.001 * n_events, r
    # the probe list is the exact top-10: descending counts
    counts = [r["exact_n"] for r in got]
    assert counts == sorted(counts, reverse=True)
