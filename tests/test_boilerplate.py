"""Site-level boilerplate-line scrub (operators/boilerplate.py, round
7).  site_boilerplate_scrub is oracle-gated in test_oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.operators.boilerplate import (
    scrub_boilerplate,
)


def _pages(spark):
    rows = []
    for site, n in (("a.com", 6), ("b.com", 3)):
        for i in range(n):
            rows.append(
                (
                    f"{site}-{i}",
                    site,
                    f"MENU {site}\nreal content {site} {i}\n"
                    f"real content {site} {i} line two\nfooter {site}",
                )
            )
    return spark.createDataFrame(rows, "doc_id string, site string, text string")


def test_template_lines_dropped_per_site(spark):
    out = {
        r["doc_id"]: r
        for r in scrub_boilerplate(
            _pages(spark), "doc_id", "site", "text", min_site_df=3
        ).collect()
    }
    for did, r in out.items():
        site = r["site"]
        assert r["n_lines_in"] == 4
        assert r["n_lines_kept"] == 2
        lines = r["clean_text"].split("\n")
        assert lines[0].startswith("real content") and len(lines) == 2
        assert f"MENU {site}" not in r["clean_text"]
        assert f"footer {site}" not in r["clean_text"]


def test_df_counts_documents_not_occurrences(spark):
    # one page repeats a line 5 times — repetition inside ONE doc is not
    # template; it must survive a min_site_df=3 scrub
    df = spark.createDataFrame(
        [
            ("d1", "s", "\n".join(["echo echo"] * 5)),
            ("d2", "s", "other text"),
        ],
        "doc_id string, site string, text string",
    )
    out = {r["doc_id"]: r for r in scrub_boilerplate(
        df, "doc_id", "site", "text", min_site_df=3
    ).collect()}
    assert out["d1"]["n_lines_kept"] == 5


def test_same_line_on_two_sites_is_independent(spark):
    # df is WITHIN-site: a line common on site A stays on site B
    rows = [(f"a-{i}", "a", "shared banner\nbody a " + str(i)) for i in range(4)]
    rows.append(("b-0", "b", "shared banner\nbody b"))
    df = spark.createDataFrame(rows, "doc_id string, site string, text string")
    out = {r["doc_id"]: r for r in scrub_boilerplate(
        df, "doc_id", "site", "text", min_site_df=3
    ).collect()}
    assert all(out[f"a-{i}"]["n_lines_kept"] == 1 for i in range(4))
    assert out["b-0"]["n_lines_kept"] == 2  # banner kept on site b


def test_min_site_df_validation(spark):
    with pytest.raises(ValueError, match="min_site_df"):
        scrub_boilerplate(_pages(spark), "doc_id", "site", "text", min_site_df=1)
