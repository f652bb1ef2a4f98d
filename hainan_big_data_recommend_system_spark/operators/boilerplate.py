"""Site-level boilerplate-line removal — the template scrub every
web-corpus pipeline runs after HTML extraction (C4's descendants,
RefinedWeb §"line-wise corrections"): navigation menus, cookie banners
and copyright footers repeat VERBATIM across a site's pages, so a line
whose within-site document frequency is high is template, not content.

Spark-first shape (three bounded shuffles, no UDF):

1. explode docs to ``(doc, site, pos, line)`` — scan-local;
2. within-site line frequency: one groupBy on ``(site, line)`` with
   map-side partial counts (the heavy shuffle, keyed exactly like
   exact-dedup);
3. docs drop their high-df lines via a LEFT ANTI join on
   ``(site, line)`` and reassemble in original position order with one
   per-doc aggregate.

At 100 TB the (site, line) key is naturally skew-prone (one giant
site); the count is an aggregate (partial combine absorbs skew) and the
anti-join side is the small high-df line SET, broadcast-eligible per
site batch.

Public knowledge: Penedo et al. 2023 (RefinedWeb); Raffel et al. 2020
(C4 line rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def scrub_boilerplate(
    docs: DataFrame,
    id_col: str,
    site_col: str,
    text_col: str,
    min_site_df: int = 5,
) -> DataFrame:
    """Per doc: ``(doc_id, site, n_lines_in, n_lines_kept, clean_text)``
    with every line that appears in at least ``min_site_df`` of the
    site's documents removed.  Line identity is exact (post-trim
    equality); blank lines are dropped as input noise."""
    if min_site_df < 2:
        raise ValueError(f"min_site_df={min_site_df} must be >= 2")
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(site_col).alias("site"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    ).filter(F.trim(F.col("line")) != "")
    # within-site df counts DOCUMENTS, not occurrences: a line repeated
    # inside one page is repetition (Gopher's problem), not template
    site_df = (
        lines.select("site", "line", "doc_id")
        .distinct()
        .groupBy("site", "line")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    boiler = site_df.filter(F.col("df") >= min_site_df).select("site", "line")
    kept = lines.join(boiler, ["site", "line"], "left_anti")
    totals = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines_in")
    )
    out = (
        kept.groupBy("doc_id", "site")
        .agg(
            F.count(F.lit(1)).alias("n_lines_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
    )
    return out.join(totals, "doc_id").select(
        "doc_id",
        "site",
        F.col("n_lines_in").cast("long").alias("n_lines_in"),
        F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
        "clean_text",
    )
