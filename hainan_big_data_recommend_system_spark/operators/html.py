"""HTML → training-text extraction (boilerplate removal).

The reference's scraper pulls page content with XPath in a notebook
(`simility_books.py` sibling notebook; SURVEY §2.1 S14) — the fetch is out
of engine scope, but turning raw HTML into clean training text IS an
engine concern, and at corpus scale it is the very first stage of every
web-crawl pipeline (the role trafilatura/jusText play in public corpus
builds: strip markup, drop chrome, keep body prose).

Everything here is built from JVM-side string expressions — regex
replaces, chained entity decodes, `regexp_extract_all` — so extraction
runs inside whole-stage codegen with zero Python in the hot path, and
every step is a deterministic pure function of the input string:
identical in Spark (Java regex) and DuckDB (RE2) because the patterns
stay inside the common dialect (non-greedy `.*?`, `(?s)` dotall, explicit
character classes, NO backreferences — RE2 has none).

Scale: scan-local projection; no shuffle, no UDF.  At 100 TB this is a
map-only stage that pushes column pruning into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Structural containers whose entire content is dropped as boilerplate
#: (site chrome / code / styling), each spelled as its own pattern —
#: RE2-compatible, no backreferences.
_DROP_BLOCKS = [
    r"(?s)<script[^>]*>.*?</script>",
    r"(?s)<style[^>]*>.*?</style>",
    r"(?s)<nav[^>]*>.*?</nav>",
    r"(?s)<header[^>]*>.*?</header>",
    r"(?s)<footer[^>]*>.*?</footer>",
    r"(?s)<aside[^>]*>.*?</aside>",
    r"(?s)<!--.*?-->",
]

_TAG = r"<[^>]*>"
_WS = r"[ \t\n\x0B\f\r]+"  # explicit ASCII class: Java \s ⊃ RE2 \s
_ANCHOR_BODY = r"(?s)<a[^>]*>(.*?)</a>"

#: Minimal entity set, decoded in a fixed order (amp LAST so that
#: double-encoded text is not double-decoded).
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _strip_blocks(col: Column) -> Column:
    for pat in _DROP_BLOCKS:
        col = F.regexp_replace(col, pat, " ")
    return col


def _decode_entities(col: Column) -> Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def html_extract_text(
    df: DataFrame, id_col: str, html_col: str
) -> DataFrame:
    """Extract clean prose + a link-density quality signal from raw HTML.

    Stages (each a codegen'd expression over the previous):

    1. drop ``script/style/nav/header/footer/aside`` blocks and comments
       — structural boilerplate, content and all;
    2. measure anchor text that SURVIVED stage 1 (``regexp_extract_all``
       over ``<a …>…</a>`` bodies) — the numerator of link density, the
       classic boilerplate signal (a high ratio of linked chars means
       chrome, not prose);
    3. strip every remaining tag, decode the minimal entity set, collapse
       whitespace, trim.

    Returns ``(doc_id, main_text, main_len, link_chars,
    link_density_micros)`` — the density integerized per row so
    downstream filters (and the DuckDB oracle hash) are exact.
    """
    deboiled = _strip_blocks(F.col(html_col))
    # anchor text length: total chars inside surviving <a> bodies, tags
    # inside the body stripped before counting
    link_chars = F.aggregate(
        F.transform(
            F.regexp_extract_all(deboiled, F.lit(_ANCHOR_BODY), 1),
            lambda b: F.length(F.regexp_replace(b, _TAG, "")).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    text = F.trim(
        F.regexp_replace(
            _decode_entities(F.regexp_replace(deboiled, _TAG, " ")), _WS, " "
        )
    )
    main_len = F.length(text).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        text.alias("main_text"),
        main_len.alias("main_len"),
        link_chars.alias("link_chars"),
        F.round(
            link_chars.cast("double") * 1000000.0
            / F.greatest(main_len, F.lit(1).cast("long")).cast("double")
        )
        .cast("long")
        .alias("link_density_micros"),
    )
