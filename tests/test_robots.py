"""robots.txt filter (operators/robots.py): RFC 9309 group selection,
longest-match precedence, wildcard/anchor translation.  The catalog
query is oracle-gated in test_oracle."""

from __future__ import annotations

from hainan_big_data_recommend_system_spark.operators.robots import (
    allowed_column,
    parse_robots,
)

POLICY = """
User-agent: googlebot
Disallow: /private/

User-agent: a
User-agent: b
Disallow: /shared/

User-agent: *
Disallow: /admin/
Allow: /admin/help
Disallow: /*.pdf$
Disallow:
"""


def test_group_selection_and_shared_agent_lines():
    assert parse_robots(POLICY, "googlebot") == [(False, "/private/")]
    # consecutive User-agent lines share one group
    assert parse_robots(POLICY, "a") == [(False, "/shared/")]
    assert parse_robots(POLICY, "b") == [(False, "/shared/")]
    # unknown agent falls back to *; the empty Disallow is dropped
    assert parse_robots(POLICY, "nobody") == [
        (False, "/admin/"), (True, "/admin/help"), (False, "/*.pdf$"),
    ]


def test_column_semantics(spark):
    rules = parse_robots(POLICY)
    df = spark.createDataFrame(
        [
            ("/admin/secret",), ("/admin/help/page",), ("/x/report.pdf",),
            ("/x/report.pdfz",), ("/open",),
        ],
        "path string",
    )
    got = {
        r["path"]: r["ok"]
        for r in df.select(
            "path", allowed_column(rules, "path").alias("ok")
        ).collect()
    }
    assert got == {
        "/admin/secret": False,
        "/admin/help/page": True,   # longer allow overrides disallow
        "/x/report.pdf": False,     # $-anchored wildcard
        "/x/report.pdfz": True,
        "/open": True,              # no rule -> allowed
    }


def test_no_rules_allows_everything(spark):
    df = spark.createDataFrame([("/anything",)], "path string")
    assert df.select(
        allowed_column([], "path").alias("ok")
    ).collect()[0]["ok"]


def test_non_rule_directive_terminates_ua_collection():
    """ADVICE r6: Crawl-delay (or any non-rule directive) must end the
    user-agent collection phase — agent 'a' gets NO rules here, and
    agent 'b' alone owns the /x disallow."""
    txt = """User-agent: a
Crawl-delay: 5
User-agent: b
Disallow: /x
"""
    assert parse_robots(txt, "a") == []
    assert parse_robots(txt, "b") == [(False, "/x")]
    # consecutive User-agent lines WITHOUT an intervening directive
    # still share one group
    shared = """User-agent: a
User-agent: b
Disallow: /y
"""
    assert parse_robots(shared, "a") == [(False, "/y")]
    assert parse_robots(shared, "b") == [(False, "/y")]
    # Sitemap between groups must not leak the next group's rules either
    sm = """User-agent: a
Disallow: /a
Sitemap: https://example.com/sitemap.xml
User-agent: b
Disallow: /b
"""
    assert parse_robots(sm, "a") == [(False, "/a")]
    assert parse_robots(sm, "b") == [(False, "/b")]


def test_ua_longest_prefix_match_rfc9309():
    """RFC 9309 §2.2.1 (round 7): product-token matching is
    case-insensitive prefix matching, longest group wins, '*' is the
    fallback only when nothing matches."""
    txt = """User-agent: googlebot
Disallow: /general
User-agent: googlebot-image
Disallow: /images
User-agent: *
Disallow: /everyone
"""
    assert parse_robots(txt, "Googlebot/2.1") == [(False, "/general")]
    assert parse_robots(txt, "Googlebot-Image/1.0") == [(False, "/images")]
    assert parse_robots(txt, "SomeOtherBot") == [(False, "/everyone")]
    # exact names keep working, case-insensitively
    assert parse_robots(txt, "GOOGLEBOT") == [(False, "/general")]
