"""robots.txt compliance filter (RFC 9309) — the crawl-side legality
gate a corpus pipeline applies before (or while auditing) ingestion.

``parse_robots`` extracts the rule group for a user agent (specific
group wins over ``*``; multiple consecutive ``User-agent`` lines share
one group), and ``allowed_column`` compiles those rules into a PURE
column expression: rules sort by pattern length (the RFC's
longest-match precedence, allow winning ties), each becomes one
``rlike`` against an anchored regex translation of the robots wildcard
syntax (``*`` → ``.*``, trailing ``$`` → end anchor), and the first
match decides.  The rule set is tiny and driver-side; the URL column
never leaves the scan — no UDF, no join, whole-stage codegen.

Public knowledge: RFC 9309 (Robots Exclusion Protocol).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F


def parse_robots(txt: str, agent: str = "*") -> list[tuple[bool, str]]:
    """``[(allow, path_pattern), ...]`` for ``agent``.

    Group selection follows RFC 9309 §2.2.1 (round 7): the crawler's
    product token matches a group case-insensitively when the group's
    user-agent value is a PREFIX of the token ('googlebot' matches
    'Googlebot/2.1' and 'Googlebot-Image'), the LONGEST matching value
    wins, and ``*`` is the fallback.  Unknown directives are ignored as
    rules but end a group's user-agent collection phase; empty patterns
    are dropped (an empty Disallow means allow-all and matches
    nothing)."""
    groups: dict[str, list[tuple[bool, str]]] = {}
    current: list[str] = []
    collecting = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, value = (p.strip() for p in line.split(":", 1))
        key = key.lower()
        if key == "user-agent":
            if collecting:
                current = []  # a new agent list begins
                collecting = False
            current.append(value.lower())
            for a in current:
                groups.setdefault(a, groups.get(a, []))
        elif key in ("allow", "disallow"):
            collecting = True
            if not value:
                continue
            for a in current:
                groups.setdefault(a, []).append((key == "allow", value))
        else:
            # ANY other directive (Crawl-delay, Sitemap, …) ends the
            # group's user-agent collection phase (ADVICE r6: flipping
            # only on allow/disallow merged 'User-agent: a /
            # Crawl-delay: 5 / User-agent: b / Disallow: /x' into one
            # group, wrongly giving agent a the /x rule)
            collecting = True
    want = agent.lower()
    best = None
    for name in groups:
        if name != "*" and want.startswith(name):
            if best is None or len(name) > len(best):
                best = name
    if best is not None:
        return groups[best]
    return groups.get("*", [])


def _pattern_regex(pattern: str) -> str:
    """Robots wildcard pattern → anchored Java/RE2-safe regex."""
    anchored_end = pattern.endswith("$")
    core = pattern[:-1] if anchored_end else pattern
    out = "^"
    for ch in core:
        out += ".*" if ch == "*" else re.escape(ch)
    return out + ("$" if anchored_end else "")


def allowed_column(rules: list[tuple[bool, str]], path_col) -> Column:
    """Boolean column: is ``path_col`` allowed under ``rules``?  Rules
    apply longest-pattern-first (allow before disallow on equal length —
    the RFC tie-break); no matching rule means allowed."""
    p = F.col(path_col) if isinstance(path_col, str) else path_col
    ordered = sorted(
        rules, key=lambda r: (len(r[1]), r[0]), reverse=True
    )
    expr = F.lit(True)  # default: allowed
    for allow, pattern in reversed(ordered):
        # build the WHEN-chain inside-out so the longest pattern ends up
        # outermost (checked first)
        expr = F.when(p.rlike(_pattern_regex(pattern)), F.lit(allow)).otherwise(
            expr
        )
    return expr
