"""Markdown → prose normalization — the README/docs half of a code-and-
docs training corpus arrives as markdown, and the text pipeline wants
the PROSE: code fences dropped, link targets gone but anchor text kept,
emphasis/headers/list markers stripped.

One ``regexp_replace`` chain over the scan (no UDF, no shuffle), each
rule a single regex in the Spark/RE2 common dialect so the DuckDB
oracle can mirror it:

1. fenced code blocks dropped whole (``[\\s\\S]*?`` non-greedy);
2. images → alt text, links → anchor text;
3. bold/italic markers unwrapped (double before single);
4. inline code unwrapped;
5. line-anchored ((?m)) headers, blockquotes, list markers and
   horizontal rules stripped;
6. whitespace collapsed and trimmed.

Public knowledge: CommonMark spec (the subset above).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: (pattern, replacement) applied in order; $1 refs become \\1 in DuckDB
MD_RULES: list[tuple[str, str]] = [
    (r"```[\s\S]*?```", " "),              # fenced code blocks
    (r"!\[([^\]]*)\]\([^)]*\)", "$1"),     # images -> alt
    (r"\[([^\]]*)\]\([^)]*\)", "$1"),      # links -> text
    (r"\*\*([^*]+)\*\*", "$1"),            # bold
    (r"__([^_]+)__", "$1"),
    (r"\*([^*]+)\*", "$1"),                # italics
    (r"`([^`]+)`", "$1"),                  # inline code
    (r"(?m)^#{1,6}[ \t]*", ""),            # headers
    (r"(?m)^>[ \t]?", ""),                 # blockquotes
    (r"(?m)^[ \t]*[-*+][ \t]+", ""),       # bullet markers
    (r"(?m)^[ \t]*\d+\.[ \t]+", ""),       # ordered-list markers
    (r"(?m)^[ \t]*---+[ \t]*$", " "),      # horizontal rules
]


def markdown_to_text(col) -> Column:
    """Prose content of a markdown column: the rule chain above, then
    whitespace collapse + trim."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in MD_RULES:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(F.regexp_replace(c, r"[ \t\n\x0B\f\r]+", " "))
