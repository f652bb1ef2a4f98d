"""Text scalar functions (SURVEY.md §2.8 F1–F10, F15–F16, §2.2 P5).

The reference's document prep (`simility_books.py:11-28,50-53`) and title
normalization (`simility_books.py:74-88`) re-expressed as Column expressions.
Everything stays JVM-side / whole-stage-codegen — the reference's only
genuinely-Python text op (jieba segmentation) is dead code there
(`convert_doc_to_wordlist` defined in all 4 files, called in none) and is
modeled by :func:`tokenize` on whitespace, matching live behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: characters the reference strips from titles after the cut, `simility_books.py:81-82`
_PUNCT_CLASS = r"[.\u00b7\u30fb\u300a\u300b\-]"
#: title is cut at the first of these, `simility_books.py:74`
_CUT_CLASS = r"[\uff08\uff09\u3010\u3011/()0-9\uff0c\u7b2c:\u7cbe].*$"


def clean_author(author: Column) -> Column:
    """F1–F3+F5: lowercase, drop spaces, comma-split, re-join with spaces
    (`simility_books.py:20` — multi-author "a, b" → "a b")."""
    return F.concat_ws(" ", F.split(F.translate(F.lower(author), " ", ""), ","))


def doc_assemble(tags_doc: Column, author: Column) -> Column:
    """F6: document = tags ⊕ ' ' ⊕ author ⊕ ' ' ⊕ author — the author is
    doubled deliberately to up-weight it (`simility_books.py:51`).

    ``concat_ws``, not ``concat``: plain concat null-propagates, so one
    NULL author would nullify the whole document and silently drop a book
    with perfectly good tags from the similarity corpus."""
    return F.concat_ws(" ", tags_doc, author, author)


def squash_spaces(s: Column) -> Column:
    """F7: trim + collapse repeated spaces (`guessLike_u_like.py:67`)."""
    return F.trim(F.regexp_replace(s, " +", " "))


def tokenize(doc: Column) -> Column:
    """F4: whitespace tokenization (`simility_books.py:53`,
    `guessLike_u_like.py:87`).

    Deliberately the engine-wide explicit ASCII whitespace class (NOT
    unicode ``\\s``): Java and RE2 disagree on ``\\s`` membership, and
    cross-engine oracle exactness wins over Python ``str.split()``'s
    unicode-whitespace behavior.  Sources with ideographic spaces
    (U+3000) should normalize them upstream."""
    return F.split(F.trim(doc), r"[ \t\n\x0B\f\r]+")


def token_filter(tokens: Column) -> Column:
    """P5: keep tokens with length ≥ 2 that are not all digits
    (`simility_books.py:14` — declared intent; dead code in the reference)."""
    return F.filter(
        tokens, lambda t: (F.length(t) >= 2) & (~t.rlike(r"^[0-9]+$"))
    )


def normalize_title(title: Column) -> Column:
    """F8: the reference's two-stage title normalization for fuzzy dedup
    (`simility_books.py:74-88`): lowercase, cut everything from the first
    bracket/digit/series marker, then strip residual punctuation."""
    t = F.lower(title)
    t = F.regexp_replace(t, _CUT_CLASS, "")
    t = F.regexp_replace(t, _PUNCT_CLASS, "")
    return F.trim(t)


def ids_csv(ids: Column) -> Column:
    """F5/F19-adjacent: serialize an array of ids to the reference's CSV wire
    format (`simility_books.py:93`) — sink-boundary only; plans keep arrays."""
    return F.concat_ws(",", F.transform(ids, lambda x: x.cast("string")))


def csv_ids(csv: Column) -> Column:
    """F12: parse a CSV int-list string back to ``array<bigint>`` — replaces
    the reference's ``eval`` round-trip (`guessLike_u_like.py:47`; ``eval`` of
    untrusted data is a code-exec hazard, deliberately not reproduced).

    An empty/blank string round-trips to an EMPTY array (``split('')``
    alone would yield ``[NULL]`` and break size/membership checks);
    non-numeric tokens cast to NULL elements — visible, not invented."""
    return F.when(F.length(F.trim(csv)) == 0, F.array().cast("array<bigint>")).otherwise(
        F.transform(F.split(csv, ","), lambda x: x.cast("bigint"))
    )
