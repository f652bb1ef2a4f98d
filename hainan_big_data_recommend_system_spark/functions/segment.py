"""Chinese word segmentation (SURVEY.md §2.9 M1) — the reference's only
genuinely-Python text operator (`convert_doc_to_wordlist`,
`simility_books.py:11-15`: jieba full-mode cut + length>=2 + non-digit
filter).  It is DEAD CODE in the reference (defined in all four pipeline
files, called in none), so the engine's live tokenization is whitespace
split (functions/text.py); this module implements the declared intent as
an optional, gated operator.

jieba is not in this container: the Pandas UDF tries to import it per
executor and falls back to a deterministic unicode-script splitter (CJK
runs become single-char tokens — jieba full-mode's degenerate behavior
without a dictionary; latin/digit runs split on boundaries).  The UDF
signature, Arrow batching, and the reference's token filter are the
tested contract either way.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F, types as T

_SCRIPT_RE = re.compile(
    r"[一-鿿]|[A-Za-z]+|[0-9]+", re.UNICODE
)


def _fallback_cut(text: str) -> list[str]:
    return _SCRIPT_RE.findall(text or "")


@F.pandas_udf(T.ArrayType(T.StringType()))
def segment_words(texts):
    """Per-batch segmentation: jieba if available, unicode-script fallback
    otherwise.  Applies the reference's filter (len>=2, not all-digits) —
    `simility_books.py:14`."""
    import pandas as pd

    try:
        import jieba  # type: ignore

        def cut(t):
            return [w for w in jieba.cut(t or "", cut_all=True)]
    except ImportError:
        cut = _fallback_cut

    def keep(ws):
        return [w for w in ws if len(w) >= 2 and not w.isdigit()]

    return pd.Series([keep(cut(t)) for t in texts])


def segmented_tokens(text: Column) -> Column:
    """M1 as a Column: array<string> of filtered segments."""
    return segment_words(text)
