"""Chinese word segmentation (SURVEY.md §2.9 M1) — the reference's only
genuinely-Python text operator (`convert_doc_to_wordlist`,
`simility_books.py:11-15`: jieba full-mode cut + length>=2 + non-digit
filter).  It is DEAD CODE in the reference (defined in all four pipeline
files, called in none), so the engine's live tokenization is whitespace
split (functions/text.py); this module implements the declared intent as
an optional, gated operator.

jieba is not in this container: the import is attempted ONCE at module
load (each executor interpreter imports this module once when the UDF is
deserialized — no per-batch import/path-scan cost), falling back to a
deterministic script-run splitter: latin/digit runs are kept whole, and
CJK runs emit character BIGRAMS — the standard dictionary-free CJK
tokenization, and the only fallback whose output survives the
reference's len>=2 filter (a single-char-per-CJK-codepoint fallback
would be filtered to nothing for exactly the language this operator
exists to handle).  The UDF signature, Arrow batching, and the token
filter are the tested contract either way.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F, types as T

try:  # once per interpreter, driver and executors alike
    import jieba as _jieba  # type: ignore
except ImportError:  # pragma: no cover - env-dependent
    _jieba = None

#: script runs: CJK covers Extension A (U+3400–) through the URO — Ext-A
#: chars are real in Chinese book metadata and previously vanished from
#: the corpus; latin/digit classes include the fullwidth forms (ＡＢＣ１２３)
#: for the same reason.  The downstream filter's ``str.isdigit()`` is
#: already true for fullwidth digits, matching the reference's filter.
_RUN_RE = re.compile(r"([㐀-鿿]+)|([A-Za-zＡ-Ｚａ-ｚ]+)|([0-9０-９]+)")


def _fallback_cut(text: str) -> list[str]:
    out: list[str] = []
    for m in _RUN_RE.finditer(text or ""):
        cjk, lat, dig = m.groups()
        if cjk:
            if len(cjk) == 1:
                out.append(cjk)  # filtered below, same as jieba's singles
            else:
                out.extend(cjk[i : i + 2] for i in range(len(cjk) - 1))
        else:
            out.append(lat or dig)
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def segment_words(texts):
    """Per-batch segmentation: jieba full-mode if available, script-run
    bigram fallback otherwise.  Applies the reference's filter (len>=2,
    not all-digits) — `simility_books.py:14`."""
    import pandas as pd

    if _jieba is not None:  # pragma: no cover - env-dependent

        def cut(t):
            return list(_jieba.cut(t or "", cut_all=True))

    else:
        cut = _fallback_cut

    def keep(ws):
        return [w for w in ws if len(w) >= 2 and not w.isdigit()]

    return pd.Series([keep(cut(t)) for t in texts])


def segmented_tokens(text: Column) -> Column:
    """M1 as a Column: array<string> of filtered segments."""
    return segment_words(text)
