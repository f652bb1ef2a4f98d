"""Unicode text normalization — the ingest stage CJK/web corpora need
before any tokenizer or dedup hash sees the text:

- **Fullwidth folding**: the Halfwidth and Fullwidth Forms block
  (U+FF01–U+FF5E) is the same ASCII 94-char run typeset at CJK cell
  width; web text mixes them freely (ＡＢＣ１２３ vs ABC123), so
  exact-dedup fingerprints and token counts split unless folded.  The
  ideographic space U+3000 folds to a plain space.  One ``translate``
  call — character-mapped, scan-local, codegen in Spark AND mirrored
  verbatim by DuckDB's ``translate``.
- **Invisible stripping**: zero-width characters (ZWSP/ZWNJ/ZWJ, word
  joiner, BOM), soft hyphens and bidi marks survive copy-paste and
  sabotage both dedup (hash differs, text looks identical) and
  tokenizers (hidden splits).  One character-class ``regexp_replace``.

Both are pure column expressions — the normalization IS the scan — and
both engines agree bit-for-bit, so the composed pass is oracle-checked
(``unicode_normalize_scan``).

NFC/NFKC proper needs full UCD tables (combining classes, decomposition
mappings) — out of scope here; this pass covers the two classes that
dominate real crawl noise and stays exactly mirrorable.

Public knowledge: Unicode Standard Annex #11 (East Asian Width),
chapter on Halfwidth/Fullwidth Forms; UAX #31 (default-ignorables).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: U+FF01..U+FF5E — fullwidth !..~ in code-point order
FULLWIDTH_FORMS = "".join(chr(0xFF01 + i) for i in range(94))
#: the ASCII run they fold to
ASCII_FORMS = "".join(chr(0x21 + i) for i in range(94))
#: ideographic space folds to a plain space
IDEOGRAPHIC_SPACE = "　"

#: default-ignorable noise: ZWSP, ZWNJ, ZWJ, LRM, RLM, word joiner,
#: BOM/ZWNBSP, soft hyphen
INVISIBLES = "​‌‍‎‏⁠﻿­"


def fold_fullwidth(col) -> Column:
    """Fold fullwidth ASCII forms (and the ideographic space) to their
    halfwidth equivalents — one character-mapped ``translate``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(
        c, FULLWIDTH_FORMS + IDEOGRAPHIC_SPACE, ASCII_FORMS + " "
    )


def strip_invisible(col) -> Column:
    """Remove default-ignorable characters (zero-widths, bidi marks,
    BOM, soft hyphen) — one character-class ``regexp_replace``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, f"[{INVISIBLES}]", "")


def normalize_text(col) -> Column:
    """The composed ingest pass: strip invisibles, then fold widths."""
    return fold_fullwidth(strip_invisible(col))
