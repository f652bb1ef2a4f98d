"""Tokenize → stop-words → CountVectorizer pipeline (SURVEY.md §2.9 M2§/M5§).

Reference semantics: ``CountVectorizer(min_df=10, stop_words=...)`` over user
profile documents (`guessLike_u_like.py:72-75`; the `log_analyze.py:126`
variant omits stop-words — so stop-words are a parameter here, SURVEY §7.4.4).
Tokenization is whitespace split, matching the reference's live behavior
(jieba segmentation is dead code there, SURVEY §2.9 M1).

Scale: CountVectorizer's vocabulary fit is a distributed ``flatMap → count →
top-vocabSize``; the transform is a broadcast-dictionary map — both scale
linearly.  ``vocabSize`` bounds driver memory for the vocabulary at 100 TB.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import CountVectorizer, RegexTokenizer, StopWordsRemover
from pyspark.sql import DataFrame

#: bundled stop-word asset (S8 — the reference reads its list from a local
#: file next to the job, `guessLike_u_like.py:72-73`)
STOP_WORDS_PATH = Path(__file__).resolve().parent.parent / "assets" / "stop_words.txt"


def load_stop_words(path: str | Path | None = None) -> list[str]:
    """S8: driver-side scan of the stop-word list (one token per line,
    ``#`` comments and blanks ignored).  The list rides to executors inside
    the broadcast ``StopWordsRemover`` params — never a per-row file read.
    """
    p = Path(path) if path is not None else STOP_WORDS_PATH
    words = []
    for line in p.read_text(encoding="utf-8").splitlines():
        w = line.strip()
        if w and not w.startswith("#"):
            words.append(w)
    return words


def vectorize_pipeline(
    text_col: str = "text",
    features_col: str = "features",
    min_df: float = 10.0,
    stop_words: list[str] | None = None,
    vocab_size: int = 1 << 18,
) -> Pipeline:
    """Build the tokenize → (stop-words) → count-vectorize pipeline."""
    stages = [
        RegexTokenizer(
            inputCol=text_col,
            outputCol="__tokens",
            pattern=r"[ \t\n\x0B\f\r]+",
            minTokenLength=1,
            toLowercase=True,
        )
    ]
    token_col = "__tokens"
    if stop_words is not None:
        stages.append(
            StopWordsRemover(
                inputCol=token_col, outputCol="__tokens_f", stopWords=stop_words
            )
        )
        token_col = "__tokens_f"
    stages.append(
        CountVectorizer(
            inputCol=token_col,
            outputCol=features_col,
            minDF=min_df,
            vocabSize=vocab_size,
        )
    )
    return Pipeline(stages=stages)


def fit_vectorizer(
    df: DataFrame,
    text_col: str = "text",
    features_col: str = "features",
    min_df: float = 10.0,
    stop_words: list[str] | None = None,
) -> PipelineModel:
    return vectorize_pipeline(text_col, features_col, min_df, stop_words).fit(df)
