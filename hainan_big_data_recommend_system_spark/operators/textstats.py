"""Text-analysis operators for training-data pipelines (north-star surface):
language-ID, quality scoring, token counting, document fingerprinting.

All codegen'd column expressions over the ``documents`` table — the shapes a
100 TB corpus pipeline runs before dedup/filtering.  Each is deterministic
and oracle-checkable (regex classes kept to engine-portable syntax; ratios
built from integer counts then divided once).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from ..session import CHECKPOINT_LEVEL

#: tiny per-language function-word lexicons for the n-gram/lexicon heuristic
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "with"),
    "de": ("der", "die", "das", "und", "ist", "mit", "von", "ein"),
    "fr": ("le", "la", "les", "et", "est", "avec", "des", "une"),
    "es": ("el", "la", "los", "de", "y", "es", "con", "una"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "他"),
}

#: BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"


def _count_matches(text: Column, char_class: str) -> Column:
    """Count characters matching ``char_class`` (portable: length delta)."""
    return F.length(text) - F.length(F.regexp_replace(text, char_class, ""))


def _quality_cols(t: Column) -> list[Column]:
    """The quality-feature expressions, shared by :func:`text_quality_stats`
    and the single-pass :func:`text_profile`."""
    toks = F.split(F.trim(t), r"[ \t\n\x0B\f\r]+")
    n_chars = F.length(t).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    n_punct = _count_matches(t, r"[^A-Za-z0-9 \t\n\x0B\f\r]").cast("bigint")
    n_digit = _count_matches(t, r"[0-9]").cast("bigint")
    n_space = _count_matches(t, r"[ \t\n\x0B\f\r]").cast("bigint")
    ratio = lambda num: F.round(num * 1000000 / F.greatest(n_chars, F.lit(1))).cast(
        "bigint"
    )
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(
            n_chars * 1000000 / F.greatest(n_tokens, F.lit(1))
        ).cast("bigint").alias("chars_per_token_micros"),
        ratio(n_punct).alias("punct_ratio_micros"),
        ratio(n_digit).alias("digit_ratio_micros"),
        ratio(n_space).alias("space_ratio_micros"),
    ]


def text_quality_stats(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Quality-scoring features: lengths, token counts, punct/digit/space
    ratios (micro-scaled ints for exact cross-engine compare)."""
    return docs.select(
        F.col(id_col).alias("doc_id"), *_quality_cols(F.col(text_col))
    )


def token_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish subword
    pre-tokens (letter/digit runs + punctuation singles)."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"[ \t\n\x0B\f\r]+"))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_SPLIT_PATTERN), 0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("bigint").alias("n_ws_tokens"),
        bpe.cast("bigint").alias("n_bpe_tokens"),
    )


def lang_id(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Lexicon-overlap language ID: score each language by function-word
    hits (tf-weighted), argmax with deterministic tie order (score desc,
    lang asc); no hits → 'und'."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"[ \t\n\x0B\f\r]+")).alias("token"),
    )
    scores = []
    for lang, words in sorted(LANG_LEXICONS.items()):
        scores.append(
            F.sum(
                F.when(F.col("token").isin(*words), 1).otherwise(0)
            ).alias(f"score_{lang}")
        )
    agg = toks.groupBy("doc_id").agg(*scores)
    # melt to (doc_id, lang, score), then deterministic argmax via window
    melted = agg.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lang).alias("lang"),
                        F.col(f"score_{lang}").alias("score"),
                    )
                    for lang in sorted(LANG_LEXICONS)
                ]
            )
        ).alias("ls"),
    ).select("doc_id", F.col("ls.lang").alias("lang"), F.col("ls.score").alias("score"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    best = (
        melted.filter(F.col("score") > 0)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("lang_pred"))
    )
    all_docs = docs.select(F.col(id_col).alias("doc_id"))
    return all_docs.join(best, "doc_id", "left").select(
        "doc_id", F.coalesce("lang_pred", F.lit("und")).alias("lang_pred")
    )


def corpus_clean_flags(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 5,
    max_tokens: int = 2000,
    max_punct_ratio_micros: int = 300_000,
    max_digit_ratio_micros: int = 300_000,
) -> DataFrame:
    """Composite corpus-cleaning pipeline — the canonical pre-training
    filter chain: length gates → punctuation/digit-ratio gates → exact-dup
    survivor selection (min id per content hash wins).

    Emits every doc with ``keep`` plus the FIRST failing ``reason``
    (``too_short | too_long | high_punct | high_digit | dup | kept``) so
    the drop distribution is auditable — at 100 TB you chart reasons per
    source before believing the surviving corpus.  One pass: the quality
    gates are column expressions on the scan; the dup check is one window
    over the content hash (shuffle ∝ corpus, no joins).
    """
    from pyspark.sql import Window

    t = F.col(text_col)
    n_chars = F.length(t).cast("bigint")
    n_tokens = F.size(F.split(F.trim(t), r"[ \t\n\x0B\f\r]+")).cast("bigint")
    ratio = lambda num: F.round(
        num * 1_000_000 / F.greatest(n_chars, F.lit(1))
    ).cast("bigint")
    punct = ratio(_count_matches(t, r"[^A-Za-z0-9 \t\n\x0B\f\r]").cast("bigint"))
    digit = ratio(_count_matches(t, r"[0-9]").cast("bigint"))

    w = Window.partitionBy("__fp").orderBy(F.asc("doc_id"))
    flagged = docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("__nt"),
        punct.alias("__punct"),
        digit.alias("__digit"),
        F.md5(t.cast("binary")).alias("__fp"),
    ).withColumn("__dup_rank", F.row_number().over(w))

    reason = (
        F.when(F.col("__nt") < min_tokens, "too_short")
        .when(F.col("__nt") > max_tokens, "too_long")
        .when(F.col("__punct") > max_punct_ratio_micros, "high_punct")
        .when(F.col("__digit") > max_digit_ratio_micros, "high_digit")
        .when(F.col("__dup_rank") > 1, "dup")
        .otherwise("kept")
    )
    return flagged.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "kept").alias("keep"),
    )


def repetition_stats(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Repetition-based quality features (the Gopher-rule family): per doc,
    for word 2-grams and 3-grams,

    - ``top{n}gram_micros`` — occurrences of the single most frequent
      n-gram / total n-gram occurrences (boilerplate detector);
    - ``dup{n}gram_micros`` — fraction of n-gram occurrences that are
      repeats, ``(total − distinct) / total`` (loop/stutter detector).

    Micro-scaled integer ratios → exact cross-engine.  One explode +
    groupBy per n (shuffle ∝ n-gram occurrences, linear in corpus size);
    docs too short for an n-gram get 0s via the left join.
    """
    from .dedup import shingles

    def per_n(n: int, prefix: str) -> DataFrame:
        sh = shingles(docs, id_col, text_col, n=n, distinct=False)
        cnt = sh.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("c"))
        agg = cnt.groupBy("doc_id").agg(
            F.sum("c").alias("total"),
            F.max("c").alias("top"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        ratio = lambda num: F.round(num * 1_000_000 / F.col("total")).cast("bigint")
        return agg.select(
            "doc_id",
            ratio(F.col("top")).alias(f"top{prefix}_micros"),
            ratio(F.col("total") - F.col("n_distinct")).alias(
                f"dup{prefix}_micros"
            ),
        )

    base = docs.select(F.col(id_col).alias("doc_id"))
    out = base.join(per_n(2, "2gram"), "doc_id", "left").join(
        per_n(3, "3gram"), "doc_id", "left"
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).alias(c)
    return out.select(
        "doc_id",
        z("top2gram_micros"),
        z("dup2gram_micros"),
        z("top3gram_micros"),
        z("dup3gram_micros"),
    )


#: PII-ish surface patterns (corpus-scrub triage; engine-portable regex)
PII_PATTERNS: dict[str, str] = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
    "urls": r"https?://[^ \t\n]+",
    "phones": r"[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]",
}


def pii_pattern_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc counts of PII-shaped matches (emails / URLs / phone-like) —
    the triage stage before a corpus scrub decides redact-vs-drop.  Pure
    ``regexp_extract_all`` counting on the scan; patterns avoid
    bounded-repeat syntax so the same text works in Java and RE2."""
    t = F.col(text_col)
    cols = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("bigint").alias(
            f"n_{name}"
        )
        for name, pat in PII_PATTERNS.items()
    ]
    return docs.select(F.col(id_col).alias("doc_id"), *cols)


ROLLING_BASE = 31
ROLLING_PRIME = (1 << 31) - 1


def doc_fingerprints(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprinting three ways:

    - ``content_fp`` — full-content md5 over normalized text (lowercase,
      squashed whitespace): the exact-dup key;
    - ``prefix_fp`` — md5 of the first 8 tokens: cheap clustering key for
      near-dup triage;
    - ``rolling_fp`` — polynomial rolling hash over the token stream,
      ``h = (h·31 + H(tok)) mod 2³¹−1`` with ``H`` = first 28 bits of
      md5(tok), folded left-to-right (order-sensitive, integer-exact,
      incrementally updatable — the streaming-append fingerprint).
    """
    return docs.select(
        F.col(id_col).alias("doc_id"), *_fingerprint_cols(F.col(text_col))
    )


def _fingerprint_cols(t: Column) -> list[Column]:
    """The three fingerprint expressions (see :func:`doc_fingerprints`),
    shared with the single-pass :func:`text_profile`."""
    norm = F.trim(F.regexp_replace(F.lower(t), r"[ \t\n\x0B\f\r]+", " "))
    toks = F.split(norm, " ")
    prefix = F.concat_ws(" ", F.slice(toks, 1, 8))
    tok_hashes = F.transform(
        toks,
        lambda tok: F.conv(F.substring(F.md5(tok.cast("binary")), 1, 7), 16, 10).cast(
            "long"
        ),
    )
    rolling = F.aggregate(
        F.slice(tok_hashes, 2, F.greatest(F.size(tok_hashes) - 1, F.lit(0))),
        F.element_at(tok_hashes, 1),
        lambda acc, h: (acc * ROLLING_BASE + h) % ROLLING_PRIME,
    )
    return [
        F.md5(norm.cast("binary")).alias("content_fp"),
        F.md5(prefix.cast("binary")).alias("prefix_fp"),
        rolling.alias("rolling_fp"),
    ]


def text_profile(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The full per-document text-analysis profile in ONE pass: quality
    features + BPE-ish subword count + all three fingerprints as a single
    projection on the scan, plus the language prediction via one
    (doc_id)-keyed join against the lexicon argmax.

    This is the production shape at 100 TB — the per-facet operators
    (:func:`text_quality_stats` etc.) stay available for composition, but a
    corpus pipeline computes every per-row feature in one scan instead of
    re-reading the corpus per facet; only language ID (an aggregate over
    exploded tokens) needs its own shuffle.
    """
    t = F.col(text_col)
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_SPLIT_PATTERN), 0)).cast("bigint")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        *_quality_cols(t),
        bpe.alias("n_bpe_tokens"),
        *_fingerprint_cols(t),
    )
    lang = lang_id(docs, id_col, text_col)
    return base.join(lang, "doc_id")


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a fixed term set —
    (doc_id, score_micros, n_terms).

    Classic Robertson/Sparck-Jones BM25 (idf with +0.5 smoothing, tf
    saturation k1, length normalization b).  Per-(doc, term) scores are
    integerized to micros BEFORE the per-doc sum, so the result is exact
    under any aggregation order — the same cross-engine determinism
    discipline as tfidf_weights.  All heavy steps are one-shuffle
    aggregates on (doc, token); the corpus stats (N, avgdl) are a
    broadcast scalar, and the query-term tf table is tiny because the
    IN-filter prunes before the groupBy.
    """
    t = F.col(text_col)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(t), r"[ \t\n\x0B\f\r]+")).alias("tok"),
    ).filter(F.col("tok") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy("doc_id", F.col("tok").alias("token"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    joined = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfc), "token")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    score = (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    term_micros = F.round(score * 1_000_000).cast("bigint")
    return (
        joined.select("doc_id", term_micros.alias("__m"))
        .groupBy("doc_id")
        .agg(
            F.sum("__m").cast("bigint").alias("score_micros"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )


def unigram_lm_scores(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-trained unigram-LM log-likelihood per doc — the
    perplexity-proxy quality signal of CCNet-style filtering (Wenzek et
    al. 2020 train a wiki LM and drop high-perplexity docs; the unigram
    self-trained variant flags gibberish/outlier token distributions with
    no external model).

    Add-one smoothing: p(tok) = (c+1)/(N+V).  Per-token log-probs are
    integerized to micros per ROW (identical double ops in both engines),
    so the per-doc sums are exact integer arithmetic — hash-stable
    cross-engine; the mean uses one double division of exact integers.

    Scale shape: the count build shuffles token occurrences once with
    map-side combine (linear in corpus tokens — the floor for any LM
    fit); the scoring join's build side is the VOCABULARY (≪ corpus, Zipf
    guarantees it), which AQE broadcasts at deployment scale, and the
    (N, V) totals are a 1-row broadcast.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+")).alias("tok"),
    ).filter(F.col("tok") != "")  # empty docs must not mint a "" vocab entry
    # materialize the vocab once: it feeds the (N,V) totals AND the
    # scoring join — lazily the token-occurrence shuffle would run twice
    # (the double-consumption pattern, see PLANS.md)
    counts = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    )
    tot = counts.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    lp = F.round(
        F.log((F.col("c") + 1) / (F.col("n") + F.col("v"))) * 1_000_000
    ).cast("bigint")
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", lp.alias("lp_micros"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("lp_micros").cast("bigint").alias("sum_lp_micros"),
        F.round(F.sum("lp_micros") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("avg_lp_micros"),
    )


def bigram_lm_scores(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-trained bigram-LM log-likelihood per doc — the
    context-sensitive step up from :func:`unigram_lm_scores`: a doc of
    frequent words in improbable ORDER (shuffled text, keyword stuffing,
    template soup) scores high-perplexity here while the unigram model
    cannot see it.  Together they bracket the CCNet-style perplexity
    filter with no external model.

    Add-one smoothing over observed bigrams: p(w₂|w₁) = (c₂+1)/(c₁+V).
    Per-bigram log-probs are integerized to micros per ROW, so per-doc
    sums are exact integers — hash-stable cross-engine.  Docs with fewer
    than two tokens have no bigrams and no row (same contract as the
    oracle).

    Scale shape: one bigram shuffle with map-side combine (linear in
    corpus tokens), scoring joins whose build sides are the bigram/
    unigram vocabularies (≪ corpus), a 1-row V broadcast."""
    arr = F.filter(
        F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+"),
        lambda w: w != "",
    )
    big = _doc_bigrams(docs, id_col, text_col)
    uni = docs.select(F.explode(arr).alias("w"))
    # both count tables feed the totals AND the scoring joins — eager
    # checkpoints keep each corpus shuffle at one execution
    c1 = (
        uni.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
        .localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    )
    c2 = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    )
    v = c1.agg(F.count(F.lit(1)).alias("v"))
    lp = F.round(
        F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v"))) * 1_000_000
    ).cast("bigint")
    scored = (
        big.join(c2, ["w1", "w2"])
        .join(c1.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(v))
        .select("doc_id", lp.alias("lp_micros"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("lp_micros").cast("bigint").alias("sum_lp_micros"),
        F.round(F.sum("lp_micros") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("avg_lp_micros"),
    )


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(doc_id, w1, w2)`` adjacent-token pairs — the shared extraction
    of the bigram-LM family (including the empty-doc slice guard:
    slice() rejects negative lengths, so size-0 docs must yield zero
    pairs, not a runtime error)."""
    arr = F.filter(
        F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+"),
        lambda w: w != "",
    )
    npairs = F.greatest(F.size(arr) - 1, F.lit(0))
    z = F.arrays_zip(
        F.slice(arr, 1, npairs).alias("w1"),
        F.slice(arr, 2, npairs).alias("w2"),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(z).alias("z")
    ).select("doc_id", F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))


def kn_bigram_lm_scores(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Interpolated Kneser-Ney bigram log-likelihood per doc — the
    canonical n-gram smoothing (Kneser & Ney 1995; Chen & Goodman 1999)
    completing the LM-quality family next to the add-one unigram/bigram
    facets:

        p(w₂|w₁) = max(c₂ − d, 0)/c₁ + (d·N₁₊(w₁,·)/c₁) · P_cont(w₂)
        P_cont(w₂) = N₁₊(·,w₂) / |bigram types|,  d = 0.75

    Determinism discipline: every input is an integer count, d = 0.75 is
    exactly representable, and the per-bigram expression is evaluated in
    ONE pinned op order (each division/multiply/add a single correctly-
    rounded IEEE op both engines perform identically), then ln →
    micro-integerized per row — so even the smoothed model hash-matches
    the oracle.  Scored bigrams are by construction observed (the model
    is self-trained), so the discounted term is never zero and ln never
    sees −inf.

    Scale shape: one bigram shuffle with map-side combine; every model
    table (continuation counts, following-type counts, the 1-row type
    total) is vocabulary-sized."""
    big = _doc_bigrams(docs, id_col, text_col)
    c2 = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)  # feeds every model table + scoring
    )
    c1 = c2.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    ncont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("ncont"))
    ntypes = c2.agg(F.count(F.lit(1)).alias("ntypes"))
    # ONE pinned op order, mirrored exactly in the oracle SQL
    p = (
        F.greatest(F.col("c2") - 0.75, F.lit(0.0)) / F.col("c1")
        + (0.75 * F.col("n1f") / F.col("c1"))
        * (F.col("ncont") / F.col("ntypes"))
    )
    lp = F.round(F.log(p) * 1_000_000).cast("bigint")
    scored = (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .join(ncont, "w2")
        .crossJoin(F.broadcast(ntypes))
        .select("doc_id", lp.alias("lp_micros"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("lp_micros").cast("bigint").alias("sum_lp_micros"),
        F.round(F.sum("lp_micros") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("avg_lp_micros"),
    )


def dsir_importance_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_filter,
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every doc by the
    log importance ratio between a TARGET distribution (the domain you
    want more of — ``target_filter`` marks its rows) and the RAW corpus
    distribution, both estimated as add-one-smoothed multinomials over
    HASHED bigram features.

    The hashing is the scale story and the reason this is exact: both
    models live in ``n_buckets`` integers (md5-bucketed bigrams — the
    engine-portable hash used throughout the catalog), so the entire
    "model" is a ≤``n_buckets``-row broadcast and scoring is one
    map-side join over the doc bigrams.  Per-bucket log-probs are
    micro-integerized per ROW (each ln is one exactly-rounded double op
    in both engines), so doc sums are exact integers — hash-stable.

    Output: ``(doc_id, n_bigrams, sum_ratio_micros, avg_ratio_micros,
    selected)`` with ``selected = 1`` iff the summed log-ratio is
    positive (the doc is more probable under the target model) — the
    deterministic analogue of DSIR's importance resampling.  Docs with
    fewer than two tokens have no features and no row."""
    arr = F.filter(
        F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+"),
        lambda w: w != "",
    )
    npairs = F.greatest(F.size(arr) - 1, F.lit(0))
    z = F.arrays_zip(
        F.slice(arr, 1, npairs).alias("w1"),
        F.slice(arr, 2, npairs).alias("w2"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(" ", F.col("z.w1"), F.col("z.w2"))), 1, 7
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    feats = docs.select(
        F.col(id_col).alias("doc_id"),
        # NULL-evaluating filters (e.g. lang == 'en' with NULL lang) must
        # count as off-target, not NULL-poison the bucket's target sum
        F.coalesce(target_filter.cast("int"), F.lit(0)).alias("__t"),
        F.explode(z).alias("z"),
    ).select("doc_id", "__t", bucket.alias("b"))
    # the whole model: <= n_buckets rows of (target count, raw count).
    # Raw = the FULL corpus (target included), per the paper.
    model = (
        feats.groupBy("b")
        .agg(
            F.sum("__t").alias("ct"),
            F.count(F.lit(1)).alias("cr"),
        )
        .localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)  # feeds totals AND the scoring join
    )
    tot = model.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    lp_t = F.round(
        F.log((F.col("ct") + 1) / (F.col("nt") + n_buckets)) * 1_000_000
    ).cast("bigint")
    lp_r = F.round(
        F.log((F.col("cr") + 1) / (F.col("nr") + n_buckets)) * 1_000_000
    ).cast("bigint")
    scored = (
        feats.join(F.broadcast(model), "b")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", (lp_t - lp_r).alias("ratio_micros"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("ratio_micros").cast("bigint").alias("sum_ratio_micros"),
        F.round(F.sum("ratio_micros") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("avg_ratio_micros"),
    )
    return agg.select(
        "*",
        F.when(F.col("sum_ratio_micros") > 0, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("selected"),
    )


def pii_redact(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII redaction — the scrub stage after :func:`pii_pattern_counts`
    triage: every email/URL/phone-shaped span is replaced by a typed
    placeholder token (``<EMAIL>``/``<URL>``/``<PHONE>``), preserving the
    surrounding text for training.  Chained ``regexp_replace`` on the
    scan — order matters and is fixed (emails before URLs: an address
    inside a mailto URL must not be half-rewritten; phones last)."""
    t = F.col(text_col)
    redacted = F.regexp_replace(t, PII_PATTERNS["emails"], "<EMAIL>")
    redacted = F.regexp_replace(redacted, PII_PATTERNS["urls"], "<URL>")
    redacted = F.regexp_replace(redacted, PII_PATTERNS["phones"], "<PHONE>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        redacted.alias("redacted_text"),
        (F.length(t) - F.length(redacted)).cast("bigint").alias("chars_removed"),
    )


def leakage_safe_splits(
    docs: DataFrame,
    id_col: str,
    dup_pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    salt: str = "splitgv1",
    train_pct: int = 90,
    val_pct: int = 5,
    components: str = "star",
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    the split boundary: hash the duplicate-CLUSTER id, not the doc id.

    Per-doc salted-hash splits (:func:`split_assignment`) scatter the
    members of a near-dup cluster independently, so a test document's
    near-twin lands in train ~90% of the time — the benchmark-inflation
    failure mode dedup pipelines exist to prevent (the reason GPT-3/C4
    style corpora deduplicate against eval sets).  Here every doc's split
    group is the minimum reachable member of its component in the
    candidate-pair graph (``connected_components``), falling back to its
    own id for singleton docs, and the bucket hash is taken over that
    group id — whole clusters move together by construction.

    Cost at 100 TB: components over the CANDIDATE pairs only (edge count
    ∝ near-dup density, not n²), one left equi-join of the component
    labels onto the corpus keyed on the doc id (AQE broadcasts it when
    dup density is low; at web-crawl dup rates it is a plain hash join
    on the id — never wider than one long per labeled doc), then the
    same scan-local md5 bucket as ``split_assignment``.

    ``components`` picks the closure algorithm (round 6, VERDICT r5 #8):
    the default ``"star"`` is alternating large-star/small-star (Kiveris
    et al. SoCC'14, O(log² n) rounds regardless of diameter) — the right
    shape for the SPLIT graph, whose low threshold admits stringy
    chain-of-near-twins components that round-bind plain min-label
    propagation as dup density grows; ``"minlabel"`` keeps the
    diameter-bound propagation (fine for near-clique prune graphs).
    Both converge to identical min-label components, so the choice is
    invisible to results and oracles."""
    from .components import connected_components, connected_components_star

    cc_fn = (
        connected_components_star
        if components == "star"
        else connected_components
    )
    cc = cc_fn(dup_pairs, a_col, b_col)
    labeled = docs.select(F.col(id_col).alias("doc_id")).join(
        cc.select(F.col("node").alias("doc_id"), "component"),
        "doc_id",
        "left",
    )
    group = F.coalesce(F.col("component"), F.col("doc_id"))
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(group.cast("string"), F.lit(salt))), 1, 7),
            16,
            10,
        ).cast("long")
        % 100
    )
    return labeled.select(
        "doc_id",
        group.cast("bigint").alias("split_group"),
        bucket.cast("bigint").alias("split_bucket"),
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
    )


def c4_line_filter(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C4-style line + page cleaning (Raffel et al. 2020's public
    heuristics): a line survives only if it ends in terminal punctuation,
    has at least five whitespace words, and does not mention
    ``javascript``; the whole page is dropped when it contains
    ``lorem ipsum`` or a curly brace.  Entirely expression-level — split
    on newline, higher-order ``filter`` with the three line rules,
    ``array_join`` of the survivors — so the stage is scan-local (no
    shuffle, no UDF) and byte-exact cross-engine: every rule is a
    regex/length predicate in the Spark/RE2 common dialect.

    At 100 TB this is the first pass over a web crawl after HTML
    extraction (:func:`..operators.html.extract_main_text`): it must
    stream through the scan, and it does — one projection, whole-stage
    codegen, output rows never wider than input."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    keep = lambda l: (
        l.rlike("[.!?\"'][ \t]*$")
        & (F.size(F.split(F.trim(l), "[ \t]+")) >= 5)
        & ~F.lower(l).contains("javascript")
    )
    kept = F.filter(lines, keep)
    page_drop = F.lower(t).contains("lorem ipsum") | t.contains("{")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(page_drop, F.lit("")).otherwise(F.array_join(kept, "\n")).alias(
            "cleaned_text"
        ),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.when(page_drop, F.lit(0))
        .otherwise(F.size(kept))
        .cast("bigint")
        .alias("n_kept"),
        F.when(page_drop, 1).otherwise(0).cast("bigint").alias("page_dropped"),
    )


def split_assignment(
    docs: DataFrame, id_col: str, salt: str = "splitv1",
    train_pct: int = 90, val_pct: int = 5,
) -> DataFrame:
    """Deterministic train/val/test split — the last corpus-assembly
    stage.  Bucket = first 7 hex digits of md5(id || salt) mod 100, so
    membership is a pure function of (id, salt): reruns, late-arriving
    shards, and other engines (the DuckDB oracle) assign identically, and
    changing the salt re-rolls the split without touching data.  No
    shuffle at all — a scan-local projection."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 7
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        bucket.cast("bigint").alias("split_bucket"),
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
    )
