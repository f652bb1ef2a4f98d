"""Span-corruption pair generation — the T5 denoising objective (Raffel
et al., JMLR 2020 §3.1.4) as a batch data-prep operator: each document
becomes an ``(input_text, target_text)`` pair where ~5% of token
positions seed a masked span of ``span_len`` tokens, the input replaces
each masked span with a ``<extra_id_k>`` sentinel, and the target lists
the sentinels with their hidden tokens (terminated by a final sentinel).

Pretraining corpora are materialized this way once per epoch recipe at
100 TB scale, so the generation must be deterministic and cheap:

- span seeding is a salted md5 bucket of ``(doc_id, pos)`` — a pure
  function, so reruns / retries / the DuckDB oracle produce identical
  pairs, and re-salting re-rolls the noise without touching data;
- overlapping spans merge via the same gaps-and-islands window algebra
  as the substring scrub — per-doc, bounded by document length;
- the only corpus-wide shapes are a posexplode and per-doc aggregations
  (map-side combining; nothing shuffles wider than token rows).

The sentinel numbering follows the T5 convention: k-th masked span (in
document order) → ``<extra_id_k>``; the target terminates with
``<extra_id_K>`` where K = span count (a doc with no seeded span keeps
its full text as input and a bare ``<extra_id_0>`` target).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_WS = r"[ \t\n\x0B\f\r]+"


def _hash_mod(parts: list, mod) -> F.Column:
    """Engine-portable integer hash: first 7 md5 hex digits mod ``mod``."""
    return (
        F.conv(F.substring(F.md5(F.concat_ws(":", *parts)), 1, 7), 16, 10)
        .cast("long")
        % mod
    )


def _sentinel(k):
    return F.concat(F.lit("<extra_id_"), k.cast("string"), F.lit(">"))


def span_corruption_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 3,
    start_mod: int = 20,
    salt: str = "spanv1",
) -> DataFrame:
    """``(doc_id, input_text, target_text, n_spans, n_masked_tokens)``.

    A position seeds a span iff
    ``md5(doc_id:pos:salt) bucket % start_mod == 0`` (expected noise
    density ≈ span_len/start_mod); spans run ``span_len`` tokens and
    merge when they overlap."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), _WS), lambda w: w != ""
    )
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
    tokens = base.select(
        "doc_id", F.posexplode("__toks").alias("__p0", "tok")
    ).select("doc_id", (F.col("__p0") + 1).alias("pos"), "tok")
    seed = (
        _hash_mod(
            [F.col("doc_id").cast("string"), F.col("pos").cast("string"),
             F.lit(salt)],
            start_mod,
        )
        == 0
    )
    starts = tokens.filter(seed).select(
        "doc_id", "pos", (F.col("pos") + (span_len - 1)).alias("__end")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("__end").over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        starts.select(
            "doc_id",
            "pos",
            "__end",
            F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
            .otherwise(0)
            .alias("__ni"),
        )
        .select(
            "doc_id",
            "pos",
            "__end",
            F.sum("__ni")
            .over(wdoc.rowsBetween(Window.unboundedPreceding, 0))
            .alias("__g"),
        )
        .groupBy("doc_id", "__g")
        .agg(F.min("pos").alias("__s"), F.max("__end").alias("__e"))
        .select(
            F.col("doc_id").alias("__idoc"),
            (F.col("__g") - 1).alias("k"),  # 0-based sentinel index
            "__s",
            "__e",
        )
    )
    lab = tokens.join(
        islands,
        (F.col("doc_id") == F.col("__idoc"))
        & (F.col("pos") >= F.col("__s"))
        & (F.col("pos") <= F.col("__e")),
        "left",
    )
    # input pieces: unmasked tokens verbatim; the first token of a masked
    # island becomes its sentinel; other masked tokens vanish
    piece = (
        F.when(F.col("k").isNull(), F.col("tok"))
        .when(F.col("pos") == F.col("__s"), _sentinel(F.col("k")))
        .otherwise(F.lit(None))
    )
    per_doc = lab.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.filter(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", piece.alias("pc")))
                    ),
                    lambda s: s["pc"],
                ),
                lambda p: p.isNotNull(),
            ),
        ).alias("input_text"),
        F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_masked_tokens"),
    )
    # target: per island, sentinel + hidden tokens, in document order
    span_txt = (
        lab.filter(F.col("k").isNotNull())
        .groupBy("doc_id", "k")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("__hidden")
        )
        .select(
            "doc_id",
            "k",
            F.concat(_sentinel(F.col("k")), F.lit(" "), F.col("__hidden")).alias(
                "__seg"
            ),
        )
    )
    targets = span_txt.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("k", "__seg"))),
                lambda s: s["__seg"],
            ),
        ).alias("__tgt"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    out = (
        base.select("doc_id", F.array_join("__toks", " ").alias("__orig"))
        .join(per_doc, "doc_id", "left")
        .join(targets, "doc_id", "left")
    )
    n_spans = F.coalesce(F.col("n_spans"), F.lit(0))
    return out.select(
        "doc_id",
        F.coalesce("input_text", F.col("__orig")).alias("input_text"),
        F.concat(
            F.coalesce(F.concat(F.col("__tgt"), F.lit(" ")), F.lit("")),
            _sentinel(n_spans),
        ).alias("target_text"),
        n_spans.cast("long").alias("n_spans"),
        F.coalesce("n_masked_tokens", F.lit(0))
        .cast("long")
        .alias("n_masked_tokens"),
    )


def fim_transform(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    fim_rate_mod: int = 2,
    salt: str = "fimv1",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle"):
    for a deterministic ``1/fim_rate_mod`` of docs (the paper's 50%
    default at ``2``), pick two salted-hash cut points, split the token
    stream into prefix/middle/suffix, and emit the PSM reordering
    ``<fim_prefix> P <fim_suffix> S <fim_middle> M``; the rest pass
    through unchanged as autoregressive rows (``mode = 'ar'``).

    Cut points are pure functions of ``(doc_id, salt)`` — rerun,
    replica, and oracle identical; re-salt to re-roll.  Entirely
    scan-local slice/join expressions: no shuffle, no UDF, the transform
    streams through the corpus scan at 100 TB.

    ``(doc_id, mode, output_text, n_prefix, n_middle, n_suffix)``;
    prefix + middle + suffix always reconstructs the original stream
    (the invariant test's property)."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), _WS), lambda w: w != ""
    )
    n = F.size(toks)
    is_fim = _hash_mod(
        [F.col(id_col).cast("string"), F.lit(salt), F.lit("m")], fim_rate_mod
    ) == 0
    a = _hash_mod([F.col(id_col).cast("string"), F.lit(salt), F.lit("a")], n + 1)
    b = _hash_mod([F.col(id_col).cast("string"), F.lit(salt), F.lit("b")], n + 1)
    lo, hi = F.least(a, b), F.greatest(a, b)
    prefix = F.slice(toks, 1, lo)
    middle = F.slice(toks, lo + 1, hi - lo)
    suffix = F.slice(toks, hi + 1, n - hi)
    psm = F.concat_ws(
        " ",
        F.lit("<fim_prefix>"), F.array_join(prefix, " "),
        F.lit("<fim_suffix>"), F.array_join(suffix, " "),
        F.lit("<fim_middle>"), F.array_join(middle, " "),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(is_fim, "fim").otherwise("ar").alias("mode"),
        F.when(is_fim, psm).otherwise(F.array_join(toks, " ")).alias(
            "output_text"
        ),
        F.when(is_fim, F.size(prefix)).otherwise(n).cast("long").alias(
            "n_prefix"
        ),
        F.when(is_fim, F.size(middle)).otherwise(0).cast("long").alias(
            "n_middle"
        ),
        F.when(is_fim, F.size(suffix)).otherwise(0).cast("long").alias(
            "n_suffix"
        ),
    )
