"""Property tests for the subtle reference semantics (SURVEY.md §5 item 4):

- F11: normalized tag weight lands in {1..levels} for ANY num distribution,
  is monotone in num, and the per-key max always gets the top level
  (`simility_books.py:38`).
- A8: the rank-discounted score fold is invariant under how similarity TIES
  are broken — tied contributors occupy the same set of rank slots, so the
  contribution multiset (and the integer-scaled sum) cannot change
  (`guessLike_u_like.py:119-124`).
- P10/F8: title normalization is idempotent — one pass removes every
  character either regex can ever match, so a second pass is the identity
  (`simility_books.py:74-88`); hence title-dedup survivors are a fixpoint.

Each example is tiny (≤ 24 rows) but runs through the real Spark operators,
not a reimplementation.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.functions.text import normalize_title
from hainan_big_data_recommend_system_spark.operators.scoring import (
    rank_discounted_score,
)
from hainan_big_data_recommend_system_spark.operators.weights import (
    normalize_weights,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(nums=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=20))
def test_f11_weight_bounds_and_monotonicity(spark, nums):
    df = spark.createDataFrame(
        [(1, i, n) for i, n in enumerate(nums)], "key int, idx int, num long"
    )
    rows = (
        normalize_weights(df, "key", "num")
        .select("idx", "num", "weight")
        .collect()
    )
    by_idx = {r.idx: r for r in rows}
    assert all(1 <= r.weight <= 4 for r in rows), rows
    # the max always maps to the top level: (max+0.1-min)*4/(max+0.1-min) == 4
    mx = max(nums)
    assert all(r.weight == 4 for r in rows if r.num == mx), rows
    # monotone: higher num never gets a lower weight
    ordered = sorted(rows, key=lambda r: r.num)
    for lo, hi in zip(ordered, ordered[1:]):
        assert lo.weight <= hi.weight, (lo, hi)
    assert len(by_idx) == len(nums)


@_SETTINGS
@given(
    sims=st.lists(
        # small finite grid forces frequent exact ties
        st.sampled_from([0.25, 0.5, 0.75, 1.0]),
        min_size=1,
        max_size=12,
    )
)
def test_a8_score_fold_invariant_under_tie_order(spark, sims):
    df = spark.createDataFrame(
        [(7, s, i) for i, s in enumerate(sims)], "item int, sim double, tie int"
    )

    def score(tiebreak):
        return (
            rank_discounted_score(
                df, "item", "sim", [F.desc("sim"), tiebreak], int_scale=1_000_000
            )
            .collect()[0]["score"]
        )

    assert score(F.asc("tie")) == score(F.desc("tie"))


_TITLE_ALPHABET = (
    "abcXYZ019 .·・《》-（）【】/(),第:精"
    "红楼梦三国演义活着围城我们仨！？、"
)


@_SETTINGS
@given(
    titles=st.lists(
        st.text(alphabet=_TITLE_ALPHABET, max_size=24), min_size=1, max_size=8
    )
)
def test_p10_title_normalization_idempotent(spark, titles):
    df = spark.createDataFrame([(t,) for t in titles], "title string")
    once = normalize_title(F.col("title"))
    rows = df.select(
        once.alias("n1"), normalize_title(once).alias("n2")
    ).collect()
    for r in rows:
        assert r.n1 == r.n2, r


@given(
    st.integers(min_value=1, max_value=256),
    st.integers(min_value=1, max_value=96),
    st.binary(min_size=0, max_size=64),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(w, h, seed):
    """make_bmp → parse_bmp_header round-trips exactly for any dims/pixel
    seed, and the declared file size matches the padded-row formula."""
    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        make_bmp,
        parse_bmp_header,
    )

    payload = make_bmp(w, h, seed)
    pw, ph, bpp, fsize, px_off = parse_bmp_header(payload)
    assert (pw, ph, bpp, px_off) == (w, h, 24, 54)
    assert fsize == len(payload) == 54 + (w * 3 + 3) // 4 * 4 * h


@given(
    st.integers(min_value=1, max_value=48),
    st.integers(min_value=1, max_value=24),
    st.binary(min_size=0, max_size=64),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, seed):
    """make_png → parse_png round-trips EXACT PIXELS for any dims/seed:
    the decoder must invert whichever of the five scanline filters the
    encoder picked (they cycle per row), including Paeth, and truncating
    the payload anywhere must raise, never return garbage."""
    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        make_png,
        parse_png,
    )

    payload = make_png(w, h, seed)
    pw, ph, c, px = parse_png(payload)
    s = seed or b"\x00"
    n = w * h * 3
    assert (pw, ph, c) == (w, h, 3)
    assert px == (s * (-(-n // len(s))))[:n]
    # any truncation that cuts a chunk boundary or body fails loudly
    for cut in (9, 20, 33, len(payload) // 2, len(payload) - 1):
        if cut < len(payload):
            try:
                parse_png(payload[:cut])
            except ValueError:
                continue
            raise AssertionError(f"truncation at {cut} not rejected")


def test_repetition_stats_bounds_and_extremes(spark):
    """Ratio bounds [0, 1e6]; a fully-repetitive doc maxes top/dup, an
    all-distinct doc has dup=0, and a doc too short for n-grams gets 0s."""
    from hainan_big_data_recommend_system_spark.operators.textstats import (
        repetition_stats,
    )

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "x")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs, "doc_id", "text").collect()}
    # doc 1: 2-grams = ["a a"] x3 -> top = 1.0, dup = 2/3
    assert out[1]["top2gram_micros"] == 1_000_000
    assert out[1]["dup2gram_micros"] == 666667
    # doc 2: three distinct 2-grams -> top = 1/3, dup = 0
    assert out[2]["top2gram_micros"] == 333333
    assert out[2]["dup2gram_micros"] == 0
    # doc 3: too short for any n-gram -> all zeros
    assert all(out[3][c] == 0 for c in (
        "top2gram_micros", "dup2gram_micros", "top3gram_micros", "dup3gram_micros"
    ))
    for r in out.values():
        for c in ("top2gram_micros", "dup2gram_micros",
                  "top3gram_micros", "dup3gram_micros"):
            assert 0 <= r[c] <= 1_000_000


# ---------------------------------------------------------------------------
# Round-5 session-2 properties: the distributed BPE trainer and the
# exact-substring scrub each checked against straightforward pure-Python
# reference implementations on hypothesis-generated corpora.
# ---------------------------------------------------------------------------

def _bpe_reference(word_freqs: dict[str, int], n_merges: int):
    """Textbook sequential BPE (Sennrich et al.): pair counts over symbol
    sequences, argmax with (count desc, pair asc) tie-break, greedy
    left-to-right merge."""
    seqs = {w: list(w) for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            return merges, seqs
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((step, l, r, c))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    words=st.lists(
        st.tuples(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    n_merges=st.integers(min_value=1, max_value=3),
)
def test_bpe_train_matches_reference(spark, words, n_merges):
    """The distributed trainer's merge table equals textbook sequential
    BPE for any corpus — including repeated-symbol overlap cases."""
    from hainan_big_data_recommend_system_spark.operators.bpe import bpe_train

    wf = dict(words)
    ref, _ = _bpe_reference(wf, n_merges)
    df = spark.createDataFrame(list(wf.items()), "word string, freq long")
    try:
        got = bpe_train(df, "word", "freq", n_merges)
    except ValueError:
        # pair space exhausted mid-way: the reference must agree it ran dry
        assert len(ref) < n_merges
        return
    assert got == ref[: len(got)]


def _esd_reference(texts: dict[int, str], w: int):
    """Direct reimplementation of keep-first window removal."""
    toks = {d: [t for t in txt.split() if t] for d, txt in texts.items()}
    first: dict[tuple, tuple] = {}
    occs: list[tuple] = []
    for d in sorted(toks):
        for p in range(len(toks[d]) - w + 1):
            key = tuple(toks[d][p : p + w])
            occs.append((d, p, key))
            first.setdefault(key, (d, p))
    counts: dict[tuple, int] = {}
    for _, _, key in occs:
        counts[key] = counts.get(key, 0) + 1
    removed = {d: set() for d in toks}
    for d, p, key in occs:
        if counts[key] >= 2 and first[key] != (d, p):
            removed[d].update(range(p, p + w))
    out = {}
    for d in toks:
        kept = [t for i, t in enumerate(toks[d]) if i not in removed[d]]
        out[d] = (" ".join(kept), len(toks[d]), len(removed[d]))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_exact_substring_dedup_matches_reference(spark, docs):
    """Window removal over a tiny alphabet (dense duplicate structure,
    overlapping spans, whole-doc wipeouts) equals the direct Python
    reimplementation for any corpus."""
    from hainan_big_data_recommend_system_spark.operators.substring_dedup import (
        exact_substring_dedup,
    )

    texts = {i: " ".join(d) for i, d in enumerate(docs)}
    ref = _esd_reference(texts, w=3)
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed_tokens"])
        for r in exact_substring_dedup(df, "doc_id", "text", w=3).collect()
    }
    assert got == ref


@_SETTINGS
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=30,
    ),
    q=st.sampled_from([(1, 2), (1, 4), (9, 10), (99, 100), (1, 1)]),
)
def test_exact_group_quantile_equals_sorted_index(spark, vals, q):
    """Property: the value-compressed quantile equals the ceil(q*n)-th
    element of the sorted list — on arbitrary integers with ties."""
    import math

    from hainan_big_data_recommend_system_spark.operators.anomaly import (
        exact_group_quantile,
    )

    qn, qd = q
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "g string, i long, v long",
    )
    [row] = exact_group_quantile(df, ["g"], "v", qn, qd, "q").collect()
    want = sorted(vals)[max(1, math.ceil(qn * len(vals) / qd)) - 1]
    assert row["q"] == want, (vals, q)


@_SETTINGS
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=5),  # heavy ties on purpose
        min_size=1,
        max_size=30,
    )
)
def test_distributed_rank_equals_window_rank(spark, vals):
    """Property: the value-compressed global rank equals row_number()
    over the same total order, for any tie structure."""
    from pyspark.sql import Window

    from hainan_big_data_recommend_system_spark.operators.ranking import (
        distributed_global_rank,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        r["id"]: r["rank"]
        for r in distributed_global_rank(df, "v", ["id"]).collect()
    }
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want, vals
