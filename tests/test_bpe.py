"""BPE merge training/application: hand-pinned merges, greedy-overlap
semantics, and trainer/applier consistency."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from hainan_big_data_recommend_system_spark.operators.bpe import (
    bpe_apply,
    bpe_merge_table,
    bpe_train,
    word_counts,
)


@pytest.fixture()
def tiny_words(spark):
    # 'abab' x3, 'ab' x2, 'ba' x1 — pair counts: (a,b)=8? no:
    # abab: pairs (a,b),(b,a),(a,b) -> per word (a,b)x2,(b,a)x1
    # weighted: (a,b): 3*2 + 2*1 = 8, (b,a): 3*1 + 1 = 4
    return spark.createDataFrame(
        [Row(word="abab", freq=3), Row(word="ab", freq=2), Row(word="ba", freq=1)]
    )


def test_bpe_train_pinned_merges(tiny_words):
    merges = bpe_train(tiny_words, "word", "freq", n_merges=2)
    # step 1: (a,b) wins with 8; after merging, 'abab'->[ab,ab], 'ab'->[ab]
    assert merges[0] == (1, "a", "b", 8)
    # step 2: remaining pairs: (ab,ab) from 'abab' x3 = 3; (b,a) from 'ba' = 1
    assert merges[1] == (2, "ab", "ab", 3)


def test_bpe_greedy_overlap_semantics(spark):
    # 'aaa' with pair (a,a): greedy left-to-right gives [aa, a], so the
    # second-round pair space must contain (aa, a) — the str.replace
    # delimiter construction must not double-consume the shared symbol
    words = spark.createDataFrame([Row(word="aaa", freq=5)])
    merges = bpe_train(words, "word", "freq", n_merges=2)
    assert merges[0] == (1, "a", "a", 10)  # two adjacent pairs x freq 5
    assert merges[1] == (2, "aa", "a", 5)


def test_bpe_apply_counts(spark, tiny_words):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="abab ab"),
            Row(doc_id=2, text="ba"),
            Row(doc_id=3, text=""),
            Row(doc_id=4, text="xyz abab"),
        ]
    )
    merges = bpe_train(tiny_words, "word", "freq", n_merges=2)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_apply(docs, "doc_id", "text", merges).collect()
    }
    # after (a,b)->ab and (ab,ab)->abab: 'abab'->1 token, 'ab'->1, 'ba'->2,
    # 'xyz'->3 chars untouched
    assert got == {1: 2, 2: 2, 3: 0, 4: 4}


def test_bpe_merge_table_schema(spark, tiny_words):
    df = bpe_merge_table(spark, tiny_words, "word", "freq", n_merges=2)
    assert df.columns == ["step", "merge_left", "merge_right", "pair_count"]
    assert df.count() == 2


def test_word_counts_drops_empties(spark):
    docs = spark.createDataFrame([Row(text="  a  b  a "), Row(text="")])
    got = {r["word"]: r["freq"] for r in word_counts(docs, "text").collect()}
    assert got == {"a": 2, "b": 1}


def test_bpe_exhaustion_raises(spark):
    words = spark.createDataFrame([Row(word="ab", freq=1)])
    with pytest.raises(ValueError, match="exhausted"):
        bpe_train(words, "word", "freq", n_merges=3)


def test_bpe_rejects_delimiter_in_words(spark):
    words = spark.createDataFrame([Row(word="a|b", freq=1), Row(word="ok", freq=1)])
    with pytest.raises(ValueError, match="delimiter"):
        bpe_train(words, "word", "freq", n_merges=1)


def test_bpe_apply_nulls_pipe_bearing_docs(spark, tiny_words):
    merges = bpe_train(tiny_words, "word", "freq", n_merges=1)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="ab ok"), Row(doc_id=2, text="a|b ok")]
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_apply(docs, "doc_id", "text", merges).collect()
    }
    assert got[1] is not None
    assert got[2] is None  # un-tokenizable under the delimiter scheme


def test_bpe_train_local_matches_spark_loop(spark, tiny_words, sf_dir):
    """VERDICT r5 #3: the driver-local vocabulary-scale merge loop must
    be BIT-identical to the per-round Spark loop — same pair counts,
    same (count desc, t1 asc, t2 asc) tie-break, same greedy-overlap
    merge semantics — on both the pinned fixture and a real corpus."""
    from hainan_big_data_recommend_system_spark.catalog import load_table
    from hainan_big_data_recommend_system_spark.operators.bpe import (
        bpe_train_local,
    )

    assert bpe_train_local(tiny_words, "word", "freq", 2) == bpe_train(
        tiny_words, "word", "freq", 2
    )
    # greedy-overlap parity ('aaa' merges to [aa, a], never [aa, aa])
    w = spark.createDataFrame([Row(word="aaa", freq=5)])
    assert bpe_train_local(w, "word", "freq", 2) == bpe_train(
        w, "word", "freq", 2
    )
    # real corpus word table, overlapping n
    docs = load_table(spark, sf_dir, "documents")
    wc = word_counts(docs, "text").localCheckpoint(eager=True)
    assert bpe_train_local(wc, "word", "freq", 8) == bpe_train(
        wc, "word", "freq", 8
    )


def test_bpe_train_local_vocab_scale(spark, sf_dir):
    """The point of the local loop: ~1024 merges in seconds (the Spark
    loop schedules 2 jobs per merge — ~2k sequential jobs at this n).
    Exhaustion inside the budget is acceptable on a tiny corpus; what is
    NOT acceptable is minutes of wall or a non-monotone merge table."""
    import time

    from hainan_big_data_recommend_system_spark.catalog import load_table
    from hainan_big_data_recommend_system_spark.operators.bpe import (
        bpe_train_local,
    )

    wc = word_counts(
        load_table(spark, sf_dir, "documents"), "text"
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    try:
        merges = bpe_train_local(wc, "word", "freq", n_merges=1024)
    except ValueError as e:
        assert "pair space exhausted" in str(e)
        merges = []
    wall = time.perf_counter() - t0
    assert wall < 30, f"1024-merge local training took {wall:.1f}s"
    if merges:
        assert [m[0] for m in merges] == list(range(1, len(merges) + 1))
        # pair counts never increase as merges consume the pair space
        # in aggregate? not strictly monotone — but every count positive
        assert all(m[3] > 0 for m in merges)


def test_bpe_train_local_vocab_guard(spark, tiny_words):
    import pytest as _pytest

    from hainan_big_data_recommend_system_spark.operators.bpe import (
        bpe_train_local,
    )

    with _pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train_local(tiny_words, "word", "freq", 2, max_vocab_rows=1)
