"""Prefix-filter set-similarity join (operators/ssjoin.py): the
defining property is LOSSLESSNESS — the candidate pruning must never
drop a qualifying pair — so the core test is equality with brute
force on corpora engineered to stress the prefix boundary."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.operators.ssjoin import (
    prefix_filter_pairs,
    tokenize_distinct,
)


def _brute(rows, t_micros):
    sets = {i: set(s.lower().split()) for i, s in rows}
    out = set()
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter * 1_000_000 >= t_micros * union:
            out.add((a, b, inter, union))
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestLossless:
    def test_equals_brute_force(self, spark):
        # overlapping shingled vocab: many near-dup pairs at varying J,
        # plus exact-duplicate token sets (docs 200/201/202 == doc 3's
        # set, reordered/repeated) so the collapse+expand path carries
        # real cliques.  Both code paths must equal brute force.
        rows = [
            (i, " ".join(f"w{j}" for j in range(i, i + 20)))
            for i in range(30)
        ] + [(100 + i, f"unique{i} " * 3) for i in range(5)] + [
            (200, " ".join(f"w{j}" for j in range(22, 2, -1))),
            (201, " ".join(f"w{j}" for j in range(3, 23)) + " w3 w4"),
            (202, " ".join(f"w{j}" for j in range(3, 23))),
        ]
        for t in (500_000, 800_000, 900_000, 1_000_000):
            for collapse in (True, False):
                got = {
                    (r["doc1"], r["doc2"], r["common"], r["union_sz"])
                    for r in prefix_filter_pairs(
                        _docs(spark, rows), "doc_id", "text", t,
                        collapse_exact=collapse,
                    ).collect()
                }
                assert got == _brute(rows, t), (t, collapse)

    def test_exact_duplicates_at_threshold_one(self, spark):
        rows = [(1, "a b c"), (2, "c b a"), (3, "a b d")]
        got = prefix_filter_pairs(
            _docs(spark, rows), "doc_id", "text", 1_000_000
        ).collect()
        assert [(r["doc1"], r["doc2"], r["jaccard_micros"]) for r in got] \
            == [(1, 2, 1_000_000)]

    def test_token_sets_are_distinct_and_case_folded(self, spark):
        rows = [(1, "A a A b"), (2, "a b b B")]
        toks = tokenize_distinct(_docs(spark, rows), "doc_id", "text")
        assert toks.count() == 4  # {a,b} x 2 docs
        got = prefix_filter_pairs(
            _docs(spark, rows), "doc_id", "text", 1_000_000
        ).collect()
        assert got[0]["jaccard_micros"] == 1_000_000


class TestScaleShape:
    def test_prefix_prunes_frequent_tokens(self, spark):
        # every doc shares 'common'; distinctive tokens differ.  At
        # t=0.9 the prefix is the single rarest token, so the shared
        # high-df token must never be a join key.
        rows = [(i, f"common distinct{i} x{i} y{i} z{i} q{i} r{i} s{i} "
                    f"t{i} u{i}") for i in range(40)]
        docs = _docs(spark, rows)
        out = prefix_filter_pairs(docs, "doc_id", "text", 900_000)
        assert out.count() == 0  # no qualifying pairs, and no blowup

    def test_windows_are_doc_partitioned(self, spark):
        docs = _docs(spark, [(1, "a b"), (2, "b c")])
        plan = prefix_filter_pairs(
            docs, "doc_id", "text", 900_000
        )._jdf.queryExecution().executedPlan().toString()
        assert "WindowExec: No Partition Defined" not in plan
        assert "Python" not in plan  # pure expressions end to end
