"""PQ ANN: encode determinism, ADC exactness, and recall vs exact L2."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from hainan_big_data_recommend_system_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
)
from hainan_big_data_recommend_system_spark.operators.pq_codebooks import (
    PINNED_PQ_CODEBOOKS,
    PQ_SUB_DIM,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_codebook_geometry():
    m = len(PINNED_PQ_CODEBOOKS)
    assert m * PQ_SUB_DIM == 64  # covers the embedding dim exactly
    assert all(len(b) == len(PINNED_PQ_CODEBOOKS[0]) for b in PINNED_PQ_CODEBOOKS)
    assert all(len(cw) == PQ_SUB_DIM for b in PINNED_PQ_CODEBOOKS for cw in b)


def test_encode_matches_numpy_reference(spark, emb):
    got = {r["vid"]: r["codes"] for r in pq_encode(emb, "vec_id", "embedding").collect()}
    rows = emb.orderBy("vec_id").collect()
    books = np.asarray(PINNED_PQ_CODEBOOKS, dtype=np.int64)
    m, k, s = books.shape
    for r in rows[:50]:
        x = np.round(np.asarray(r["embedding"], dtype=np.float64) * 1000).astype(
            np.int64
        )
        want = [
            int(
                (
                    (x[j * s : (j + 1) * s][None, :] - books[j]) ** 2
                ).sum(axis=1).argmin()
            )
            for j in range(m)
        ]
        assert list(got[r["vec_id"]]) == want


def test_adc_recall_floor_vs_exact_l2(spark, emb):
    """The pinned M=16 x K=256 geometry measured recall@5 = 0.776 at
    sf0.01 (its training set) and 0.552 at sf0.001 vs exact integer L2;
    floor pinned below the smaller-set figure."""
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    x = np.round(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * 1000
    ).astype(np.int64)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    exact = {}
    for i in np.nonzero(ids % 4 == 0)[0]:
        top = np.lexsort((ids, d2[i]))[:5]
        exact[ids[i]] = set(ids[top])
    got = {}
    out = pq_adc_topk(
        emb, "vec_id", "embedding", k=5, query_filter=F.col("query_id") % 4 == 0
    ).collect()
    for r in out:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(exact)
    rec = np.mean([len(got[q] & exact[q]) / 5 for q in exact])
    assert rec >= 0.5, f"recall@5 {rec:.3f} below floor"


def test_adc_distance_is_exact_lut_sum(spark, emb):
    """Spot-check: reported adc_dist equals the hand-computed LUT sum."""
    out = pq_adc_topk(
        emb, "vec_id", "embedding", k=5, query_filter=F.col("query_id") == 0
    ).collect()
    codes = {r["vid"]: list(r["codes"]) for r in pq_encode(emb, "vec_id", "embedding").collect()}
    qvec = np.round(
        np.asarray(
            emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"],
            dtype=np.float64,
        )
        * 1000
    ).astype(np.int64)
    books = np.asarray(PINNED_PQ_CODEBOOKS, dtype=np.int64)
    m, k, s = books.shape
    for r in out:
        want = sum(
            int(
                (
                    (qvec[j * s : (j + 1) * s] - books[j][codes[r["neighbor_id"]][j]])
                    ** 2
                ).sum()
            )
            for j in range(m)
        )
        assert r["adc_dist"] == want


def test_null_vectors_dropped(spark):
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.1] * 64), Row(vec_id=2, embedding=None)],
        "vec_id long, embedding array<float>",
    )
    assert pq_encode(df, "vec_id", "embedding").count() == 1


def test_dim_mismatch_raises(spark):
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.1] * 32)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="codebook grid"):
        pq_encode(df, "vec_id", "embedding")


def test_ivfpq_invariants_and_recall(spark, emb):
    """IVFPQ = PQ restricted to probed IVF lists: distances it emits are
    identical to the full-scan ADC for shared pairs (pruning changes the
    candidate set, never a score), no self-pairs, k-bounded, and recall
    vs full-scan PQ tracks the IVF nprobe=2/8 geometry (measured 0.398
    at sf0.001, 0.525 at sf0.01; floor below)."""
    from pyspark.sql import functions as F

    from hainan_big_data_recommend_system_spark.operators.pq import (
        pq_ivf_adc_topk,
    )

    probe = F.col("query_id") % 4 == 0
    full = pq_adc_topk(emb, "vec_id", "embedding", k=5, query_filter=probe)
    ivf = pq_ivf_adc_topk(
        emb, "vec_id", "embedding", k=5, nprobe=2, query_filter=probe
    )
    assert ivf.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0
    assert ivf.agg(F.max("rn")).collect()[0][0] <= 5
    mism = (
        full.select("query_id", "neighbor_id", F.col("adc_dist").alias("d0"))
        .join(ivf, ["query_id", "neighbor_id"])
        .filter(F.col("adc_dist") != F.col("d0"))
        .count()
    )
    assert mism == 0  # exact ADC regardless of pruning
    fs, iv = {}, {}
    for r in full.collect():
        fs.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in ivf.collect():
        iv.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rec = sum(len(fs[q] & iv.get(q, set())) / len(fs[q]) for q in fs) / len(fs)
    assert rec >= 0.3, f"IVFPQ recall {rec:.3f} below the nprobe=2 floor"


def test_ragged_batch_rejected_in_kernel(spark):
    """The driver probe samples one row; a mixed-dim corpus must still
    die with the explicit dimensionality error inside the Arrow kernel,
    never encode truncated garbage."""
    rows = [Row(vec_id=i, embedding=[0.1] * 64) for i in range(20)]
    rows.append(Row(vec_id=99, embedding=[0.1] * 32))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="dimensionality"):
        pq_encode(df, "vec_id", "embedding").collect()


def test_ivfpq_refined_rerank_improves_recall(spark, emb):
    """The FAISS deployment recipe (IVF probe -> ADC shortlist -> exact
    re-rank of refine_k candidates): re-scoring fixes ADC misordering
    inside the shortlist, so recall@5 vs exact L2 must rise above plain
    IVFPQ (measured 0.341 -> 0.432 at sf0.001, 0.475 -> 0.512 at sf0.01
    with refine_k=20, nprobe=2; floors pinned below), and the refined
    ranking must equal the exact-L2 ranking OF the shortlist."""
    from hainan_big_data_recommend_system_spark.operators.pq import (
        pq_ivf_adc_refined_topk,
        pq_ivf_adc_topk,
    )

    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    x = np.round(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * 1000
    ).astype(np.int64)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    exact = {}
    for i in np.nonzero(ids % 4 == 0)[0]:
        exact[ids[i]] = set(ids[np.lexsort((ids, d2[i]))[:5]])

    probe = F.col("query_id") % 4 == 0
    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(got.get(q, set()) & exact[q]) / 5 for q in exact) / len(
            exact
        )

    plain = pq_ivf_adc_topk(
        emb, "vec_id", "embedding", k=5, nprobe=2, query_filter=probe
    )
    refined = pq_ivf_adc_refined_topk(
        emb, "vec_id", "embedding", k=5, refine_k=20, nprobe=2,
        query_filter=probe,
    )
    r_plain, r_ref = recall(plain), recall(refined)
    assert r_ref >= r_plain, (r_ref, r_plain)
    assert r_ref >= 0.40, f"refined recall {r_ref:.3f} below pinned floor"

    # the l2_dist column IS the exact integer L2 of the pair
    vec = {int(i): x[n] for n, i in enumerate(ids)}
    out = refined.collect()
    for r in out[:50]:
        want = int(((vec[r["query_id"]] - vec[r["neighbor_id"]]) ** 2).sum())
        assert r["l2_dist"] == want
    # rn orders by exact distance (ties on neighbor), never by ADC
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rn"])
        assert [
            (r["l2_dist"], r["neighbor_id"]) for r in rs
        ] == sorted((r["l2_dist"], r["neighbor_id"]) for r in rs)


def test_ivfpq_refined_validates_refine_k(spark, emb):
    from hainan_big_data_recommend_system_spark.operators.pq import (
        pq_ivf_adc_refined_topk,
    )

    with pytest.raises(ValueError, match="refine_k"):
        pq_ivf_adc_refined_topk(
            emb, "vec_id", "embedding", k=5, refine_k=3
        )
