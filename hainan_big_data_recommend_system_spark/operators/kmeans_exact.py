"""Exact integer fixed-point Lloyd KMeans — the oracle-checkable twin
of the MLlib pipeline (qcatalog/ml.py `doc_clusters`).

MLlib KMeans is rows-only by nature (float arithmetic, k-means||
sampling).  This variant pins EVERY source of divergence so DuckDB can
replay the whole fit to hash equality:

- features are the embeddings quantized to integers
  (``round(x * scale)`` — the same ×1000 trick the ANN oracles use);
- the k seed centroids are the vectors of the k ids with the smallest
  ``md5(cast(id as varchar))`` digests (ties by id) — the pinned-hash
  seeding used by the PQ codebooks and MinHash families;
- a FIXED iteration count of Lloyd steps (assignment by integer squared
  euclidean distance, ties to the lowest centroid id);
- centroid updates use sign-safe truncating integer division
  (``sign(s) * (|s| div n)``) — the documented cross-engine division
  discipline (Spark `div` truncates, DuckDB `//` floors; the sign trick
  makes both truncate);
- clusters that lose all members keep their previous centroid.

Scale shape: the assignment step is the only O(n·k·d) work and runs as
an Arrow-batched numpy kernel (mapInPandas) with the k·d centroid
literals in the task closure; the update step is one
posexplode→groupBy(cluster, dim) shuffle whose output is k·d rows —
collected per iteration (bounded: 8×64 ints, documented).  Re-scanning
the source per iteration is the Spark-idiomatic Lloyd loop (MLlib does
the same with cached feature RDDs).

Public knowledge: Lloyd's algorithm (1957/1982); integer fixed-point
determinism is elementary.  Reference parity: simility_books.py /
guessLike_u_like.py fit sklearn KMeans(n_clusters=10, n_init=1) —
the MLlib row stays the faithful port; this twin exists so the fit
itself is inside the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _floor_safe_div(s: int, n: int) -> int:
    """Truncate-toward-zero division matching ``sign * (abs div n)``."""
    return -((-s) // n) if s < 0 else s // n


def lloyd_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 5,
    scale: int = 1000,
    dim: int = 64,
) -> DataFrame:
    """Run the pinned integer Lloyd fit; returns one row per non-empty
    cluster: ``(cluster, n_vecs, inertia, centroid_sum)`` where inertia
    sums the last assignment's squared distances (against the previous
    iteration's centroids) and centroid_sum checksums the final
    centroids."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    pts = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.transform(
            vec_col, lambda x: F.round(x.cast("double") * scale).cast("long")
        ).alias("v"),
    )
    # pinned seeds: k smallest md5 digests (TakeOrdered — no global window)
    seed_rows = (
        pts.select(
            "id", "v",
            F.md5(F.col("id").cast("string").cast("binary")).alias("h"),
        )
        .orderBy("h", "id")
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"need at least {k} vectors to seed {k} clusters")
    centroids = [list(r["v"]) for r in seed_rows]  # cid = seed rank

    def make_partial_agg(cents: list[list[int]]):
        """Assignment + MAP-SIDE-COMBINED sufficient statistics in one
        Arrow kernel: each partition emits k·(dim+2) partial rows
        (per-cluster dim sums, counts, and squared-distance sums) —
        never the n·dim explode a groupBy-over-dims would shuffle.
        All accumulation stays in int64 (exact regardless of order;
        a float path would lose inertia exactness past 2^53)."""
        carr = np.asarray(cents, dtype=np.int64)  # (k, dim)

        def agg(it):
            counts = np.zeros(k, dtype=np.int64)
            dsum = np.zeros(k, dtype=np.int64)
            vsum = np.zeros((k, dim), dtype=np.int64)
            for pdf in it:
                vs = np.asarray(list(pdf["v"]), dtype=np.int64)  # (n, dim)
                # (n, k) squared distances; argmin ties -> lowest cid
                d = ((vs[:, None, :] - carr[None, :, :]) ** 2).sum(axis=2)
                cid = d.argmin(axis=1)
                counts += np.bincount(cid, minlength=k)
                best = d[np.arange(len(cid)), cid]
                for c in range(k):
                    sel = cid == c
                    if sel.any():
                        dsum[c] += int(best[sel].sum())
                        vsum[c] += vs[sel].sum(axis=0)
            rows = {"cluster": [], "j": [], "s": []}
            for c in range(k):
                rows["cluster"] += [c, c] + [c] * dim
                rows["j"] += [-1, -2] + list(range(dim))
                rows["s"] += (
                    [int(counts[c]), int(dsum[c])]
                    + [int(x) for x in vsum[c]]
                )
            yield pd.DataFrame(rows)

        return agg

    schema = "cluster long, j long, s long"
    counts = inertia = None
    for _ in range(iters):
        # one job per iteration: partials → (cluster, j) sum → k·(dim+2)
        # rows collected (bounded, documented)
        sums = (
            pts.mapInPandas(make_partial_agg(centroids), schema)
            .groupBy("cluster", "j")
            .agg(F.sum("s").alias("s"))
            .collect()
        )
        counts = {c: 0 for c in range(k)}
        inertia = {c: 0 for c in range(k)}
        dim_sums: dict[tuple[int, int], int] = {}
        for r in sums:
            if r["j"] == -1:
                counts[r["cluster"]] = int(r["s"])
            elif r["j"] == -2:
                inertia[r["cluster"]] = int(r["s"])
            else:
                dim_sums[(r["cluster"], r["j"])] = int(r["s"])
        new_c = [list(c) for c in centroids]  # empty clusters keep theirs
        for c in range(k):
            if counts[c] > 0:
                for j in range(dim):
                    new_c[c][j] = _floor_safe_div(
                        dim_sums[(c, j)], counts[c]
                    )
        centroids = new_c
    return spark.createDataFrame(
        [
            (c, counts[c], inertia[c], sum(centroids[c]))
            for c in range(k)
            if counts[c] > 0
        ],
        "cluster long, n_vecs long, inertia long, centroid_sum long",
    )


def lloyd_exact_oracle_sql(
    k: int = 8, iters: int = 5, scale: int = 1000, dim: int = 64
) -> str:
    """The unrolled DuckDB replay of :func:`lloyd_exact` on the
    embeddings view — generated, not recursive, so no recursive-CTE
    aggregate restrictions apply."""
    parts = [
        f"""
    WITH pts AS (
        SELECT vec_id AS id,
               list_transform(embedding,
                              x -> CAST(round(x * {scale}) AS BIGINT)) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    c0 AS (
        SELECT row_number() OVER (
                   ORDER BY md5(CAST(id AS VARCHAR)), id
               ) - 1 AS cid, v AS c
        FROM pts
        QUALIFY row_number() OVER (
            ORDER BY md5(CAST(id AS VARCHAR)), id
        ) <= {k}
    )"""
    ]
    for t in range(1, iters + 1):
        parts.append(f""",
    a{t} AS (
        SELECT id, v, cid, dist FROM (
            SELECT p.id, p.v, c.cid,
                   CAST(list_sum(list_transform(
                       list_zip(p.v, c.c),
                       z -> (z[1] - z[2]) * (z[1] - z[2])
                   )) AS BIGINT) AS dist,
                   row_number() OVER (
                       PARTITION BY p.id
                       ORDER BY list_sum(list_transform(
                           list_zip(p.v, c.c),
                           z -> (z[1] - z[2]) * (z[1] - z[2])
                       )), c.cid
                   ) AS rn
            FROM pts p CROSS JOIN c{t - 1} c
        ) WHERE rn = 1
    ),
    s{t} AS (
        SELECT cid, list(cj ORDER BY j) AS c FROM (
            SELECT a.cid, j,
                   CAST(CASE WHEN sum(a.v[j]) >= 0
                             THEN sum(a.v[j]) // count(*)
                             ELSE -((-sum(a.v[j])) // count(*))
                        END AS BIGINT) AS cj
            FROM a{t} a, LATERAL (SELECT unnest(range(1, {dim + 1})) AS j)
            GROUP BY a.cid, j
        ) GROUP BY cid
    ),
    c{t} AS (
        SELECT p.cid, coalesce(s.c, p.c) AS c
        FROM c{t - 1} p LEFT JOIN s{t} s USING (cid)
    )""")
    parts.append(f"""
    SELECT a.cid AS cluster,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(a.dist) AS BIGINT) AS inertia,
           CAST(any_value(list_sum(c.c)) AS BIGINT) AS centroid_sum
    FROM a{iters} a JOIN c{iters} c ON a.cid = c.cid
    GROUP BY 1""")
    return "".join(parts)
