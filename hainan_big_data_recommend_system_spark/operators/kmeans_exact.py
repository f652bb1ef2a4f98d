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

    def make_assigner(cents: list[list[int]]):
        carr = np.asarray(cents, dtype=np.int64)  # (k, dim)

        def assign(it):
            for pdf in it:
                vs = np.asarray(list(pdf["v"]), dtype=np.int64)  # (n, dim)
                # (n, k) squared distances; argmin ties -> lowest cid
                d = ((vs[:, None, :] - carr[None, :, :]) ** 2).sum(axis=2)
                cid = d.argmin(axis=1)
                yield pd.DataFrame(
                    {
                        "id": pdf["id"],
                        "v": pdf["v"],
                        "cluster": cid.astype("int64"),
                        "dist": d[np.arange(len(cid)), cid].astype("int64"),
                    }
                )

        return assign

    schema = "id long, v array<long>, cluster long, dist long"
    assigned = None
    for _ in range(iters):
        assigned = pts.mapInPandas(make_assigner(centroids), schema)
        # update: one shuffle keyed (cluster, dim); k*dim output rows
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("j", "x"))
            .groupBy("cluster", "j")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: k*dim rows (8*64), documented
        )
        new_c = [list(c) for c in centroids]  # empty clusters keep theirs
        for r in sums:
            new_c[r["cluster"]][r["j"]] = _floor_safe_div(
                int(r["s"]), int(r["n"])
            )
        centroids = new_c
    csum = {cid: sum(c) for cid, c in enumerate(centroids)}
    csum_df = spark.createDataFrame(
        [(cid, s) for cid, s in csum.items()], "cluster long, c_sum long"
    )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("dist").alias("inertia"),
        )
        .join(F.broadcast(csum_df), "cluster")
        .select(
            "cluster",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("inertia").cast("long").alias("inertia"),
            F.col("c_sum").cast("long").alias("centroid_sum"),
        )
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
