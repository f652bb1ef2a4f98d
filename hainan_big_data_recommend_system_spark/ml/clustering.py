"""Seeded KMeans user clustering (SURVEY.md §2.9 M3§/M4§).

Reference semantics: ``KMeans(n_clusters=10, n_init=1, init='k-means++')``
over the user-profile count matrix (`guessLike_u_like.py:78-79`).  Spark's
``initMode='k-means||'`` is the distributed analog of k-means++ (parallel
oversampling instead of sequential seeding — same idea formalized for
clusters; Bahmani et al., VLDB 2012).  Seeded for reproducibility — the
reference is unseeded, which SURVEY §7.4.3 flags as a deliberate fix.

The fitted model is broadcast by ``model.transform`` — cluster assignment of
a streaming micro-batch is a map-side op, no shuffle (used by the online
path, SURVEY §3.2 stage 4).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans, KMeansModel
from pyspark.sql import DataFrame


def fit_kmeans(
    df: DataFrame,
    features_col: str = "features",
    k: int = 10,
    seed: int = 42,
    prediction_col: str = "cluster",
    max_iter: int = 10,
) -> KMeansModel:
    # the reference runs sklearn with n_init=1 — a single restart, rough
    # convergence accepted; 10 Lloyd iterations matches that bar and halves
    # the fit's job count vs the Spark default of 20
    return KMeans(
        k=k,
        seed=seed,
        initMode="k-means||",
        maxIter=max_iter,
        featuresCol=features_col,
        predictionCol=prediction_col,
    ).fit(df)


def assign_clusters(model: KMeansModel, df: DataFrame) -> DataFrame:
    """M4§: cluster assignment (`km.predict`, `guessLike_u_like.py:111`)."""
    return model.transform(df)
