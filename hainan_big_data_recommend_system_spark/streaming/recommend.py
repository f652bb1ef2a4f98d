"""Online per-event recommendation (SURVEY.md §3.2, T1–T4).

The reference rebuilds nothing per event — it probes state built once at
startup (`guessLike_u_like.py:165-175`) plus one fresh OLTP lookup
(`:189-204`), then writes two Redis keys with a canned fallback on failure
(`:207-213`).  Spark shape:

- **T2 static state**: model tables built by the batch plans, ``.cache()``d
  and joined against every micro-batch (stream-static join).  Refresh =
  rerun the batch plan, restart the query (or swap via a versioned path).
- **T3 fresh lookup**: the collections table stands in for the OLTP point
  query — in production a CDC-fed table, same join.
- **T4 fallback**: users with no personalized recs get the hot list —
  ``coalesce`` in the join result, not a bare ``except``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..functions.text import ids_csv
from ..operators.hot import hot_items
from ..qcatalog.reco import reco_assembly


@dataclass
class StaticState:
    """T2: startup-built model state, cached for stream-static joins."""

    user_recs: DataFrame  # (uid, rec_ids array<bigint>)
    hot_csv: str  # fallback payload (T4)


def build_static_state(spark: SparkSession, sf_dir: str) -> StaticState:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    # one hot-30 aggregate serves both the CSV fallback payload and (via
    # reco_assembly's own internal hot list) the anti-filter — the list is
    # 30 rows, so the duplicate compute inside reco_assembly is a second
    # full fact groupBy; bounded collect here, reused as a literal
    hot = hot_items(li, "l_partkey", n=30).select("l_partkey")
    hot_ids = [r["l_partkey"] for r in hot.collect()]
    hot_csv = ",".join(str(i) for i in hot_ids)

    recs = (
        reco_assembly(spark, sf_dir, uid_mod=None)
        .groupBy("uid")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rk", "pid"))),
                lambda s: s["pid"],
            ).alias("rec_ids")
        )
        .cache()
    )
    recs.count()  # materialize once at startup, like the reference's model build
    return StaticState(user_recs=recs, hot_csv=hot_csv)


def recommend_batch(batch_df: DataFrame, state: StaticState) -> DataFrame:
    """T1: per-micro-batch recommendation — distinct users in the batch,
    left join to cached recs, hot-list fallback for misses (T4).

    Returns (kv_key, ids_csv) rows, the S12 sink payload
    (`'b_like:%s' % uid`, `guessLike_u_like.py:212`).
    """
    users = batch_df.select(F.col("user_id").alias("uid")).distinct()
    joined = users.join(state.user_recs, "uid", "left")
    return joined.select(
        F.format_string("b_like:%d", F.col("uid")).alias("kv_key"),
        F.coalesce(
            F.nullif(ids_csv(F.col("rec_ids")), F.lit("")),
            F.lit(state.hot_csv),
        ).alias("ids_csv"),
    )
