"""The reference's online loop closed over LAKE tables (round 13):
``guessLike_u_like.py:179-187`` recomputes a user's recommendations on
every incoming event; at lake scale the event source IS the table's
change feed.  This composes the round's streaming source
(`stream_changes`) with the existing T1–T4 recommend surface:
events land in a Delta table (exactly-once appends), the change feed
drains in micro-batches, each batch's users get recs from the cached
static state with the hot-list fallback, and the KV store converges
to exactly what one batch recompute over all events produces.
"""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    write_delta,
)
from hainan_big_data_recommend_system_spark.streaming.cdf_source import (
    stream_changes,
)
from hainan_big_data_recommend_system_spark.streaming.recommend import (
    build_static_state,
    recommend_batch,
)
from hainan_big_data_recommend_system_spark.streaming.sinks import (
    memory_kv_writer,
)


@pytest.fixture(scope="module")
def state(spark, sf_dir):
    return build_static_state(spark, sf_dir)


def test_online_recommend_over_change_feed(spark, sf_dir, tmp_path,
                                           state):
    from hainan_big_data_recommend_system_spark.catalog import load_table

    events_tbl = str(tmp_path / "events_delta")
    ck = str(tmp_path / "ck")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id").limit(60)
    # two "arrival" commits — two micro-batches on the feed
    write_delta(ev.filter("event_id % 2 = 0"), events_tbl)
    write_delta(ev.filter("event_id % 2 = 1"), events_tbl)

    store: dict = {}
    writer = memory_kv_writer(store)

    def on_batch(df, batch_id):
        writer(recommend_batch(
            df.filter("_change_type = 'insert'"), state), batch_id)

    res = stream_changes(spark, events_tbl, ck, on_batch)
    assert res["n_batches"] == 2

    # convergence: the streamed KV state equals one batch recompute
    want = {
        r["kv_key"]: r["ids_csv"]
        for r in recommend_batch(ev, state).collect()
    }
    assert store == want
    # late events continue the feed incrementally
    more = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id").limit(80).filter("event_id > 0")
    write_delta(more, events_tbl)
    res = stream_changes(spark, events_tbl, ck, on_batch)
    assert res["n_batches"] == 1
    want2 = {
        r["kv_key"]: r["ids_csv"]
        for r in recommend_batch(ev.unionByName(more), state).collect()
    }
    assert store == want2
    # every user got SOMETHING (the T4 fallback guarantees coverage)
    assert all(v for v in store.values())
