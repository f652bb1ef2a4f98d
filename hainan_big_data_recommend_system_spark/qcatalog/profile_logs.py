"""Profile & log-layer queries (SURVEY.md §2.1 S5–S10, §2.3 J3, §2.4 A5,
§2.6 O4, §2.7 E-ops, §2.8 F17–F19).

The reference's user-profile build (`guessLike_u_like.py:39-69`), daily-log
extraction (`log_analyze.py:21-62`) and pub/sub payload handling
(`guessLike_u_like.py:179-188`) re-expressed as Catalyst plans over the
driver tables (orders ≈ collect events, events ≈ log/stream records).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..functions.text import ids_csv, squash_spaces
from ..operators.hot import hot_items
from ..operators.logparse import parse_log_lines, user_book_sets
from ..operators.sampling import sample_k_per_group
from ..operators.topk import topk_per_group
from . import register, register_extra


# ---------------------------------------------------------------------------
# J3 + A1 + F7 — per-user profile document: concat the docs of the user's
# collected items (reference `simility_books.py:22-28` applied per user at
# `guessLike_u_like.py:67`; unknown ids drop via the inner join)
# ---------------------------------------------------------------------------

@register(
    "user_profiles",
    """
    SELECT o_custkey,
           trim(regexp_replace(
               string_agg(p_name, ' ' ORDER BY l_partkey, l_orderkey, l_linenumber),
               ' +', ' ', 'g')) AS profile_doc
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY o_custkey
    """,
)
def q_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    joined = o.join(l, o.o_orderkey == l.l_orderkey, "inner").join(
        F.broadcast(p), l.l_partkey == p.p_partkey, "inner"
    )
    ordered = F.struct("l_partkey", "l_orderkey", "l_linenumber", "p_name")
    doc = F.concat_ws(
        " ",
        F.transform(F.sort_array(F.collect_list(ordered)), lambda s: s["p_name"]),
    )
    return (
        joined.groupBy("o_custkey")
        .agg(doc.alias("__doc"))
        .select("o_custkey", squash_spaces(F.col("__doc")).alias("profile_doc"))
    )


# ---------------------------------------------------------------------------
# S5/S6 + A5 + E2/E3 — robust delimited-log parse with malformed rows
# (reference `log_analyze.py:21-37,47-51`); log lines synthesized
# deterministically from `events` so both engines parse identical input
# ---------------------------------------------------------------------------

_LINE_SQL = """
        SELECT CASE
            WHEN event_id % 19 = 0 THEN CAST(user_id AS VARCHAR)
            WHEN event_id % 13 = 0 THEN printf('%d,f1,f2,f3,f4,garbage', user_id)
            WHEN event_id % 17 = 0 THEN printf('%d,f1,f2,f3,f4,0', user_id)
            ELSE printf('%d,f1,f2,f3,f4,%d', user_id, event_id % 97)
        END AS line
        FROM events
"""


def _synth_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    line = (
        F.when(
            F.col("event_id") % 19 == 0, F.col("user_id").cast("string")
        )
        .when(
            F.col("event_id") % 13 == 0,
            F.format_string("%d,f1,f2,f3,f4,garbage", F.col("user_id")),
        )
        .when(
            F.col("event_id") % 17 == 0,
            F.format_string("%d,f1,f2,f3,f4,0", F.col("user_id")),
        )
        .otherwise(
            F.format_string(
                "%d,f1,f2,f3,f4,%d", F.col("user_id"), F.col("event_id") % 97
            )
        )
    )
    return ev.select(line.alias("line"))


@register(
    "robust_log_parse",
    f"""
    WITH lines AS ({_LINE_SQL}),
    parsed AS (
        SELECT TRY_CAST(parts[1] AS BIGINT) AS userId,
               TRY_CAST(parts[len(parts)] AS BIGINT) AS bookId,
               len(parts) AS nf
        FROM (SELECT string_split(line, ',') AS parts FROM lines)
    ),
    clean AS (
        SELECT DISTINCT userId, bookId FROM parsed
        WHERE nf >= 6 AND userId IS NOT NULL AND bookId IS NOT NULL AND bookId > 0
    )
    SELECT userId,
           string_agg(CAST(bookId AS VARCHAR), ',' ORDER BY bookId) AS books_csv,
           count(*) AS n_books
    FROM clean GROUP BY userId
    """,
)
def q_robust_log_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _synth_lines(spark, sf_dir)
    parsed = parse_log_lines(lines, "line", min_fields=6).distinct()
    sets = user_book_sets(parsed)
    return sets.select(
        "userId",
        ids_csv(F.col("books")).alias("books_csv"),
        F.size("books").cast("bigint").alias("n_books"),
    )


# ---------------------------------------------------------------------------
# O4 — seeded reproducible sample: 5 pseudo-random orders per customer
# (reference `random.sample`, `guessLike_u_like.py:126` / `log_analyze.py:57`
#  — unseeded there; deterministic md5 ranking here, SURVEY §7.4.3)
# ---------------------------------------------------------------------------

@register_extra(
    "seeded_sample_orders",
    """
    SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY md5('42:' || CAST(o_orderkey AS VARCHAR)), o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 5
    """,
)
def q_seeded_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    out = sample_k_per_group(o, ["o_custkey"], F.col("o_orderkey"), k=5, seed="42")
    return out.withColumn("rn", F.col("rn").cast("long"))


# ---------------------------------------------------------------------------
# P7 + P8 + E1 — semi-join membership then anti-join vs the hot list
# (reference membership filters `guessLike_u_like.py:109,126`)
# ---------------------------------------------------------------------------

@register_extra(  # demoted rotation #10 (r12): facet coverage rides driver rows
    "semi_anti_parts",
    """
    WITH hot AS (
        SELECT l_partkey FROM (
            SELECT l_partkey, count(*) AS cnt FROM lineitem
            GROUP BY l_partkey ORDER BY cnt DESC, l_partkey LIMIT 30
        )
    )
    SELECT p_partkey, p_name FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p_partkey)
      AND p_partkey NOT IN (SELECT l_partkey FROM hot)
    """,
)
def q_semi_anti_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    hot = hot_items(li, "l_partkey", n=30).select("l_partkey")
    seen = part.join(li, part.p_partkey == li.l_partkey, "left_semi")
    return seen.join(hot, seen.p_partkey == hot.l_partkey, "left_anti")


# ---------------------------------------------------------------------------
# S10 + F18 + F19 + T5 — event payload deserialization, channel dispatch,
# KV key formatting (reference `guessLike_u_like.py:185-188,212`; `from_json`
# replaces the reference's `eval` — code-exec hazard not reproduced)
# ---------------------------------------------------------------------------

@register_extra(
    "events_json_kv",
    """
    SELECT event_id, user_id, event_type,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           -- TRY_CAST mirrors Spark's null-on-failure cast: a non-integral
           -- payload must yield NULL in both engines, not crash the oracle
           printf('%s:%d', event_type, user_id) AS kv_key
    FROM events
    WHERE event_type IN ('click', 'view') AND user_id > 0
    """,
)
def q_events_json_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "view") & (F.col("user_id") > 0))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
            F.format_string("%s:%d", F.col("event_type"), F.col("user_id")).alias(
                "kv_key"
            ),
        )
    )


# ---------------------------------------------------------------------------
# S7 + F17 — date-partition pruning: "yesterday's" log relative to the data's
# max date (reference `log_analyze.py:42-47` — path
# /home/docker/logs/%Y/%m/%d/book.log resolved from now()-1d)
# ---------------------------------------------------------------------------

@register_extra(  # demoted rotation #9 (r11): facet coverage rides driver rows
    "yesterday_events",
    """
    SELECT event_id, user_id, event_type,
           CAST(ts AS DATE) AS dt,
           strftime(CAST(ts AS DATE), '%Y/%m/%d') AS log_path
    FROM events
    WHERE CAST(ts AS DATE) =
          (SELECT max(CAST(ts AS DATE)) FROM events) - INTERVAL 1 DAY
    """,
)
def q_yesterday_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("dt", F.to_date("ts"))
    maxd = ev.agg(F.max("dt").alias("__maxd"))
    return (
        ev.crossJoin(F.broadcast(maxd))
        .filter(F.col("dt") == F.date_sub(F.col("__maxd"), 1))
        .select(
            "event_id",
            "user_id",
            "event_type",
            "dt",
            F.date_format("dt", "yyyy/MM/dd").alias("log_path"),
        )
    )


# ---------------------------------------------------------------------------
# J1 chain — multi-dim broadcast join: revenue per region
# (generalizes the reference's fact⋈dim join `simility_books.py:37`)
# ---------------------------------------------------------------------------

@register_extra(
    "region_revenue",
    """
    SELECT r_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(cents).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# E — relational set ops (INTERSECT / EXCEPT; not present in the reference,
# free in Spark — SURVEY §2.7)
# ---------------------------------------------------------------------------

@register_extra(
    "user_set_ops",
    """
    SELECT uid, src FROM (
        SELECT user_id AS uid, 'both' AS src
        FROM (SELECT user_id FROM events INTERSECT SELECT o_custkey FROM orders)
        UNION ALL
        SELECT user_id AS uid, 'events_only' AS src
        FROM (SELECT user_id FROM events EXCEPT SELECT o_custkey FROM orders)
    )
    """,
)
def q_user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("uid")
    )
    both = ev.intersect(o).withColumn("src", F.lit("both"))
    only = ev.subtract(o).withColumn("src", F.lit("events_only"))
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# W3 + O3 + F5 + F19 — KV sink payload: 3 most recent orders per customer as
# a CSV id list under a formatted key (reference `guessLike_u_like.py:203-213`)
# ---------------------------------------------------------------------------

@register_extra(  # demoted rotation #9 (r11): facet coverage rides driver rows
    "recent_orders_kv",
    """
    SELECT printf('u_similar:%d', o_custkey) AS kv_key,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS ids_csv
    FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    GROUP BY o_custkey
    """,
)
def q_recent_orders_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    top = topk_per_group(
        o, ["o_custkey"], [F.desc("o_orderdate"), F.asc("o_orderkey")], k=3
    )
    ordered = F.struct("rn", "o_orderkey")
    return top.groupBy("o_custkey").agg(
        F.format_string("u_similar:%d", F.col("o_custkey")).alias("kv_key"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(ordered)),
                lambda s: s["o_orderkey"].cast("string"),
            ),
        ).alias("ids_csv"),
    ).select("kv_key", "ids_csv")


_JSONL_LINE_SQL = """
        SELECT CASE WHEN doc_id % 13 = 0
               THEN substr(line, 1, length(line) - 8)
               ELSE line END AS line
        FROM (
            SELECT doc_id,
                   '{"doc_id": ' || CAST(doc_id AS VARCHAR)
                   || ', "text": "' || text
                   || '", "lang": "' || lang
                   || '", "source": "' || source || '"}' AS line
            FROM documents
        )
"""


@register_extra(
    "jsonl_corpus_scan",
    f"""
    WITH lines AS ({_JSONL_LINE_SQL}),
    parsed AS (
        SELECT line,
               CASE WHEN json_valid(line)
                    THEN CAST(json_extract_string(line, '$.doc_id') AS BIGINT)
                    END AS doc_id,
               CASE WHEN json_valid(line)
                    THEN json_extract_string(line, '$.text') END AS text,
               CASE WHEN json_valid(line)
                    THEN json_extract_string(line, '$.lang') END AS lang,
               CASE WHEN json_valid(line)
                    THEN json_extract_string(line, '$.source') END AS source
        FROM lines
    )
    SELECT doc_id, text, lang, source,
           CAST(CASE WHEN doc_id IS NOT NULL AND text IS NOT NULL
                THEN 1 ELSE 0 END AS BIGINT) AS ok,
           CASE WHEN doc_id IS NOT NULL AND text IS NOT NULL THEN NULL
                ELSE line END AS quarantined_line
    FROM parsed
    """,
)
def q_jsonl_corpus_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-tolerant JSONL corpus source (operators/logparse.
    parse_jsonl_corpus): documents serialized to JSON lines with 1/13
    deterministically truncated — the multi-TB-crawl reality — parsed
    back via PERMISSIVE from_json; good rows round-trip, bad rows emit
    ok=0 with the raw line quarantined.  The oracle builds byte-identical
    lines and parses them with DuckDB's JSON functions."""
    from ..operators.logparse import parse_jsonl_corpus

    docs = load_table(spark, sf_dir, "documents")
    line = F.concat(
        F.lit('{"doc_id": '), F.col("doc_id").cast("string"),
        F.lit(', "text": "'), F.col("text"),
        F.lit('", "lang": "'), F.col("lang"),
        F.lit('", "source": "'), F.col("source"), F.lit('"}'),
    )
    lines = docs.select(
        F.when(
            F.col("doc_id") % 13 == 0,
            F.substring(line, 1, F.length(line) - 8),
        )
        .otherwise(line)
        .alias("line")
    )
    return parse_jsonl_corpus(lines, "line")
