"""Conditional MERGE clauses on both sinks (round 13, VERDICT r12
What's missing #2 / next-round #4):

- ``WHEN MATCHED [AND cond] THEN DELETE`` / ``UPDATE``,
  ``WHEN NOT MATCHED [AND cond] THEN INSERT`` (Delta),
  ``WHEN NOT MATCHED BY SOURCE THEN DELETE`` — on both sinks,
  reusing the DV / position-delete machinery;
- the CDC-apply equivalence the verdict pins: an
  `orders_cdc_apply`-shaped event batch (upserts + terminal deletes)
  applied through ONE merge call yields exactly the state the
  relational compaction (`operators/cdc.cdc_apply`) computes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hainan_big_data_recommend_system_spark.operators.cdc import cdc_apply
from hainan_big_data_recommend_system_spark.operators.deltalog import (
    resolve_deletion_vector,
)
from hainan_big_data_recommend_system_spark.sources import delta_sink
from hainan_big_data_recommend_system_spark.sources.delta_sink import (
    merge_delta,
    snapshot,
    write_delta,
)
from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
    merge_iceberg,
    read_table,
    write_iceberg,
)


def _delta_live(spark, tbl, cols):
    snap = snapshot(tbl)
    if not snap["live"]:
        return []

    def fetch(p):
        return open(os.path.join(tbl, p), "rb").read()

    dead = {
        delta_sink._abs_uri(tbl, p): set(resolve_deletion_vector(d, fetch))
        for p, d in snap.get("deletion_vectors", {}).items()
    }
    df = (
        spark.read.parquet(
            *[os.path.join(tbl, p) for p in sorted(snap["live"])]
        )
        .withColumn("__fp", F.col("_metadata.file_path"))
        .withColumn("__ri", F.col("_metadata.row_index"))
    )
    return sorted(
        tuple(r[c] for c in cols)
        for r in df.collect()
        if r["__ri"] not in dead.get(r["__fp"], ())
    )


def _iceberg_live(spark, tbl, cols):
    from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
        _alive_rows_with_positions,
        _prev_state,
    )

    prev = _prev_state(tbl)
    if not prev["live"]:
        return []
    rows = _alive_rows_with_positions(spark, tbl, prev)
    return sorted(tuple(r[c] for c in cols) for r in rows.collect())


BASE = [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)]
SCHEMA = "id long, name string, qty long"
# CDC batch: update 2, delete 3, insert 5, delete-for-absent-key 9
EVENTS = [
    (2, "B", 200, "U"),
    (3, None, None, "D"),
    (5, "e", 50, "I"),
    (9, None, None, "D"),
]
EV_SCHEMA = "id long, name string, qty long, _op string"
WANT = [(1, "a", 10), (2, "B", 200), (4, "d", 40), (5, "e", 50)]


class TestDeltaClauses:
    def test_cdc_apply_through_one_merge(self, spark, tmp_path):
        tbl = str(tmp_path / "cdc")
        write_delta(spark.createDataFrame(BASE, SCHEMA), tbl)
        events = spark.createDataFrame(EVENTS, EV_SCHEMA)
        res = merge_delta(
            spark, events, tbl, key_cols=["id"],
            matched_delete="_op = 'delete' OR _op = 'D'",
            not_matched_insert="_op NOT IN ('delete', 'D')",
        )
        assert res["n_rows_updated"] == 1   # id 2 superseded
        assert res["n_rows_deleted"] == 1   # id 3; id 9 was absent
        got = _delta_live(spark, tbl, ["id", "name", "qty"])
        assert got == WANT

    def test_equals_relational_cdc_apply(self, spark, tmp_path):
        """The verdict's equivalence pin: ONE merge call == cdc_apply
        over base-as-inserts + events."""
        tbl = str(tmp_path / "cdc_eq")
        write_delta(spark.createDataFrame(BASE, SCHEMA), tbl)
        events = spark.createDataFrame(EVENTS, EV_SCHEMA)
        merge_delta(
            spark, events, tbl, key_cols=["id"],
            matched_delete="_op = 'D'",
            not_matched_insert="_op <> 'D'",
        )
        changelog = (
            spark.createDataFrame(BASE, SCHEMA)
            .select("id", "name", "qty", F.lit("I").alias("_op"),
                    F.lit(0).alias("_seq"))
            .unionByName(
                spark.createDataFrame(EVENTS, EV_SCHEMA)
                .withColumn("_seq", F.lit(1)))
        )
        want = sorted(
            (r["id"], r["name"], r["qty"])
            for r in cdc_apply(changelog, ["id"], "_seq", "_op")
            .collect()
        )
        assert _delta_live(spark, tbl, ["id", "name", "qty"]) == want

    def test_matched_update_condition(self, spark, tmp_path):
        tbl = str(tmp_path / "upd_cond")
        write_delta(spark.createDataFrame(BASE, SCHEMA), tbl)
        src = spark.createDataFrame(
            [(1, "A", 100, True), (2, "B", 200, False)],
            "id long, name string, qty long, apply boolean",
        )
        res = merge_delta(spark, src, tbl, key_cols=["id"],
                          matched_update="apply")
        assert res["n_rows_updated"] == 1
        got = _delta_live(spark, tbl, ["id", "name", "qty"])
        # id 1 updated; id 2 untouched (its condition failed)
        assert got == [(1, "A", 100), (2, "b", 20), (3, "c", 30),
                       (4, "d", 40)]

    def test_not_matched_by_source_delete(self, spark, tmp_path):
        tbl = str(tmp_path / "nmbs")
        write_delta(spark.createDataFrame(BASE, SCHEMA), tbl)
        src = spark.createDataFrame([(1, "A", 100)], SCHEMA)
        res = merge_delta(
            spark, src, tbl, key_cols=["id"],
            not_matched_by_source_delete="qty >= 30",
        )
        assert res["n_rows_updated"] == 1   # id 1
        assert res["n_rows_deleted"] == 2   # ids 3, 4 (qty 30, 40)
        got = _delta_live(spark, tbl, ["id", "name", "qty"])
        assert got == [(1, "A", 100), (2, "b", 20)]

    def test_conflicting_clause_routing_rejected(self, spark, tmp_path):
        tbl = str(tmp_path / "dupkey")
        write_delta(spark.createDataFrame(BASE, SCHEMA), tbl)
        src = spark.createDataFrame(
            [(2, "x", 1, "D"), (2, "y", 2, "U")], EV_SCHEMA)
        with pytest.raises(ValueError, match="clause conflict"):
            merge_delta(spark, src, tbl, key_cols=["id"],
                        matched_delete="_op = 'D'")

    def test_cdf_records_clause_changes(self, spark, tmp_path):
        from hainan_big_data_recommend_system_spark.sources.delta_sink import (
            read_changes,
        )

        tbl = str(tmp_path / "cdc_cdf")
        write_delta(spark.createDataFrame(BASE, SCHEMA), tbl)
        events = spark.createDataFrame(EVENTS, EV_SCHEMA)
        merge_delta(spark, events, tbl, key_cols=["id"],
                    matched_delete="_op = 'D'",
                    not_matched_insert="_op <> 'D'")
        feed = read_changes(spark, tbl, 0, 1)
        by_type = {
            r["_change_type"]: r["id"] for r in feed.collect()
        }
        kinds = sorted(
            r["_change_type"] for r in feed.collect()
        )
        assert kinds == ["delete", "insert", "update_postimage",
                         "update_preimage"]
        assert by_type["delete"] == 3
        assert by_type["insert"] == 5

    def test_no_clauses_still_pure_upsert(self, spark, tmp_path):
        tbl = str(tmp_path / "plain")
        write_delta(spark.createDataFrame(BASE, SCHEMA), tbl)
        src = spark.createDataFrame([(2, "B", 200), (5, "e", 50)],
                                    SCHEMA)
        res = merge_delta(spark, src, tbl, key_cols=["id"])
        assert res["n_rows_updated"] == 1
        assert res["n_rows_deleted"] == 0
        got = _delta_live(spark, tbl, ["id", "name", "qty"])
        assert got == [(1, "a", 10), (2, "B", 200), (3, "c", 30),
                       (4, "d", 40), (5, "e", 50)]


class TestMatchedSet:
    def test_per_column_assignments(self, spark, tmp_path):
        tbl = str(tmp_path / "mset")
        write_delta(spark.createDataFrame(BASE, SCHEMA), tbl)
        src = spark.createDataFrame(
            [(1, "ignored", 5), (2, "ignored", 7)], SCHEMA)
        res = merge_delta(
            spark, src, tbl, key_cols=["id"],
            matched_set={"qty": "t.qty + s.qty"},
            not_matched_insert="false",
        )
        assert res["n_rows_updated"] == 2
        got = _delta_live(spark, tbl, ["id", "name", "qty"])
        # qty accumulates; name keeps the TARGET value (SQL UPDATE)
        assert got == [(1, "a", 15), (2, "b", 27), (3, "c", 30),
                       (4, "d", 40)]

    def test_assigning_key_refused(self, spark, tmp_path):
        tbl = str(tmp_path / "msetk")
        write_delta(spark.createDataFrame(BASE, SCHEMA), tbl)
        src = spark.createDataFrame([(1, "x", 1)], SCHEMA)
        with pytest.raises(ValueError, match="merge keys"):
            merge_delta(spark, src, tbl, key_cols=["id"],
                        matched_set={"id": "s.id + 1"})

    def test_duplicate_update_keys_refused(self, spark, tmp_path):
        tbl = str(tmp_path / "msetd")
        write_delta(spark.createDataFrame(BASE, SCHEMA), tbl)
        src = spark.createDataFrame(
            [(1, "x", 1), (1, "y", 2)], SCHEMA)
        with pytest.raises(ValueError, match="ONE update row"):
            merge_delta(spark, src, tbl, key_cols=["id"],
                        matched_set={"qty": "s.qty"},
                        not_matched_insert="false")

    def test_iceberg_refuses_matched_set(self, spark, tmp_path):
        tbl = str(tmp_path / "mseti")
        write_iceberg(spark.createDataFrame(BASE, SCHEMA), tbl)
        src = spark.createDataFrame([(1, "x", 1)], SCHEMA)
        with pytest.raises(ValueError, match="O\\(source\\)"):
            merge_iceberg(spark, src, tbl, key_cols=["id"],
                          matched_set={"qty": "s.qty"})

    def test_sql_statement_with_set_assignments(self, spark, tmp_path):
        from hainan_big_data_recommend_system_spark.sources.sql_dml import (
            run_dml,
        )

        tbl = str(tmp_path / "msetq")
        write_delta(spark.createDataFrame(BASE, SCHEMA), tbl)
        ev = spark.createDataFrame([(2, "B", 100), (9, "new", 1)],
                                   SCHEMA)
        run_dml(
            spark,
            "MERGE INTO t AS tgt USING ev AS e ON tgt.id = e.id "
            "WHEN MATCHED THEN UPDATE SET qty = tgt.qty + e.qty, "
            "name = upper(e.name) "
            "WHEN NOT MATCHED THEN INSERT *",
            {"t": tbl}, sources={"ev": ev},
        )
        got = _delta_live(spark, tbl, ["id", "name", "qty"])
        assert got == [(1, "a", 10), (2, "B", 120), (3, "c", 30),
                       (4, "d", 40), (9, "new", 1)]


class TestNmbsConcurrencyGuard:
    def test_concurrent_append_aborts_nmbs_merge(self, spark, tmp_path,
                                                 monkeypatch):
        """A concurrent append between the NMBS scan and the claim is
        WRITE SKEW (the appended rows escaped the key-absence delete
        decision) — the merge must abort, not commit."""
        tbl = str(tmp_path / "nmbs_race")
        write_delta(spark.createDataFrame(BASE, SCHEMA), tbl)
        src = spark.createDataFrame([(1, "A", 100)], SCHEMA)

        real_claim = delta_sink._claim_version
        fired = {"done": False}

        def racing_claim(table_dir, version, body, token):
            if not fired["done"]:
                fired["done"] = True
                # a concurrent writer lands an append FIRST
                write_delta(
                    spark.createDataFrame([(99, "late", 35)], SCHEMA),
                    tbl)
            return real_claim(table_dir, version, body, token)

        monkeypatch.setattr(delta_sink, "_claim_version", racing_claim)
        with pytest.raises(ValueError, match="whole table"):
            merge_delta(spark, src, tbl, key_cols=["id"],
                        not_matched_by_source_delete="qty >= 30")
        # nothing committed by the merge: the late row is intact and
        # no NMBS delete applied
        got = _delta_live(spark, tbl, ["id", "name", "qty"])
        assert (99, "late", 35) in got
        assert (3, "c", 30) in got

    def test_concurrent_append_aborts_iceberg_nmbs(self, spark,
                                                   tmp_path,
                                                   monkeypatch):
        from hainan_big_data_recommend_system_spark.sources import (
            iceberg_sink,
        )

        tbl = str(tmp_path / "inmbs_race")
        write_iceberg(spark.createDataFrame(BASE, SCHEMA), tbl)
        src = spark.createDataFrame([(1, "A", 100)], SCHEMA)

        real_claim = iceberg_sink._claim_metadata
        fired = {"done": False}

        def racing_claim(table_dir, version, meta_text, token, blobs):
            if not fired["done"]:
                fired["done"] = True
                write_iceberg(
                    spark.createDataFrame([(99, "late", 35)], SCHEMA),
                    tbl)
            return real_claim(table_dir, version, meta_text, token,
                              blobs)

        monkeypatch.setattr(iceberg_sink, "_claim_metadata",
                            racing_claim)
        with pytest.raises(ValueError, match="NOT MATCHED BY SOURCE"):
            merge_iceberg(spark, src, tbl, key_cols=["id"],
                          not_matched_by_source_delete="qty >= 30")
        got = _iceberg_live(spark, tbl, ["id", "name", "qty"])
        assert (99, "late", 35) in got
        assert (3, "c", 30) in got


class TestIcebergClauses:
    def test_cdc_apply_through_one_merge(self, spark, tmp_path):
        tbl = str(tmp_path / "icdc")
        write_iceberg(spark.createDataFrame(BASE, SCHEMA), tbl)
        events = spark.createDataFrame(EVENTS, EV_SCHEMA)
        res = merge_iceberg(
            spark, events, tbl, key_cols=["id"],
            matched_delete="_op = 'D'",
        )
        assert res["version"] is not None
        got = _iceberg_live(spark, tbl, ["id", "name", "qty"])
        assert got == WANT
        # the staged files carry the TABLE schema, not _op
        st = read_table(tbl)
        assert "_op" not in [
            f.name for f in spark.read.parquet(
                *[os.path.join(tbl, p) for p in sorted(st["live"])]
            ).schema.fields
        ]

    def test_delete_only_batch(self, spark, tmp_path):
        tbl = str(tmp_path / "idel")
        write_iceberg(spark.createDataFrame(BASE, SCHEMA), tbl)
        events = spark.createDataFrame(
            [(1, None, None, "D"), (4, None, None, "D")], EV_SCHEMA)
        res = merge_iceberg(spark, events, tbl, key_cols=["id"],
                            matched_delete="_op = 'D'")
        assert res["version"] is not None
        assert res["n_files_added"] == 0
        got = _iceberg_live(spark, tbl, ["id", "name", "qty"])
        assert got == [(2, "b", 20), (3, "c", 30)]

    def test_not_matched_by_source_delete(self, spark, tmp_path):
        tbl = str(tmp_path / "inmbs")
        write_iceberg(spark.createDataFrame(BASE, SCHEMA), tbl)
        src = spark.createDataFrame([(1, "A", 100)], SCHEMA)
        res = merge_iceberg(
            spark, src, tbl, key_cols=["id"],
            not_matched_by_source_delete="qty >= 30",
        )
        assert res["n_rows_deleted"] == 2
        got = _iceberg_live(spark, tbl, ["id", "name", "qty"])
        assert got == [(1, "A", 100), (2, "b", 20)]

    def test_equals_relational_cdc_apply(self, spark, tmp_path):
        tbl = str(tmp_path / "icdc_eq")
        write_iceberg(spark.createDataFrame(BASE, SCHEMA), tbl)
        events = spark.createDataFrame(EVENTS, EV_SCHEMA)
        merge_iceberg(spark, events, tbl, key_cols=["id"],
                      matched_delete="_op = 'D'")
        changelog = (
            spark.createDataFrame(BASE, SCHEMA)
            .select("id", "name", "qty", F.lit("I").alias("_op"),
                    F.lit(0).alias("_seq"))
            .unionByName(
                spark.createDataFrame(EVENTS, EV_SCHEMA)
                .withColumn("_seq", F.lit(1)))
        )
        want = sorted(
            (r["id"], r["name"], r["qty"])
            for r in cdc_apply(changelog, ["id"], "_seq", "_op")
            .collect()
        )
        assert _iceberg_live(spark, tbl, ["id", "name", "qty"]) == want

    def test_no_clauses_still_pure_upsert(self, spark, tmp_path):
        tbl = str(tmp_path / "iplain")
        write_iceberg(spark.createDataFrame(BASE, SCHEMA), tbl)
        src = spark.createDataFrame([(2, "B", 200), (5, "e", 50)],
                                    SCHEMA)
        res = merge_iceberg(spark, src, tbl, key_cols=["id"])
        assert res["n_delete_keys"] == 2
        got = _iceberg_live(spark, tbl, ["id", "name", "qty"])
        assert got == [(1, "a", 10), (2, "B", 200), (3, "c", 30),
                       (4, "d", 40), (5, "e", 50)]


SCH_TS = "id long, ts long, v string"
BASE_TS = [(1, 10, "old1"), (2, 20, "old2"), (3, 30, "old3")]
SRC_TS = [(1, 15, "newer1"), (2, 5, "stale2"), (9, 1, "ins9")]
# full-ON matched-ness (ADVICE r14 medium): the stale row's only pair
# fails the residual, so it is NOT MATCHED — INSERT * re-inserts it
# beside the untouched original, exactly as Spark/Delta would
WANT_TS = [(1, 15, "newer1"), (2, 5, "stale2"), (2, 20, "old2"),
           (3, 30, "old3"), (9, 1, "ins9")]


class TestNonEquiResidual:
    """Round 14 (VERDICT r13 next-round #6): MERGE ON's non-equi
    conjuncts as a pair-evaluated matched_residual — the standard
    decomposition.  ``ON t.id = s.id AND s.ts > t.ts`` applies only
    NEWER updates.  Matched-ness is judged on the WHOLE ON predicate
    (round 15, ADVICE r14): a stale CDC row is NOT MATCHED, so a bare
    INSERT * re-inserts it — gate with not_matched_insert to drop it."""

    def test_delta_residual_api(self, spark, tmp_path):
        tbl = str(tmp_path / "nr")
        write_delta(spark.createDataFrame(BASE_TS, SCH_TS), tbl)
        merge_delta(spark, spark.createDataFrame(SRC_TS, SCH_TS), tbl,
                    key_cols=["id"], matched_residual="s.ts > t.ts")
        assert _delta_live(spark, tbl, ("id", "ts", "v")) == WANT_TS

    def test_iceberg_residual_needs_opt_in(self, spark, tmp_path):
        tbl = str(tmp_path / "nri")
        write_iceberg(spark.createDataFrame(BASE_TS, SCH_TS), tbl)
        src = spark.createDataFrame(SRC_TS, SCH_TS)
        with pytest.raises(ValueError, match="O\\(source\\)"):
            merge_iceberg(spark, src, tbl, key_cols=["id"],
                          matched_residual="s.ts > t.ts")
        merge_iceberg(spark, src, tbl, key_cols=["id"],
                      matched_residual="s.ts > t.ts",
                      accept_target_scan=True)
        from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (  # noqa: E501
            read_iceberg_table,
        )

        got = sorted(tuple(r) for r in
                     read_iceberg_table(spark, tbl).collect())
        assert got == WANT_TS

    def test_sql_statement_both_formats(self, spark, tmp_path):
        from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (  # noqa: E501
            read_iceberg_table,
        )
        from hainan_big_data_recommend_system_spark.sources.sql_dml import (  # noqa: E501
            run_dml,
        )

        stmt = ("MERGE INTO t USING s ON t.id = s.id AND s.ts > t.ts "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *")
        src = spark.createDataFrame(SRC_TS, SCH_TS)
        tbl = str(tmp_path / "sqd")
        write_delta(spark.createDataFrame(BASE_TS, SCH_TS), tbl)
        run_dml(spark, stmt, {"t": tbl}, sources={"s": src})
        assert _delta_live(spark, tbl, ("id", "ts", "v")) == WANT_TS
        tbl = str(tmp_path / "sqi")
        write_iceberg(spark.createDataFrame(BASE_TS, SCH_TS), tbl)
        run_dml(spark, stmt, {"t": tbl}, sources={"s": src},
                fmt="iceberg")
        got = sorted(tuple(r) for r in
                     read_iceberg_table(spark, tbl).collect())
        assert got == WANT_TS

    def test_residual_partial_pass_per_target_row(self, spark,
                                                  tmp_path):
        """Two target rows share a key; the residual passes for one:
        only THAT row is superseded (per-row MATCHED semantics)."""
        tbl = str(tmp_path / "pp")
        write_delta(spark.createDataFrame(
            [(1, 10, "low"), (1, 50, "high")], SCH_TS), tbl)
        merge_delta(spark,
                    spark.createDataFrame([(1, 20, "mid")], SCH_TS),
                    tbl, key_cols=["id"],
                    matched_residual="s.ts > t.ts")
        got = _delta_live(spark, tbl, ("id", "ts", "v"))
        assert got == [(1, 20, "mid"), (1, 50, "high")]

    def test_requires_equi_key(self):
        from hainan_big_data_recommend_system_spark.sources.sql_dml import (  # noqa: E501
            parse_merge,
        )

        with pytest.raises(ValueError, match="equi-key"):
            parse_merge("MERGE INTO t USING s ON t.ts < s.ts "
                        "WHEN MATCHED THEN DELETE")

    def test_residual_with_delete_clause(self, spark, tmp_path):
        """Terminal deletes gate on the residual too: only a NEWER
        delete event tombstones its target row.  The stale delete
        event is NOT MATCHED under full-ON, so the not_matched_insert
        gate (the CDC idiom) keeps it from re-inserting."""
        tbl = str(tmp_path / "rd")
        write_delta(spark.createDataFrame(BASE_TS, SCH_TS), tbl)
        src = spark.createDataFrame(
            [(1, 15, "D"), (2, 5, "D")], SCH_TS)
        merge_delta(spark, src, tbl, key_cols=["id"],
                    matched_delete="v = 'D'",
                    not_matched_insert="v <> 'D'",
                    matched_residual="s.ts > t.ts")
        got = _delta_live(spark, tbl, ("id", "ts", "v"))
        # id=1's delete is newer (applies); id=2's is stale (no-op)
        assert got == [(2, 20, "old2"), (3, 30, "old3")]

    def test_residual_stale_insert_gate(self, spark, tmp_path):
        """An UNGATED merge re-inserts the stale row (full-ON NOT
        MATCHED), while a gated one drops it — both formats."""
        from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (  # noqa: E501
            read_iceberg_table,
        )

        src = spark.createDataFrame([(2, 5, "stale2")], SCH_TS)
        want_gated = [(2, 20, "old2")]
        for fmt in ("delta", "iceberg"):
            for gate, want in ((None, [(2, 5, "stale2"),
                                       (2, 20, "old2")]),
                               ("false", want_gated)):
                tbl = str(tmp_path / f"sg-{fmt}-{gate}")
                base = spark.createDataFrame([(2, 20, "old2")],
                                             SCH_TS)
                if fmt == "delta":
                    write_delta(base, tbl)
                    merge_delta(spark, src, tbl, key_cols=["id"],
                                matched_residual="s.ts > t.ts",
                                not_matched_insert=gate)
                    got = _delta_live(spark, tbl, ("id", "ts", "v"))
                else:
                    write_iceberg(base, tbl)
                    merge_iceberg(spark, src, tbl, key_cols=["id"],
                                  matched_residual="s.ts > t.ts",
                                  not_matched_insert=gate,
                                  accept_target_scan=True)
                    got = sorted(
                        tuple(r) for r in
                        read_iceberg_table(spark, tbl).collect())
                assert got == want, (fmt, gate)

    def test_residual_nmbs_full_on(self, spark, tmp_path):
        """NOT MATCHED BY SOURCE judges the whole ON predicate: a
        target row whose key matches but whose every pair fails the
        residual IS by-source and deletes — both formats."""
        from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (  # noqa: E501
            read_iceberg_table,
        )

        # id=1: passing pair (kept, updated); id=2: key matches but
        # residual fails (DELETED under full-ON); id=3: key absent
        # from source (DELETED, the classic case)
        src = spark.createDataFrame(
            [(1, 15, "newer1"), (2, 5, "stale2")], SCH_TS)
        for fmt in ("delta", "iceberg"):
            tbl = str(tmp_path / f"nmbs-{fmt}")
            base = spark.createDataFrame(BASE_TS, SCH_TS)
            kw = dict(key_cols=["id"],
                      matched_residual="s.ts > t.ts",
                      not_matched_insert="false",
                      not_matched_by_source_delete="true")
            if fmt == "delta":
                write_delta(base, tbl)
                merge_delta(spark, src, tbl, **kw)
                got = _delta_live(spark, tbl, ("id", "ts", "v"))
            else:
                write_iceberg(base, tbl)
                merge_iceberg(spark, src, tbl,
                              accept_target_scan=True, **kw)
                got = sorted(tuple(r) for r in
                             read_iceberg_table(spark, tbl).collect())
            assert got == [(1, 15, "newer1")], fmt


class TestIcebergTargetScanOptIn:
    """Round 14 (VERDICT r13 next-round #9): the refusals stay the
    default; accept_target_scan=True unlocks matched_set and the
    NOT-MATCHED insert gate by paying the scan explicitly, pinned
    equal to the Delta clause merge on the same fixture."""

    def test_matched_set_parity_with_delta(self, spark, tmp_path):
        src = spark.createDataFrame(
            [(1, 5, "s1"), (9, 7, "s9")], SCH_TS)
        dtbl = str(tmp_path / "d")
        write_delta(spark.createDataFrame(BASE_TS, SCH_TS), dtbl)
        merge_delta(spark, src, dtbl, key_cols=["id"],
                    matched_set={"ts": "t.ts + s.ts"})
        want = _delta_live(spark, dtbl, ("id", "ts", "v"))
        itbl = str(tmp_path / "i")
        write_iceberg(spark.createDataFrame(BASE_TS, SCH_TS), itbl)
        merge_iceberg(spark, src, itbl, key_cols=["id"],
                      matched_set={"ts": "t.ts + s.ts"},
                      accept_target_scan=True)
        from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (  # noqa: E501
            read_iceberg_table,
        )

        got = sorted(tuple(r) for r in
                     read_iceberg_table(spark, itbl).collect())
        assert got == want
        assert (1, 15, "old1") in got  # unassigned cols keep target

    def test_insert_gate(self, spark, tmp_path):
        from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (  # noqa: E501
            read_iceberg_table,
        )

        tbl = str(tmp_path / "ig")
        write_iceberg(spark.createDataFrame(BASE_TS, SCH_TS), tbl)
        src = spark.createDataFrame(
            [(8, 1, "keep"), (9, 1, "drop")], SCH_TS)
        merge_iceberg(spark, src, tbl, key_cols=["id"],
                      not_matched_insert="v = 'keep'",
                      accept_target_scan=True)
        got = sorted(r["id"] for r in
                     read_iceberg_table(spark, tbl).collect())
        assert got == [1, 2, 3, 8]

    def test_default_refusals_unchanged(self, spark, tmp_path):
        tbl = str(tmp_path / "rf")
        write_iceberg(spark.createDataFrame(BASE_TS, SCH_TS), tbl)
        src = spark.createDataFrame([(1, 5, "x")], SCH_TS)
        for kw in ({"matched_set": {"v": "s.v"}},
                   {"not_matched_insert": "v <> 'D'"},
                   {"matched_residual": "s.ts > t.ts"}):
            with pytest.raises(ValueError, match="O\\(source\\)"):
                merge_iceberg(spark, src, tbl, key_cols=["id"], **kw)
