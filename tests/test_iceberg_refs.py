"""Iceberg snapshot references — branches, tags, WRITE-AUDIT-PUBLISH
(round 15, VERDICT r14 next-round #5; iceberg.apache.org/spec/
#snapshot-references):

- a branch write commits a real snapshot but moves only the branch
  ref; main's current-snapshot-id is untouched until
  `fast_forward_iceberg` publishes (O(1) pointer move, no new
  snapshot);
- tags are immutable labels; ref-referenced snapshots survive
  expiration regardless of age/count;
- `cherry_pick_iceberg` publishes a staged APPEND by manifest union
  without moving the branch; double-publish and non-append picks
  refuse loudly;
- ancestry is tracked via the spec's per-snapshot
  ``parent-snapshot-id``, so a diverged main refuses fast-forward.
"""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (
    _prev_state,
    cherry_pick_iceberg,
    create_ref_iceberg,
    delete_where_iceberg,
    drop_ref_iceberg,
    expire_snapshots_iceberg,
    fast_forward_iceberg,
    read_iceberg_table,
    write_iceberg,
)

SCH = "id long, v string"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestWriteAuditPublish:
    def test_branch_write_leaves_main_untouched(self, spark,
                                                tmp_path):
        tbl = str(tmp_path / "t")
        write_iceberg(spark.createDataFrame([(1, "a")], SCH), tbl)
        r = write_iceberg(spark.createDataFrame([(2, "b")], SCH),
                          tbl, branch="audit")
        assert r["snapshot_id"] == 2
        assert _rows(read_iceberg_table(spark, tbl)) == [(1, "a")]
        assert _rows(read_iceberg_table(spark, tbl,
                                        branch="audit")) == [
            (1, "a"), (2, "b")]
        st = _prev_state(tbl)
        assert st["current"] == 1
        assert st["refs"]["audit"] == {"snapshot_id": 2,
                                       "type": "branch"}
        # parent chain: branch commit's parent is the fork point
        assert st["snapshot_parents"][2] == 1

    def test_publish_fast_forward(self, spark, tmp_path):
        tbl = str(tmp_path / "t")
        write_iceberg(spark.createDataFrame([(1, "a")], SCH), tbl)
        create_ref_iceberg(tbl, "pre", kind="tag")
        write_iceberg(spark.createDataFrame([(2, "b")], SCH), tbl,
                      branch="staging")
        write_iceberg(spark.createDataFrame([(3, "c")], SCH), tbl,
                      branch="staging")
        ff = fast_forward_iceberg(tbl, "staging")
        st = _prev_state(tbl)
        # the publish moved the POINTER; no new snapshot was written
        assert st["current"] == ff["snapshot_id"] == 3
        assert _rows(read_iceberg_table(spark, tbl)) == [
            (1, "a"), (2, "b"), (3, "c")]
        # the tag still addresses the pre-publish state; time travel
        # to the fork point is intact
        assert _rows(read_iceberg_table(spark, tbl,
                                        branch="pre")) == [(1, "a")]
        assert _rows(read_iceberg_table(spark, tbl,
                                        snapshot_id=1)) == [(1, "a")]
        # publishing again is a no-op
        assert fast_forward_iceberg(tbl, "staging")["skipped"]

    def test_diverged_main_refuses_fast_forward(self, spark,
                                                tmp_path):
        tbl = str(tmp_path / "t")
        write_iceberg(spark.createDataFrame([(1, "a")], SCH), tbl)
        write_iceberg(spark.createDataFrame([(2, "b")], SCH), tbl,
                      branch="staging")
        # main advances independently → histories diverge
        write_iceberg(spark.createDataFrame([(9, "z")], SCH), tbl)
        with pytest.raises(ValueError, match="not an ancestor"):
            fast_forward_iceberg(tbl, "staging")

    def test_tag_is_immutable(self, spark, tmp_path):
        tbl = str(tmp_path / "t")
        write_iceberg(spark.createDataFrame([(1, "a")], SCH), tbl)
        create_ref_iceberg(tbl, "v1", kind="tag")
        with pytest.raises(ValueError, match="tag"):
            write_iceberg(spark.createDataFrame([(2, "b")], SCH),
                          tbl, branch="v1")
        with pytest.raises(ValueError, match="no such branch"):
            fast_forward_iceberg(tbl, "v1")

    def test_refs_survive_main_dml(self, spark, tmp_path):
        tbl = str(tmp_path / "t")
        write_iceberg(spark.createDataFrame([(1, "a"), (2, "b")],
                                            SCH), tbl)
        create_ref_iceberg(tbl, "keep", kind="tag")
        delete_where_iceberg(spark, tbl, "id = 1")
        st = _prev_state(tbl)
        assert "keep" in st["refs"]
        assert _rows(read_iceberg_table(spark, tbl,
                                        branch="keep")) == [
            (1, "a"), (2, "b")]


class TestCherryPick:
    def test_pick_append_onto_main(self, spark, tmp_path):
        tbl = str(tmp_path / "t")
        write_iceberg(spark.createDataFrame([(1, "a")], SCH), tbl)
        r = write_iceberg(spark.createDataFrame([(2, "b")], SCH),
                          tbl, branch="fix")
        cp = cherry_pick_iceberg(tbl, r["snapshot_id"])
        assert cp["n_manifests_picked"] == 1
        assert _rows(read_iceberg_table(spark, tbl)) == [
            (1, "a"), (2, "b")]
        # double publish refused
        with pytest.raises(ValueError, match="already published"):
            cherry_pick_iceberg(tbl, r["snapshot_id"])

    def test_non_append_refused(self, spark, tmp_path):
        tbl = str(tmp_path / "t")
        write_iceberg(spark.createDataFrame([(1, "a")], SCH), tbl)
        r = write_iceberg(spark.createDataFrame([(2, "b")], SCH),
                          tbl, branch="fix", mode="overwrite")
        with pytest.raises(ValueError, match="append snapshots only"):
            cherry_pick_iceberg(tbl, r["snapshot_id"])


class TestRefLifecycle:
    def test_create_drop_and_reserved_main(self, spark, tmp_path):
        tbl = str(tmp_path / "t")
        write_iceberg(spark.createDataFrame([(1, "a")], SCH), tbl)
        with pytest.raises(ValueError, match="main"):
            create_ref_iceberg(tbl, "main")
        create_ref_iceberg(tbl, "b1")
        with pytest.raises(ValueError, match="already exists"):
            create_ref_iceberg(tbl, "b1")
        drop_ref_iceberg(tbl, "b1")
        with pytest.raises(ValueError, match="no such ref"):
            drop_ref_iceberg(tbl, "b1")

    def test_refs_protect_from_expiration(self, spark, tmp_path):
        tbl = str(tmp_path / "t")
        for k in range(3):
            write_iceberg(spark.createDataFrame([(k, "x")], SCH), tbl)
        create_ref_iceberg(tbl, "old", kind="tag", snapshot_id=1)
        expire_snapshots_iceberg(tbl, retain_last=1)
        st = _prev_state(tbl)
        assert sorted(st["snapshots"]) == [1, 3]
        assert _rows(read_iceberg_table(spark, tbl,
                                        branch="old")) == [(0, "x")]
        # dropping the ref releases the snapshot
        drop_ref_iceberg(tbl, "old")
        expire_snapshots_iceberg(tbl, retain_last=1)
        assert sorted(_prev_state(tbl)["snapshots"]) == [3]


class TestSqlWapFrontDoor:
    """Round 15: the reference-procedure SQL spellings — ALTER TABLE
    CREATE/DROP BRANCH|TAG, CALL fast_forward / cherry_pick, and the
    quoted ``VERSION AS OF 'ref'`` audit read (quote-parity guarded:
    the phrase inside a string literal stays data)."""

    def test_lifecycle_through_sql(self, spark, tmp_path):
        from hainan_big_data_recommend_system_spark.sources.sql_dml import (  # noqa: E501
            run_dml,
            run_query,
        )

        cat: dict = {}
        run_dml(spark,
                "CREATE TABLE t (id BIGINT, v STRING) USING iceberg",
                cat, base_dir=str(tmp_path))
        run_dml(spark, "INSERT INTO t VALUES (1, 'a')", cat)
        run_dml(spark, "ALTER TABLE t CREATE TAG pre", cat)
        write_iceberg(spark.createDataFrame([(2, "b")], SCH),
                      cat["t"], branch="staging")
        assert _rows(run_query(spark, "SELECT * FROM t", cat)) == [
            (1, "a")]
        assert _rows(run_query(
            spark, "SELECT * FROM t VERSION AS OF 'staging'",
            cat)) == [(1, "a"), (2, "b")]
        run_dml(spark, "CALL fast_forward(t, 'staging')", cat)
        assert _rows(run_query(spark, "SELECT * FROM t", cat)) == [
            (1, "a"), (2, "b")]
        assert _rows(run_query(
            spark, "SELECT * FROM t VERSION AS OF 'pre'", cat)) == [
            (1, "a")]
        # a literal containing the phrase is DATA
        got = run_query(
            spark, "SELECT 't VERSION AS OF ''pre''' AS s",
            cat).collect()
        assert got[0]["s"] == "t VERSION AS OF 'pre'"
        run_dml(spark, "ALTER TABLE t DROP TAG pre", cat)
        with pytest.raises(ValueError, match="no such ref"):
            run_query(spark,
                      "SELECT * FROM t VERSION AS OF 'pre'",
                      cat).collect()

    def test_cherry_pick_call_and_delta_refusals(self, spark,
                                                 tmp_path):
        from hainan_big_data_recommend_system_spark.sources.sql_dml import (  # noqa: E501
            run_dml,
            run_query,
        )

        cat: dict = {}
        run_dml(spark,
                "CREATE TABLE t (id BIGINT, v STRING) USING iceberg",
                cat, base_dir=str(tmp_path / "i"))
        run_dml(spark, "INSERT INTO t VALUES (1, 'a')", cat)
        r = write_iceberg(spark.createDataFrame([(9, "z")], SCH),
                          cat["t"], branch="fix")
        run_dml(spark,
                f"CALL cherry_pick(t, {r['snapshot_id']})", cat)
        assert _rows(run_query(spark, "SELECT * FROM t", cat)) == [
            (1, "a"), (9, "z")]
        run_dml(spark, "CREATE TABLE d (id BIGINT) USING delta", cat,
                base_dir=str(tmp_path / "d"))
        run_dml(spark, "INSERT INTO d VALUES (1)", cat)
        for stmt in ("ALTER TABLE d CREATE BRANCH b",
                     "ALTER TABLE d DROP BRANCH b",
                     "CALL fast_forward(d, 'b')"):
            with pytest.raises(ValueError, match="[Ii]ceberg"):
                run_dml(spark, stmt, cat)
        with pytest.raises(ValueError, match="delta"):
            run_query(spark,
                      "SELECT * FROM d VERSION AS OF 'b'",
                      cat).collect()


class TestBranchDml:
    """Round 15 follow-up: the DML half of write-audit-publish —
    UPDATE and DELETE stage against the branch head (position deletes
    and restaged files land on the branch's file set), main is
    untouched until the publish, and the parent chain stays linear so
    fast-forward still applies."""

    def test_full_dml_wap_cycle(self, spark, tmp_path):
        from hainan_big_data_recommend_system_spark.sources.iceberg_sink import (  # noqa: E501
            update_where_iceberg,
        )

        tbl = str(tmp_path / "t")
        write_iceberg(spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], SCH), tbl)
        write_iceberg(spark.createDataFrame([(4, "d")], SCH), tbl,
                      branch="wap")
        update_where_iceberg(spark, tbl, "id = 2", {"v": "'B'"},
                             branch="wap")
        delete_where_iceberg(spark, tbl, "id = 1", branch="wap")
        # main never moved; the branch carries the whole DML batch
        assert _rows(read_iceberg_table(spark, tbl)) == [
            (1, "a"), (2, "b"), (3, "c")]
        assert _rows(read_iceberg_table(spark, tbl,
                                        branch="wap")) == [
            (2, "B"), (3, "c"), (4, "d")]
        st = _prev_state(tbl)
        assert st["current"] == 1
        ff = fast_forward_iceberg(tbl, "wap")
        assert _rows(read_iceberg_table(spark, tbl)) == [
            (2, "B"), (3, "c"), (4, "d")]
        # linear ancestry through the staged chain
        st = _prev_state(tbl)
        assert st["snapshot_parents"] == {2: 1, 3: 2, 4: 3}
        assert ff["snapshot_id"] == 4

    def test_branch_dml_does_not_see_main_tail(self, spark,
                                               tmp_path):
        """Rows appended to MAIN after the fork are invisible to a
        branch DELETE — the scan is the branch head's file set."""
        tbl = str(tmp_path / "t")
        write_iceberg(spark.createDataFrame([(1, "a")], SCH), tbl)
        write_iceberg(spark.createDataFrame([(2, "b")], SCH), tbl,
                      branch="wap")
        write_iceberg(spark.createDataFrame([(9, "z")], SCH), tbl)
        res = delete_where_iceberg(spark, tbl, "id = 9", branch="wap")
        assert res["version"] is None  # no branch row matched
        assert _rows(read_iceberg_table(spark, tbl,
                                        branch="wap")) == [
            (1, "a"), (2, "b")]
        assert _rows(read_iceberg_table(spark, tbl)) == [
            (1, "a"), (9, "z")]
