"""Delta-protocol TABLE SINK — the write half of the lake surface.

The engine reads Delta tables (operators/deltalog.py resolves the log,
qcatalog/filescan.py scans only log-live files); this module WRITES
them, Spark-first and transactional:

1. data files: the DataFrame writes real parquet via Spark into a
   staging directory, then each part file moves into the table root
   under a versioned name; per-file ``numRecords`` comes from the
   repo's own footer reader (operators/parquetfmt.py) — the sink
   dogfoods the decode surface it ships;
2. the commit: a ``_delta_log/{version:020d}.json`` of protocol /
   metaData / add (/ remove for overwrites) actions, CLAIMED with the
   put-if-absent discipline real Delta requires — the commit file is
   ``os.link``-ed into place, which fails atomically if another writer
   claimed the version first (POSIX link(2) is the local-FS analogue
   of the object-store conditional put; the loser re-reads the log and
   retries with the next version);
3. ``metaData.schemaString`` is the DataFrame's OWN Spark schema JSON
   — which is exactly what Delta stores there, so the parity is
   genuine, not simulated;
4. every ``checkpoint_interval`` commits the sink writes a real
   checkpoint parquet + ``_last_checkpoint`` (operators/deltalog.py),
   so readers replay O(tail) instead of O(log).

``mode="append"`` adds files; ``mode="overwrite"`` additionally emits
removes for every file live in the snapshot the writer read — the
read-modify-claim window is exactly what the put-if-absent rename
protects.

Public knowledge: delta-io PROTOCOL.md (commit files, actions,
checkpoints, optimistic concurrency).  Reference parity: the reference
overwrites csv/pickle outputs in place (data_clean.py); versioned
transactional output is its lake-scale replacement.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame

from ..operators.deltalog import (
    make_checkpoint_parquet,
    make_commit,
    make_last_checkpoint,
    replay_delta_log,
)


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_delta_log")


def _commit_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"{version:020d}.json")


def read_log_commits(table_dir: str) -> list[str]:
    """The ordered JSON commit contents (version 0..N, gap-free)."""
    ld = _log_dir(table_dir)
    if not os.path.isdir(ld):
        return []
    versions = sorted(
        int(f[:-5]) for f in os.listdir(ld)
        if f.endswith(".json") and f[:-5].isdigit()
    )
    if versions != list(range(len(versions))):
        raise ValueError(f"delta log has version gaps: {versions}")
    return [
        open(_commit_path(table_dir, v), encoding="utf-8").read()
        for v in versions
    ]


def snapshot(table_dir: str) -> dict:
    """Current replay state of an on-disk table (empty-table shape for
    a missing log)."""
    commits = read_log_commits(table_dir)
    if not commits:
        return {"version": -1, "live": {}, "n_live": 0, "live_rows": 0}
    return replay_delta_log(commits)


def _file_stats(footer_meta: dict) -> str:
    """``add.stats`` JSON (PROTOCOL.md "Per-file Statistics") from the
    hand-parsed footer: numRecords always; minValues/maxValues for
    every INT64 column whose chunk statistics cover ALL row groups —
    a partial min is not a file min, so partially-covered columns are
    omitted rather than guessed.  These are the data-skipping inputs
    `prune_live_files` consumes: at scale, a key-clustered table
    answers a narrow range scan by opening a handful of files."""
    n_rgs = footer_meta["n_row_groups"]
    per_col: dict[str, list[tuple[int, int]]] = {}
    for st in footer_meta["int64_stats"]:
        per_col.setdefault(st["col"], []).append((st["min"], st["max"]))
    mins = {c: min(m for m, _ in v) for c, v in per_col.items()
            if len(v) == n_rgs}
    maxs = {c: max(m for _, m in v) for c, v in per_col.items()
            if len(v) == n_rgs}
    stats: dict = {"numRecords": footer_meta["n_rows"]}
    if mins:
        stats["minValues"] = dict(sorted(mins.items()))
        stats["maxValues"] = dict(sorted(maxs.items()))
    return json.dumps(stats, sort_keys=True, separators=(",", ":"))


def _stage_data_files(
    df: DataFrame,
    table_dir: str,
    token: str,
    partition_by: list[str] | None = None,
) -> list[dict]:
    """Write ``df`` as parquet into a staging dir, move each part into
    the table root under a token-versioned name (Hive-style
    ``col=value/`` subdirs when partitioned), and return add-action
    bodies with per-file numRecords + data-skipping stats from the
    hand footer reader and ``partitionValues`` parsed back from the
    directory layout — exactly what Delta stores on the add action
    (the partition columns themselves are NOT in the data files;
    readers re-attach them from partitionValues)."""
    from urllib.parse import unquote

    from ..operators.parquetfmt import parse_footer_tail, read_footer_tail

    stage = os.path.join(table_dir, f".stage-{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(stage)
    parts: list[str] = []  # stage-relative paths
    for root, _dirs, fnames in os.walk(stage):
        rel_root = os.path.relpath(root, stage)
        for f in fnames:
            if f.startswith("part-") and f.endswith(".parquet"):
                parts.append(
                    f if rel_root == "." else os.path.join(rel_root, f)
                )
    parts.sort()
    if not parts:
        raise ValueError("write produced no parquet part files")
    adds = []
    for i, relf in enumerate(parts):
        pvals: dict[str, str] = {}
        comps = relf.split(os.sep)[:-1]
        for comp in comps:
            if "=" not in comp:
                raise ValueError(
                    f"staged file under non-partition dir {comp!r}"
                )
            k, _, v = comp.partition("=")
            pvals[unquote(k)] = unquote(v)
        if set(pvals) != set(partition_by or []):
            raise ValueError(
                f"staged partition dirs {sorted(pvals)} disagree with "
                f"partition_by {sorted(partition_by or [])}"
            )
        name = os.path.join(*comps, f"part-{token}-{i:05d}.parquet") \
            if comps else f"part-{token}-{i:05d}.parquet"
        src = os.path.join(stage, relf)
        with open(src, "rb") as fh:
            fh.seek(0, 2)
            flen = fh.tell()

            def _fetch(off, ln, _fh=fh):
                _fh.seek(off)
                return _fh.read(ln)

            meta = parse_footer_tail(read_footer_tail(_fetch, flen))
        dest = os.path.join(table_dir, name)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.replace(src, dest)
        adds.append({"path": name.replace(os.sep, "/"), "size": flen,
                     "numRecords": meta["n_rows"],
                     "partitionValues": pvals,
                     "stats": _file_stats(meta)})
    shutil.rmtree(stage, ignore_errors=True)
    return adds


def _claim_version(table_dir: str, version: int, body: str,
                   token: str) -> bool:
    """Put-if-absent commit claim: link(2) fails atomically if another
    writer claimed this version first (the local-FS analogue of the
    object-store conditional put PROTOCOL.md requires)."""
    tmp = _commit_path(table_dir, version) + f".tmp-{token}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(body)
    try:
        os.link(tmp, _commit_path(table_dir, version))
    except FileExistsError:
        os.unlink(tmp)
        return False
    os.unlink(tmp)
    return True


def _maybe_checkpoint(table_dir: str, version: int,
                      checkpoint_interval: int) -> None:
    if not checkpoint_interval or (version + 1) % checkpoint_interval:
        return
    state = replay_delta_log(read_log_commits(table_dir))
    ck = make_checkpoint_parquet(state)
    ck_path = os.path.join(
        _log_dir(table_dir), f"{version:020d}.checkpoint.parquet"
    )
    with open(ck_path + ".tmp", "wb") as fh:
        fh.write(ck)
    os.replace(ck_path + ".tmp", ck_path)
    with open(
        os.path.join(_log_dir(table_dir), "_last_checkpoint"),
        "w", encoding="utf-8",
    ) as fh:
        fh.write(make_last_checkpoint(version, len(ck)))


def write_delta(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    checkpoint_interval: int = 10,
    max_retries: int = 10,
    partition_by: list[str] | None = None,
    txn: tuple[str, int] | None = None,
) -> dict:
    """Commit ``df`` to the table.  Returns ``{version, n_files,
    n_records, n_removed}``.  Retries version claims on conflict
    (another writer committed first) up to ``max_retries`` times —
    the data files are written ONCE; only the log claim retries.
    ``partition_by`` writes Hive-layout partition dirs and stamps
    ``add.partitionValues`` + ``metaData.partitionColumns`` (Delta's
    partitioned-table shape; the partition columns live on the add
    actions, not in the data files).

    ``txn=(appId, version)`` makes the commit IDEMPOTENT (PROTOCOL.md
    "Transaction Identifiers"): if the snapshot already records this
    appId at >= version, the write is a no-op returning
    ``{"version": None, "skipped": True}`` — exactly-once semantics
    for streaming foreachBatch writers, whose batches redeliver on
    restart.  The check runs BEFORE staging and again inside every
    claim retry, so a concurrent duplicate writer cannot double-apply
    a batch; a skip discovered after staging unlinks the orphaned
    data files (they were never referenced by any commit)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported write mode {mode!r}")

    def _txn_done(snap: dict) -> bool:
        return (
            txn is not None
            and snap.get("app_versions", {}).get(txn[0], -(1 << 62))
            >= txn[1]
        )

    if _txn_done(snapshot(table_dir)):
        return {"version": None, "skipped": True, "n_files": 0,
                "n_records": 0, "n_removed": 0}
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    token = uuid.uuid4().hex[:12]
    adds = _stage_data_files(df, table_dir, token,
                             partition_by=partition_by)

    schema_string = df.schema.json()
    for _ in range(max_retries):
        snap = snapshot(table_dir)
        if _txn_done(snap):  # a duplicate writer beat us to the claim
            for a in adds:
                try:
                    os.unlink(os.path.join(table_dir, a["path"]))
                except OSError:
                    pass
            return {"version": None, "skipped": True, "n_files": 0,
                    "n_records": 0, "n_removed": 0}
        version = snap["version"] + 1
        acts: list[dict] = []
        if version == 0:
            acts.append({"protocol": {"minReaderVersion": 1,
                                      "minWriterVersion": 2}})
        acts.append({"metaData": {
            "id": str(uuid.uuid5(uuid.NAMESPACE_URL, table_dir)),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": list(partition_by or []),
        }})
        removed = []
        if mode == "overwrite":
            removed = sorted(snap["live"])
            acts.extend(
                {"remove": {"path": p, "dataChange": True}}
                for p in removed
            )
        acts.extend(
            {"add": {**a, "dataChange": True}}
            for a in adds
        )
        if txn is not None:
            acts.append({"txn": {"appId": txn[0], "version": txn[1]}})
        acts.append({"commitInfo": {
            "operation": "WRITE", "mode": mode,
        }})
        if not _claim_version(table_dir, version, make_commit(acts),
                              token):
            continue  # lost the race: re-read the log, retry
        _maybe_checkpoint(table_dir, version, checkpoint_interval)
        return {"version": version, "n_files": len(adds),
                "n_records": sum(a["numRecords"] for a in adds),
                "n_removed": len(removed)}
    raise ValueError(
        f"lost {max_retries} version claims in a row; giving up"
    )


def optimize_delta(
    spark,
    table_dir: str,
    small_file_bytes: int = 32 * 1024 * 1024,
    target_partitions: int = 1,
    checkpoint_interval: int = 10,
    max_retries: int = 10,
) -> dict:
    """OPTIMIZE: bin-pack live files smaller than ``small_file_bytes``
    into ``target_partitions`` rewritten files, committed as adds +
    removes with ``dataChange: false`` — the table's ROWS are
    untouched, only its file geometry changes (delta-io OPTIMIZE
    semantics).  Small files are the scale killer a streaming or
    many-writer table accretes (every task opens are O(files), not
    O(bytes)); compaction restores scan efficiency without a reader
    ever seeing a row-level change.  Rewritten files get fresh
    footer-derived stats, so data skipping keeps working.

    Conflict discipline: the rewrite happens ONCE; the commit claim
    retries, but if a concurrent writer REMOVED one of the source
    files first the compaction aborts (its rewrite would resurrect
    dead rows) — the same logical-conflict rule delta-io applies.

    Returns ``{version, n_compacted, n_files, n_records}``;
    no-op (too few small files) returns ``{"version": None,
    "n_compacted": 0, ...}``."""
    snap = snapshot(table_dir)
    small = sorted(
        p for p, (sz, _) in snap["live"].items() if sz < small_file_bytes
    )
    pv = snap.get("partition_values", {})
    partitioned = [p for p in small if pv.get(p)]
    if partitioned:
        raise ValueError(
            "optimize of partitioned tables must compact per partition "
            f"— not implemented (files: {partitioned[:3]})"
        )
    if len(small) <= target_partitions:
        return {"version": None, "n_compacted": 0, "n_files": 0,
                "n_records": 0}
    df = spark.read.parquet(
        *[os.path.join(table_dir, p) for p in small]
    ).repartition(target_partitions)
    token = uuid.uuid4().hex[:12]
    adds = _stage_data_files(df, table_dir, token)
    for _ in range(max_retries):
        cur = snapshot(table_dir)
        gone = [p for p in small if p not in cur["live"]]
        if gone:
            raise ValueError(
                f"optimize conflict: source files removed concurrently "
                f"({gone[:3]}...)" if len(gone) > 3 else
                f"optimize conflict: source files removed concurrently "
                f"({gone})"
            )
        version = cur["version"] + 1
        acts = (
            [{"remove": {"path": p, "dataChange": False}} for p in small]
            + [{"add": {**a, "dataChange": False}}
               for a in adds]
            + [{"commitInfo": {"operation": "OPTIMIZE",
                               "numRemovedFiles": len(small),
                               "numAddedFiles": len(adds)}}]
        )
        if _claim_version(table_dir, version, make_commit(acts), token):
            _maybe_checkpoint(table_dir, version, checkpoint_interval)
            return {"version": version, "n_compacted": len(small),
                    "n_files": len(adds),
                    "n_records": sum(a["numRecords"] for a in adds)}
    raise ValueError(
        f"lost {max_retries} version claims in a row; giving up"
    )


def delete_where_delta(
    spark,
    table_dir: str,
    condition: str,
    inline_threshold: int = 512,
    checkpoint_interval: int = 10,
    max_retries: int = 10,
) -> dict:
    """DELETE WHERE — without rewriting a single data file.

    Rows matching the Spark SQL ``condition`` are tombstoned by
    DELETION VECTORS (PROTOCOL.md "Deletion Vectors"): one distributed
    scan finds matching row positions via the parquet reader's
    ``_metadata.row_index`` (predicate and column pruning apply — the
    scan reads only the condition's columns), the positions serialize
    into the repo's own roaring-bitmap DV codec
    (operators/deltalog.py, operators/roaring.py), and each affected
    file RE-ADDS with the new descriptor — merged with any existing DV
    (a DV supersedes, so it must carry the old dead rows too), stats
    and partitionValues re-stamped.  Small DVs inline into the log as
    z85 (storageType ``i``); larger ones share one ``.bin`` sidecar
    per commit (storageType ``p``, offset per file, CRC-32 verified on
    read).  At 100 TB this is the difference between a DELETE that
    touches gigabytes of bitmaps and one that rewrites terabytes of
    parquet.

    Returns ``{version, n_files_touched, n_rows_deleted}``
    (``version None`` when nothing matched)."""
    from pyspark.sql import functions as F

    from ..operators.deltalog import (
        make_deletion_vector,
        make_dv_descriptor_inline,
        make_dv_file,
        resolve_deletion_vector,
    )

    snap = snapshot(table_dir)
    if not snap["live"]:
        return {"version": None, "n_files_touched": 0,
                "n_rows_deleted": 0}
    paths = sorted(snap["live"])
    abs_to_rel = {
        "file:" + os.path.abspath(os.path.join(table_dir, p)): p
        for p in paths
    }
    df = spark.read.parquet(
        *[os.path.join(table_dir, p) for p in paths]
    )
    pv = snap.get("partition_values", {})
    part_cols = sorted({c for v in pv.values() for c in v})
    if part_cols:
        # partition columns live on the add actions, not in the files;
        # re-attach them so the condition can reference them
        maps = {
            c: F.create_map(*[
                x for p in paths
                for x in (F.lit("file:" + os.path.abspath(
                    os.path.join(table_dir, p))),
                    F.lit(pv.get(p, {}).get(c)))
            ])
            for c in part_cols
        }
        for c in part_cols:
            df = df.withColumn(
                c, maps[c][F.col("_metadata.file_path")]
            )
    matched = (
        df.filter(condition)
        .groupBy(F.col("_metadata.file_path").alias("fp"))
        .agg(F.sort_array(F.collect_list(
            F.col("_metadata.row_index"))).alias("pos"))
        .collect()
    )
    if not matched:
        return {"version": None, "n_files_touched": 0,
                "n_rows_deleted": 0}
    old_dvs = snap.get("deletion_vectors", {})
    fstats = snap.get("file_stats", {})

    def fetch(path: str) -> bytes:
        return open(os.path.join(table_dir, path), "rb").read()

    token = uuid.uuid4().hex[:12]
    new_positions: dict[str, list[int]] = {}
    n_deleted = 0
    for row in matched:
        rel = abs_to_rel.get(row["fp"])
        if rel is None:
            raise ValueError(f"scan returned unknown file {row['fp']!r}")
        pos = [int(x) for x in row["pos"]]
        prior = (
            resolve_deletion_vector(old_dvs[rel], fetch)
            if rel in old_dvs else []
        )
        already = set(prior)
        fresh = [p for p in pos if p not in already]
        n_deleted += len(fresh)
        if not fresh:
            continue  # every matched row was already dead
        new_positions[rel] = sorted(already.union(pos))
    if not new_positions:
        return {"version": None, "n_files_touched": 0,
                "n_rows_deleted": 0}

    descs: dict[str, dict] = {}
    sidecar: list[tuple[str, bytes]] = []
    for rel in sorted(new_positions):
        dv = make_deletion_vector(new_positions[rel])
        if len(dv) <= inline_threshold:
            descs[rel] = make_dv_descriptor_inline(new_positions[rel])
        else:
            sidecar.append((rel, dv))
    if sidecar:
        payload, offsets = make_dv_file([dv for _, dv in sidecar])
        dv_name = f"deletion_vector_{token}.bin"
        with open(os.path.join(table_dir, dv_name), "wb") as fh:
            fh.write(payload)
        for (rel, dv), off in zip(sidecar, offsets):
            descs[rel] = {
                "storageType": "p", "pathOrInlineDv": dv_name,
                "offset": off, "sizeInBytes": len(dv),
                "cardinality": len(new_positions[rel]),
            }

    for _ in range(max_retries):
        cur = snapshot(table_dir)
        stale = [p for p in descs if p not in cur["live"]]
        if stale:
            raise ValueError(
                "delete conflict: files removed concurrently "
                f"({stale[:3]})"
            )
        version = cur["version"] + 1
        acts: list[dict] = []
        for rel in sorted(descs):
            size, rows = cur["live"][rel]
            acts.append({"remove": {"path": rel, "dataChange": True}})
            add = {"path": rel, "size": size, "numRecords": rows,
                   "partitionValues": pv.get(rel, {}),
                   "deletionVector": descs[rel], "dataChange": True}
            if rel in fstats:
                add["stats"] = json.dumps(
                    fstats[rel], sort_keys=True, separators=(",", ":")
                )
            acts.append({"add": add})
        acts.append({"commitInfo": {"operation": "DELETE",
                                    "predicate": condition}})
        if _claim_version(table_dir, version, make_commit(acts), token):
            _maybe_checkpoint(table_dir, version, checkpoint_interval)
            return {"version": version,
                    "n_files_touched": len(descs),
                    "n_rows_deleted": n_deleted}
    raise ValueError(
        f"lost {max_retries} version claims in a row; giving up"
    )


def merge_delta(
    spark,
    source: DataFrame,
    table_dir: str,
    key_cols: list[str],
    inline_threshold: int = 512,
    checkpoint_interval: int = 10,
    max_retries: int = 10,
) -> dict:
    """MERGE (upsert): every source row lands in the table; target
    rows sharing a key are superseded — in ONE atomic commit, without
    rewriting any existing data file.

    The classic upsert decomposes as (a) a distributed key-match scan
    (``_metadata.row_index`` positions of target rows whose key
    appears in the source — the source keys broadcast, so the scan
    reads only the key columns of the target), (b) deletion vectors
    over the matched positions (merged with existing DVs), and (c)
    the source staged as new data files.  All three land in a single
    claimed commit: remove+re-add-with-DV for each touched file, adds
    for the new files, ``commitInfo.operation = "MERGE"`` — a reader
    replays either the whole upsert or none of it.

    Returns ``{version, n_files_touched, n_rows_updated,
    n_files_added, n_records_added}``."""
    from pyspark.sql import functions as F

    from ..operators.deltalog import (
        make_deletion_vector,
        make_dv_descriptor_inline,
        make_dv_file,
        resolve_deletion_vector,
    )

    if not key_cols:
        raise ValueError("merge needs at least one key column")
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    snap = snapshot(table_dir)
    token = uuid.uuid4().hex[:12]
    adds = _stage_data_files(source, table_dir, token)

    descs: dict[str, dict] = {}
    n_updated = 0
    pv = snap.get("partition_values", {})
    fstats = snap.get("file_stats", {})
    if snap["live"]:
        if any(pv.get(p) for p in snap["live"]):
            raise ValueError(
                "merge into partitioned tables is not implemented"
            )
        paths = sorted(snap["live"])
        target = spark.read.parquet(
            *[os.path.join(table_dir, p) for p in paths]
        ).select(
            F.col("_metadata.file_path").alias("__fp"),
            F.col("_metadata.row_index").alias("__ri"),
            *key_cols,
        )
        matched = (
            target.join(
                F.broadcast(source.select(*key_cols).distinct()),
                key_cols, "inner",
            )
            .groupBy("__fp")
            .agg(F.sort_array(F.collect_list("__ri")).alias("pos"))
            .collect()
        )
        abs_to_rel = {
            "file:" + os.path.abspath(os.path.join(table_dir, p)): p
            for p in paths
        }
        old_dvs = snap.get("deletion_vectors", {})

        def fetch(path: str) -> bytes:
            return open(os.path.join(table_dir, path), "rb").read()

        new_positions: dict[str, list[int]] = {}
        for row in matched:
            rel = abs_to_rel.get(row["__fp"])
            if rel is None:
                raise ValueError(
                    f"scan returned unknown file {row['__fp']!r}"
                )
            pos = [int(x) for x in row["pos"]]
            prior = set(
                resolve_deletion_vector(old_dvs[rel], fetch)
                if rel in old_dvs else ()
            )
            fresh = [p for p in pos if p not in prior]
            n_updated += len(fresh)
            if fresh:
                new_positions[rel] = sorted(prior.union(pos))
        sidecar: list[tuple[str, bytes]] = []
        for rel in sorted(new_positions):
            dv = make_deletion_vector(new_positions[rel])
            if len(dv) <= inline_threshold:
                descs[rel] = make_dv_descriptor_inline(
                    new_positions[rel]
                )
            else:
                sidecar.append((rel, dv))
        if sidecar:
            payload, offsets = make_dv_file([dv for _, dv in sidecar])
            dv_name = f"deletion_vector_{token}.bin"
            with open(os.path.join(table_dir, dv_name), "wb") as fh:
                fh.write(payload)
            for (rel, dv), off in zip(sidecar, offsets):
                descs[rel] = {
                    "storageType": "p", "pathOrInlineDv": dv_name,
                    "offset": off, "sizeInBytes": len(dv),
                    "cardinality": len(new_positions[rel]),
                }

    schema_string = source.schema.json()
    for _ in range(max_retries):
        cur = snapshot(table_dir)
        stale = [p for p in descs if p not in cur["live"]]
        if stale:
            raise ValueError(
                f"merge conflict: files removed concurrently ({stale[:3]})"
            )
        version = cur["version"] + 1
        acts: list[dict] = []
        if version == 0:
            acts.append({"protocol": {"minReaderVersion": 1,
                                      "minWriterVersion": 2}})
        acts.append({"metaData": {
            "id": str(uuid.uuid5(uuid.NAMESPACE_URL, table_dir)),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": [],
        }})
        for rel in sorted(descs):
            size, rows = cur["live"][rel]
            acts.append({"remove": {"path": rel, "dataChange": True}})
            add = {"path": rel, "size": size, "numRecords": rows,
                   "partitionValues": {},
                   "deletionVector": descs[rel], "dataChange": True}
            if rel in fstats:
                add["stats"] = json.dumps(
                    fstats[rel], sort_keys=True, separators=(",", ":")
                )
            acts.append({"add": add})
        acts.extend({"add": {**a, "dataChange": True}} for a in adds)
        acts.append({"commitInfo": {"operation": "MERGE",
                                    "matchedOn": key_cols}})
        if _claim_version(table_dir, version, make_commit(acts), token):
            _maybe_checkpoint(table_dir, version, checkpoint_interval)
            return {"version": version,
                    "n_files_touched": len(descs),
                    "n_rows_updated": n_updated,
                    "n_files_added": len(adds),
                    "n_records_added": sum(
                        a["numRecords"] for a in adds)}
    raise ValueError(
        f"lost {max_retries} version claims in a row; giving up"
    )
