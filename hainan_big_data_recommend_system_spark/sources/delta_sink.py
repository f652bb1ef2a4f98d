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


def write_delta(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    checkpoint_interval: int = 10,
    max_retries: int = 10,
) -> dict:
    """Commit ``df`` to the table.  Returns ``{version, n_files,
    n_records, n_removed}``.  Retries version claims on conflict
    (another writer committed first) up to ``max_retries`` times —
    the data files are written ONCE; only the log claim retries."""
    from ..operators.parquetfmt import parse_footer_tail, read_footer_tail

    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported write mode {mode!r}")
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    stage = os.path.join(table_dir, f".stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    parts = sorted(
        f for f in os.listdir(stage)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    if not parts:
        raise ValueError("write produced no parquet part files")
    token = uuid.uuid4().hex[:12]
    adds = []
    for i, f in enumerate(parts):
        name = f"part-{token}-{i:05d}.parquet"
        src = os.path.join(stage, f)
        with open(src, "rb") as fh:
            fh.seek(0, 2)
            flen = fh.tell()

            def _fetch(off, ln, _fh=fh):
                _fh.seek(off)
                return _fh.read(ln)

            meta = parse_footer_tail(read_footer_tail(_fetch, flen))
        os.replace(src, os.path.join(table_dir, name))
        adds.append({"path": name, "size": flen,
                     "numRecords": meta["n_rows"],
                     "stats": _file_stats(meta)})
    shutil.rmtree(stage, ignore_errors=True)

    schema_string = df.schema.json()
    for _ in range(max_retries):
        snap = snapshot(table_dir)
        version = snap["version"] + 1
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
        removed = []
        if mode == "overwrite":
            removed = sorted(snap["live"])
            acts.extend(
                {"remove": {"path": p, "dataChange": True}}
                for p in removed
            )
        acts.extend(
            {"add": {**a, "partitionValues": {}, "dataChange": True}}
            for a in adds
        )
        acts.append({"commitInfo": {
            "operation": "WRITE", "mode": mode,
        }})
        body = make_commit(acts)
        tmp = _commit_path(table_dir, version) + f".tmp-{token}"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(body)
        try:
            # put-if-absent: link(2) fails with EEXIST if another
            # writer claimed this version — the optimistic-concurrency
            # primitive PROTOCOL.md requires of a commit store
            os.link(tmp, _commit_path(table_dir, version))
        except FileExistsError:
            os.unlink(tmp)
            continue  # lost the race: re-read the log, retry
        os.unlink(tmp)
        if checkpoint_interval and (version + 1) % checkpoint_interval == 0:
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
        return {"version": version, "n_files": len(adds),
                "n_records": sum(a["numRecords"] for a in adds),
                "n_removed": len(removed)}
    raise ValueError(
        f"lost {max_retries} version claims in a row; giving up"
    )
