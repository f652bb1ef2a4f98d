"""Iceberg-protocol TABLE SINK — the write half of lake format #2.

The engine reads Iceberg tables by walking the metadata tree
(operators/iceberg.py: version file → manifest list → manifests); this
module WRITES that tree, Spark-first and transactional, mirroring the
Delta sink's discipline (sources/delta_sink.py) on the OTHER commit
model — Iceberg swaps an immutable metadata-file POINTER instead of
appending a log entry:

1. data files: the DataFrame writes real parquet via Spark into a
   staging directory, then each part moves under ``data/``; per-file
   ``record_count`` comes from the repo's own footer reader
   (operators/parquetfmt.py) — the sink dogfoods its decode surface;
2. metadata blobs: a new manifest Avro (ADDED entries for this
   commit's files) and a new manifest-list Avro, written with
   unique names — immutable, conflict-free by construction;
3. **manifest reuse**: an append's manifest list carries the previous
   snapshot's manifest entries VERBATIM plus one new manifest — the
   metadata written per commit is O(files added), not O(table).  This
   is Iceberg's core scaling property (a 100 TB table has millions of
   files; rewriting its whole file list per commit would dwarf the
   data write) and the sink preserves it.  An overwrite instead emits
   a DELETED-entries manifest for every live file plus the ADDED
   manifest, dropping all prior manifests;
4. the commit: ``metadata/v{N}.metadata.json`` claimed put-if-absent
   via atomic ``os.link`` (the local-FS analogue of the catalog's
   compare-and-swap pointer update; the loser re-reads the tree and
   retries on a fresh version), then ``version-hint.text`` is updated
   best-effort — exactly the HadoopTableOperations layout;
5. sequence numbers are v2-spec: each snapshot gets
   ``last-sequence-number + 1``, stamped on its manifest-list entry,
   so the positional-delete sequencing rule keeps working on tables
   this sink wrote.

Public knowledge: iceberg.apache.org/spec/ (metadata versioning,
manifest lists, sequence numbers, HadoopCatalog file layout).
Reference parity: the reference overwrites csv/pickle outputs in place
(data_clean.py:153); versioned snapshot commits are the lake-scale
replacement, here in both major table formats.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame

from ..operators.iceberg import (
    make_manifest,
    make_manifest_list,
    make_table_metadata,
    snapshot_live_files,
)

_VERSION_RE = re.compile(r"^v(\d+)\.metadata\.json$")


def _meta_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "metadata")


def current_version(table_dir: str) -> int:
    """Highest committed metadata version, -1 for an empty table.
    The scan is authoritative; ``version-hint.text`` is only a hint
    (it is updated after the claim, so it can lag by one)."""
    md = _meta_dir(table_dir)
    if not os.path.isdir(md):
        return -1
    versions = [
        int(m.group(1))
        for f in os.listdir(md)
        if (m := _VERSION_RE.match(f))
    ]
    return max(versions, default=-1)


def read_table(table_dir: str, snapshot_id: int | None = None) -> dict:
    """Resolve the table's current (or time-traveled) snapshot through
    the standard tree walk.  Empty-table shape when nothing committed."""
    v = current_version(table_dir)
    if v < 0:
        return {"snapshot_id": None, "live": {}, "n_live": 0,
                "live_rows": 0}
    meta_text = open(
        os.path.join(_meta_dir(table_dir), f"v{v}.metadata.json"),
        encoding="utf-8",
    ).read()

    def fetch(path: str) -> bytes:
        return open(os.path.join(table_dir, path), "rb").read()

    return snapshot_live_files(meta_text, fetch, snapshot_id=snapshot_id)


def _prev_state(table_dir: str) -> dict:
    """What the claim loop needs from the current tree: version,
    snapshot pointer map, the current snapshot's manifest-list entries
    (for reuse) and live files (for overwrite removes), and the max
    sequence number."""
    from ..operators.avrocf import parse_avro

    v = current_version(table_dir)
    if v < 0:
        return {"version": -1, "snapshots": {}, "current": None,
                "manifest_entries": [], "live": {}, "partition_values": {},
                "last_seq": 0}
    md = os.path.join(_meta_dir(table_dir), f"v{v}.metadata.json")
    meta_text = open(md, encoding="utf-8").read()

    def fetch(path: str) -> bytes:
        return open(os.path.join(table_dir, path), "rb").read()

    from ..operators.iceberg import parse_table_metadata

    meta = parse_table_metadata(meta_text)
    ml_path = meta["snapshots"][meta["current_snapshot_id"]]
    entries = parse_avro(fetch(ml_path))["records"]
    snap = snapshot_live_files(meta_text, fetch)
    return {
        "version": v,
        "snapshots": dict(meta["snapshots"]),
        "current": meta["current_snapshot_id"],
        "manifest_entries": entries,
        "live": snap["live"],
        "partition_values": snap["partition_values"],
        "last_seq": max(
            (e.get("sequence_number", 0) or 0 for e in entries),
            default=0,
        ),
    }


def write_iceberg(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    max_retries: int = 10,
) -> dict:
    """Commit ``df`` as a new snapshot.  Returns ``{version,
    snapshot_id, n_files, n_records, n_removed, n_manifests_reused}``.
    Data files and manifest blobs are written ONCE; only the
    metadata-pointer claim retries on conflict."""
    from ..operators.parquetfmt import parse_footer_tail, read_footer_tail

    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported write mode {mode!r}")
    os.makedirs(_meta_dir(table_dir), exist_ok=True)
    os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)

    stage = os.path.join(table_dir, f".stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    parts = sorted(
        f for f in os.listdir(stage)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    if not parts:
        raise ValueError("write produced no parquet part files")
    token = uuid.uuid4().hex[:12]
    adds: list[dict] = []
    for i, f in enumerate(parts):
        rel = f"data/part-{token}-{i:05d}.parquet"
        src = os.path.join(stage, f)
        with open(src, "rb") as fh:
            fh.seek(0, 2)
            flen = fh.tell()

            def _fetch(off, ln, _fh=fh):
                _fh.seek(off)
                return _fh.read(ln)

            meta = parse_footer_tail(read_footer_tail(_fetch, flen))
        os.replace(src, os.path.join(table_dir, rel))
        adds.append({"file_path": rel, "file_size": flen,
                     "record_count": meta["n_rows"]})
    shutil.rmtree(stage, ignore_errors=True)

    md = _meta_dir(table_dir)
    for _ in range(max_retries):
        prev = _prev_state(table_dir)
        version = prev["version"] + 1
        sid = (max(prev["snapshots"], default=0)) + 1
        seq = prev["last_seq"] + 1

        added_manifest = make_manifest(
            [{"status": 1, "snapshot_id": sid, **a} for a in adds]
        )
        blobs: dict[str, bytes] = {
            f"metadata/m-{token}-{version}-add.avro": added_manifest
        }

        def ml_entry(path: str, blob: bytes, n_add=0, n_exist=0,
                     n_del=0) -> dict:
            return {"manifest_path": path, "manifest_length": len(blob),
                    "sequence_number": seq, "added_snapshot_id": sid,
                    "added_files_count": n_add,
                    "existing_files_count": n_exist,
                    "deleted_files_count": n_del}

        entries: list[dict] = []
        removed = 0
        reused = 0
        if mode == "append":
            # manifest REUSE: prior manifests ride along untouched —
            # their sequence numbers and counts are already correct
            entries.extend(dict(e) for e in prev["manifest_entries"])
            reused = len(entries)
        else:
            live = prev["live"]
            removed = len(live)
            if live:
                pv = prev["partition_values"]
                del_manifest = make_manifest([
                    {"status": 2, "snapshot_id": sid, "file_path": p,
                     "record_count": rows, "file_size": size,
                     "partition": pv.get(p)}
                    for p, (size, rows) in sorted(live.items())
                ])
                del_path = f"metadata/m-{token}-{version}-del.avro"
                blobs[del_path] = del_manifest
                entries.append(
                    ml_entry(del_path, del_manifest, n_del=removed)
                )
        add_path = f"metadata/m-{token}-{version}-add.avro"
        entries.append(
            ml_entry(add_path, added_manifest, n_add=len(adds))
        )
        ml_blob = make_manifest_list(entries)
        ml_path = f"metadata/ml-{token}-{version}.avro"
        blobs[ml_path] = ml_blob
        for rel, blob in blobs.items():
            with open(os.path.join(table_dir, rel), "wb") as fh:
                fh.write(blob)

        snapshots = {**prev["snapshots"], sid: ml_path}
        meta_text = make_table_metadata(snapshots, current=sid)
        final = os.path.join(md, f"v{version}.metadata.json")
        tmp = final + f".tmp-{token}"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(meta_text)
        try:
            # put-if-absent: the catalog pointer swap.  link(2) fails
            # EEXIST if another writer claimed this version first.
            os.link(tmp, final)
        except FileExistsError:
            os.unlink(tmp)
            for rel in blobs:  # this attempt's blobs are dead weight
                try:
                    os.unlink(os.path.join(table_dir, rel))
                except OSError:
                    pass
            continue  # lost the race: re-read the tree, retry
        os.unlink(tmp)
        hint = os.path.join(md, "version-hint.text")
        with open(hint + f".tmp-{token}", "w", encoding="utf-8") as fh:
            fh.write(str(version))
        os.replace(hint + f".tmp-{token}", hint)
        return {"version": version, "snapshot_id": sid,
                "n_files": len(adds),
                "n_records": sum(a["record_count"] for a in adds),
                "n_removed": removed, "n_manifests_reused": reused}
    raise ValueError(
        f"lost {max_retries} version claims in a row; giving up"
    )
