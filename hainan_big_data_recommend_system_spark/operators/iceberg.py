"""Iceberg-shaped table-metadata snapshot scan (lake format #2).

Apache Iceberg describes table state as a METADATA TREE, not a replayed
log (the structural contrast to Delta, operators/deltalog.py):

    metadata.json  — table uuid, format-version, snapshot list,
                     current-snapshot-id
    └─ manifest-list (Avro)  — one entry per manifest file with
                               added/existing/deleted counts
       └─ manifest (Avro)    — one entry per data file with a status
                               (0 EXISTING / 1 ADDED / 2 DELETED),
                               path, record count, file size

A reader resolves the CURRENT snapshot from metadata.json, reads its
manifest list, then unions the non-deleted entries of each manifest —
no log replay; time travel = picking a different snapshot id.  This
module implements that walk on top of the repo's own Avro OCF decoder
(operators/avrocf.py) with a fetch callback per path (local file /
ranged GET on an object store).

Scope, honestly: manifests here are FLAT Avro records
``(status int, file_path string, record_count long, file_size long)``
— real Iceberg nests the ``data_file`` struct and adds partition
tuples/column stats; the avrocf decoder is flat-record scoped, so the
nesting is flattened and documented as the deviation.  The resolution
ALGORITHM (version pointer → snapshot → manifest list → manifests →
status filter) is the spec's (iceberg.apache.org/spec/ — public).

ValueError-only decode contract, like every decoder in the fleet.
"""

from __future__ import annotations

import json
from collections.abc import Callable

_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "file_path", "type": "string"},
        {"name": "record_count", "type": "long"},
        {"name": "file_size", "type": "long"},
    ],
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
    ],
}

_STATUS_EXISTING, _STATUS_ADDED, _STATUS_DELETED = 0, 1, 2
_MAX_FORMAT_VERSION = 2


def parse_table_metadata(text: str) -> dict:
    """metadata.json → ``{format_version, current_snapshot_id,
    snapshots: {id: manifest_list_path}}`` with loud validation."""
    obj = json.loads(text)  # JSONDecodeError IS ValueError
    if not isinstance(obj, dict):
        raise ValueError("table metadata is not an object")
    fv = obj.get("format-version")
    if not isinstance(fv, int) or isinstance(fv, bool):
        raise ValueError("format-version is not an integer")
    if fv > _MAX_FORMAT_VERSION:
        raise ValueError(
            f"table requires format-version {fv}; "
            f"this reader implements {_MAX_FORMAT_VERSION}"
        )
    cur = obj.get("current-snapshot-id")
    if not isinstance(cur, int) or isinstance(cur, bool):
        raise ValueError("current-snapshot-id missing")
    snaps = obj.get("snapshots")
    if not isinstance(snaps, list) or not snaps:
        raise ValueError("snapshots list missing")
    out: dict[int, str] = {}
    for s in snaps:
        if not isinstance(s, dict):
            raise ValueError("snapshot entry is not an object")
        sid = s.get("snapshot-id")
        ml = s.get("manifest-list")
        if not isinstance(sid, int) or not isinstance(ml, str) or not ml:
            raise ValueError("snapshot entry missing id/manifest-list")
        out[sid] = ml
    if cur not in out:
        raise ValueError("current-snapshot-id not in the snapshot list")
    return {
        "format_version": fv,
        "current_snapshot_id": cur,
        "snapshots": out,
    }


def snapshot_live_files(
    metadata_text: str,
    fetch: Callable[[str], bytes],
    snapshot_id: int | None = None,
) -> dict:
    """Resolve a snapshot (current by default — pass ``snapshot_id``
    for time travel) to its live file set.

    Returns ``{snapshot_id, n_manifests, n_live, n_deleted_entries,
    live_bytes, live_rows, live}`` with ``live`` a path-sorted
    ``{path: (size, rows)}``.  Manifest-list counts are CROSS-CHECKED
    against the manifests they describe (a stale or truncated manifest
    fails loudly instead of under-reporting the table)."""
    from .avrocf import parse_avro

    meta = parse_table_metadata(metadata_text)
    sid = meta["current_snapshot_id"] if snapshot_id is None else snapshot_id
    ml_path = meta["snapshots"].get(sid)
    if ml_path is None:
        raise ValueError(f"snapshot {sid} not in the table metadata")
    ml = parse_avro(fetch(ml_path))
    live: dict[str, tuple[int, int]] = {}
    n_deleted = 0
    for mf in ml["records"]:
        for k in ("manifest_path", "added_files_count",
                  "existing_files_count", "deleted_files_count"):
            if k not in mf:
                raise ValueError("manifest-list entry missing " + k)
        m = parse_avro(fetch(mf["manifest_path"]))
        counts = {_STATUS_EXISTING: 0, _STATUS_ADDED: 0, _STATUS_DELETED: 0}
        for e in m["records"]:
            st = e.get("status")
            if st not in counts:
                raise ValueError(f"manifest entry bad status {st!r}")
            counts[st] += 1
            path = e.get("file_path")
            if not isinstance(path, str) or not path:
                raise ValueError("manifest entry missing file_path")
            if st == _STATUS_DELETED:
                n_deleted += 1
                live.pop(path, None)
            else:
                size, rows = e.get("file_size"), e.get("record_count")
                if not isinstance(size, int) or not isinstance(rows, int):
                    raise ValueError("manifest entry missing size/rows")
                live[path] = (size, rows)
        if (
            counts[_STATUS_ADDED] != mf["added_files_count"]
            or counts[_STATUS_EXISTING] != mf["existing_files_count"]
            or counts[_STATUS_DELETED] != mf["deleted_files_count"]
        ):
            raise ValueError(
                f"manifest {mf['manifest_path']!r} counts disagree with "
                "its manifest-list entry"
            )
    return {
        "snapshot_id": sid,
        "n_manifests": ml["n_records"],
        "n_live": len(live),
        "n_deleted_entries": n_deleted,
        "live_bytes": sum(s for s, _ in live.values()),
        "live_rows": sum(r for _, r in live.values()),
        "live": dict(sorted(live.items())),
    }


def make_manifest(entries: list[dict]) -> bytes:
    """A manifest Avro file (test/fixture writer, spec-shaped OCF)."""
    from .avrocf import make_avro

    return make_avro(_MANIFEST_SCHEMA, [entries] if entries else [[]])


def make_manifest_list(manifests: list[dict]) -> bytes:
    from .avrocf import make_avro

    return make_avro(
        _MANIFEST_LIST_SCHEMA, [manifests] if manifests else [[]]
    )


def make_table_metadata(
    snapshots: dict[int, str], current: int, format_version: int = 2
) -> str:
    return json.dumps(
        {
            "format-version": format_version,
            "current-snapshot-id": current,
            "snapshots": [
                {"snapshot-id": sid, "manifest-list": ml}
                for sid, ml in sorted(snapshots.items())
            ],
        },
        sort_keys=True,
        separators=(",", ":"),
    )
