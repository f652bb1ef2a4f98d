"""Delta-style transaction-log snapshot replay.

Lakehouse tables (Delta Lake's ``_delta_log``, and in spirit Iceberg's
manifest lists) describe table state as an ordered sequence of JSON
commits; each commit is a set of single-key action lines::

    {"protocol":   {"minReaderVersion": 1}}
    {"metaData":   {"id": "...", "schemaString": "..."}}
    {"add":        {"path": "f0", "size": 123, "numRecords": 10,
                    "dataChange": true}}
    {"remove":     {"path": "f9", "dataChange": true}}
    {"commitInfo": {"operation": "WRITE"}}

The snapshot at version V replays commits 0..V with LAST-WRITER-WINS
per path: an ``add`` (re)materializes the path, a ``remove`` tombstones
it (removing an absent path is legal — Delta writers emit such removes
after conflict resolution), a later re-``add`` resurrects it with the
new file metadata.  ``protocol`` gates reading: a ``minReaderVersion``
above what we implement must fail the whole replay loudly rather than
return a wrong table (the Delta protocol's own forward-compat rule).

Public knowledge: the Delta Lake transaction-log protocol
(github.com/delta-io/delta PROTOCOL.md).  Reference parity: the
reference keeps no table versioning at all (it overwrites csv/pickle
outputs in place, e.g. data_clean.py); versioned snapshot reads are
what that workflow needs first at lake scale.

The quarantine contract matches every other decoder here: malformed
input raises ValueError only (``json.JSONDecodeError`` is a ValueError
subclass), so the Arrow kernels can quarantine per-table.
"""

from __future__ import annotations

import json

_KNOWN_ACTIONS = {"add", "remove", "metaData", "protocol", "commitInfo", "txn"}
_MAX_READER_VERSION = 1


def make_commit(actions: list[dict]) -> str:
    """One commit file's content: newline-joined compact JSON lines."""
    return "\n".join(
        json.dumps(a, sort_keys=True, separators=(",", ":")) for a in actions
    )


def replay_delta_log(commits: list[str]) -> dict:
    """Replay ordered commit contents into the live-file snapshot.

    Returns ``{version, n_live, live_bytes, live_rows,
    n_remove_actions, live}`` with ``live`` a path-sorted
    ``{path: (size, numRecords)}``.
    """
    if not commits:
        raise ValueError("empty delta log")
    live: dict[str, tuple[int, int]] = {}
    tombstones: dict[str, tuple[int, int]] = {}  # path -> (death_v, size)
    n_removes = 0
    for version, text in enumerate(commits):
        if not isinstance(text, str):
            raise ValueError("commit content is not text")
        for ln in text.splitlines():
            if not ln.strip():
                continue
            obj = json.loads(ln)  # JSONDecodeError IS ValueError
            if not isinstance(obj, dict) or len(obj) != 1:
                raise ValueError("action line is not a single-key object")
            ((kind, body),) = obj.items()
            if kind not in _KNOWN_ACTIONS:
                raise ValueError(f"unknown action kind {kind!r}")
            if not isinstance(body, dict):
                raise ValueError(f"{kind} body is not an object")
            if kind == "protocol":
                mrv = body.get("minReaderVersion", 1)
                if not isinstance(mrv, int) or isinstance(mrv, bool):
                    raise ValueError("minReaderVersion is not an integer")
                if mrv > _MAX_READER_VERSION:
                    raise ValueError(
                        f"table requires reader version {mrv}; "
                        f"this reader implements {_MAX_READER_VERSION}"
                    )
            elif kind == "add":
                path = body.get("path")
                size = body.get("size")
                rows = body.get("numRecords")
                if not isinstance(path, str) or not path:
                    raise ValueError("add action missing path")
                for v, what in ((size, "size"), (rows, "numRecords")):
                    if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                        raise ValueError(f"add action bad {what}")
                live[path] = (size, rows)
                tombstones.pop(path, None)  # re-add clears the tombstone
            elif kind == "remove":
                path = body.get("path")
                if not isinstance(path, str) or not path:
                    raise ValueError("remove action missing path")
                n_removes += 1
                prior = live.pop(path, None)  # absent-path removes legal
                if prior is not None:
                    tombstones[path] = (version, prior[0])
    return {
        "version": len(commits) - 1,
        "n_live": len(live),
        "live_bytes": sum(s for s, _ in live.values()),
        "live_rows": sum(r for _, r in live.values()),
        "n_remove_actions": n_removes,
        "live": dict(sorted(live.items())),
        "tombstones": dict(sorted(tombstones.items())),
    }


def vacuum_plan(replay: dict, retention_versions: int) -> dict:
    """Which tombstoned files are safe to physically delete: dead for at
    least ``retention_versions`` commits before the latest (Delta's
    VACUUM retention rule, expressed in versions — the wall-clock form
    maps each version to its commit timestamp).  Time travel back past
    the horizon is forfeited for vacuumed files; inside the horizon it
    keeps working — which is exactly why retention gates deletion."""
    if retention_versions < 0:
        raise ValueError("retention_versions must be >= 0")
    horizon = replay["version"] - retention_versions
    eligible = {
        p: (v, size)
        for p, (v, size) in replay["tombstones"].items()
        if v <= horizon
    }
    return {
        "n_tombstones": len(replay["tombstones"]),
        "n_eligible": len(eligible),
        "bytes_reclaimable": sum(s for _, s in eligible.values()),
        "eligible": dict(sorted(eligible.items())),
    }


def parse_delta_payload(payload: bytes) -> dict:
    """Byte-stream entry point (fuzz surface): commits separated by one
    blank line, UTF-8."""
    text = payload.decode("utf-8", "strict")  # UnicodeDecodeError ⊂ ValueError
    return replay_delta_log(text.split("\n\n"))
