"""Roaring bitmaps (operators/roaring.py) and Delta deletion vectors
(operators/deltalog.py DV layer) — round 9.  Format sources:
RoaringFormatSpec + delta-io PROTOCOL.md "Deletion Vectors"; the z85
codec is pinned against the ZeroMQ 32/Z85 spec's reference vector.
"""

from __future__ import annotations

import random
import struct

import pytest

from hainan_big_data_recommend_system_spark.operators.roaring import (
    roaring32_deserialize,
    roaring32_serialize,
    roaring64_deserialize,
    roaring64_serialize,
)


def test_roaring32_roundtrips_all_container_kinds():
    random.seed(1)
    cases = [
        [0], [65535], [0, 1, 2, 3],
        list(range(100, 9000)),                             # run
        sorted(random.sample(range(1 << 16), 5000)),        # bitmap
        sorted(random.sample(range(1 << 16), 200)),         # array
        sorted(set(random.sample(range(1 << 20), 30000))),  # mixed keys
        list(range(0, 1 << 17, 2)),                         # dense even
    ]
    for c in cases:
        blob = roaring32_serialize(c)
        got, used = roaring32_deserialize(blob)
        assert got == c and used == len(blob)


def test_roaring32_hand_pinned_spec_bytes():
    # one ARRAY container under key 3 holding {5, 7}: the exact byte
    # layout from RoaringFormatSpec (no-run cookie, count, descriptor,
    # offset table, sorted u16 values)
    blob = (struct.pack("<II", 12346, 1)
            + struct.pack("<HH", 3, 1)
            + struct.pack("<I", 16)
            + struct.pack("<HH", 5, 7))
    got, used = roaring32_deserialize(blob)
    assert got == [3 * 65536 + 5, 3 * 65536 + 7]
    assert used == len(blob)
    # and the encoder reproduces those bytes exactly
    assert roaring32_serialize(got) == blob


def test_roaring32_quarantines():
    with pytest.raises(ValueError, match="cookie"):
        roaring32_deserialize(b"\x00\x00\x00\x00" * 3)
    good = roaring32_serialize([1, 2, 3])
    with pytest.raises(ValueError):
        roaring32_deserialize(good[:-1])
    # corrupt the offset table (5 array containers → offsets present)
    vals = sorted(k * 65536 + x for k in range(5) for x in (1, 9))
    blob = roaring32_serialize(vals)
    bad = bytearray(blob)
    # offset header starts after cookie(4) + count(4) + 5 descriptors
    struct.pack_into("<I", bad, 8 + 4 * 5, 9999)
    with pytest.raises(ValueError, match="offset"):
        roaring32_deserialize(bytes(bad))


def test_roaring64_roundtrip_and_trailing_bytes():
    random.seed(2)
    vals = sorted(set(
        [random.randrange(1 << 40) for _ in range(3000)]
        + [2**33 + i for i in range(64)] + list(range(50))
    ))
    blob = roaring64_serialize(vals)
    assert roaring64_deserialize(blob) == vals
    with pytest.raises(ValueError, match="trailing"):
        roaring64_deserialize(blob + b"\x00")


# ---------------------------------------------------------------------------
# deletion vectors
# ---------------------------------------------------------------------------

def test_z85_spec_vector():
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        z85_decode,
        z85_encode,
    )

    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"  # ZeroMQ 32/Z85 test vector
    assert z85_decode("HelloWorld") == raw
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("Hell")
    with pytest.raises(ValueError, match="bad character"):
        z85_decode('"""""')


def test_dv_inline_and_file_forms_resolve():
    import uuid

    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_deletion_vector,
        make_dv_descriptor_inline,
        make_dv_file,
        resolve_deletion_vector,
        z85_encode,
    )

    pos = [0, 7, 63, 64, 100_000, 2**33]
    inline = make_dv_descriptor_inline(pos)
    assert resolve_deletion_vector(inline) == sorted(pos)

    dv = make_deletion_vector(pos)
    blob, offs = make_dv_file([b"\x00" * 3, dv])  # second frame
    pdesc = {"storageType": "p", "pathOrInlineDv": "dv.bin",
             "offset": offs[1], "sizeInBytes": len(dv),
             "cardinality": len(pos)}
    assert resolve_deletion_vector(pdesc, lambda p: blob) == sorted(pos)

    uid = uuid.UUID(int=0x1234567890ABCDEF1234567890ABCDEF)
    udesc = {"storageType": "u",
             "pathOrInlineDv": "ab" + z85_encode(uid.bytes),
             "offset": offs[1], "sizeInBytes": len(dv),
             "cardinality": len(pos)}
    seen = {}

    def fetch(path):
        seen["path"] = path
        return blob

    assert resolve_deletion_vector(udesc, fetch) == sorted(pos)
    assert seen["path"] == f"ab/deletion_vector_{uid}.bin"


def test_dv_corruption_quarantines():
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_deletion_vector,
        make_dv_file,
        resolve_deletion_vector,
    )

    pos = list(range(100))
    dv = make_deletion_vector(pos)
    blob, offs = make_dv_file([dv])
    desc = {"storageType": "p", "pathOrInlineDv": "x", "offset": offs[0],
            "sizeInBytes": len(dv), "cardinality": 100}
    bad = bytearray(blob)
    bad[10] ^= 0x40  # flip a payload bit → CRC catches it
    with pytest.raises(ValueError, match="checksum"):
        resolve_deletion_vector(desc, lambda p: bytes(bad))
    with pytest.raises(ValueError, match="cardinality"):
        resolve_deletion_vector(dict(desc, cardinality=99),
                                lambda p: blob)
    with pytest.raises(ValueError, match="version"):
        resolve_deletion_vector(desc, lambda p: b"\x02" + blob[1:])


def test_replay_tracks_dvs_and_checkpoint_carries_them():
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_checkpoint_parquet,
        make_commit,
        make_dv_descriptor_inline,
        make_last_checkpoint,
        replay_delta_log,
        replay_from_checkpoint,
    )

    commits = []
    for c in range(12):
        acts = []
        if c == 0:
            acts.append({"protocol": {"minReaderVersion": 1}})
        if c % 3 == 1:  # later commit attaches a DV to the PRIOR file
            acts.append({"add": {
                "path": f"f{c-1}", "size": 99 + c, "numRecords": 20,
                "deletionVector":
                    make_dv_descriptor_inline([c, c + 1, 19]),
                "dataChange": False,
            }})
        acts.append({"add": {"path": f"f{c}", "size": 100 + c,
                             "numRecords": 20, "dataChange": True}})
        commits.append(make_commit(acts))
    # f9 gets a DV at commit 10, then f9 is REWRITTEN without one
    commits.append(make_commit([
        {"add": {"path": "f9", "size": 500, "numRecords": 30,
                 "dataChange": True}},
    ]))
    full = replay_delta_log(commits)
    assert full["dv_cardinality"] == 3 * 3  # f0, f3, f6 keep theirs
    assert "f9" not in full["deletion_vectors"]  # rewrite cleared it
    assert full["live_rows_after_dv"] == full["live_rows"] - 9
    for ck_v in (5, 9, 11):
        state = replay_delta_log(commits[: ck_v + 1])
        ck = make_checkpoint_parquet(state)
        got = replay_from_checkpoint(
            make_last_checkpoint(ck_v, len(ck)), ck,
            commits[ck_v + 1 :],
        )
        for k in ("live", "deletion_vectors", "dv_cardinality",
                  "live_rows_after_dv"):
            assert got[k] == full[k], (ck_v, k)


def test_bad_dv_descriptor_quarantines():
    from hainan_big_data_recommend_system_spark.operators.deltalog import (
        make_commit,
        replay_delta_log,
    )

    with pytest.raises(ValueError, match="deletionVector"):
        replay_delta_log([make_commit([
            {"add": {"path": "a", "size": 1, "numRecords": 5,
                     "deletionVector": {"storageType": "x"}}},
        ])])
    with pytest.raises(ValueError, match="deletionVector"):
        # cardinality above the file's row count is impossible
        replay_delta_log([make_commit([
            {"add": {"path": "a", "size": 1, "numRecords": 5,
                     "deletionVector": {
                         "storageType": "i", "pathOrInlineDv": "x",
                         "sizeInBytes": 4, "cardinality": 9}}},
        ])])
