"""zstd decoder (operators/zstd.py) — RFC 8878, interop-gated against
pyarrow's reference codec (the strongest oracle available here: a
NATIVE encoder, both levels and shapes varied) plus the fleet fuzz
contract (malformed input raises ValueError ONLY)."""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pytest

from hainan_big_data_recommend_system_spark.operators.zstd import (
    zstd_decompress,
)


def _cases() -> list[bytes]:
    random.seed(42)
    words = [f"tok{i}" for i in range(500)]
    return [
        b"",
        b"a",
        b"hello world " * 100,                       # 1 seq, raw literals
        bytes(range(256)) * 40,                      # long matches
        os.urandom(5000),                            # raw blocks
        b"\x00" * 100000,                            # RLE block
        ("the quick brown fox " * 997).encode(),
        bytes(random.choices(b"abcd", k=200000)),    # multi-block Huffman
        bytes(random.choices(bytes(range(64)), k=300000)),
        " ".join(random.choices(words, k=100000)).encode(),  # 4-stream
        ("{\"k\":%d}\n" * 5000 % tuple(range(5000))).encode(),
        os.urandom(100) * 3000,                      # cross-block matches
    ]


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_roundtrip_vs_pyarrow_levels(level):
    codec = pa.Codec("zstd", compression_level=level)
    for data in _cases():
        comp = codec.compress(data, asbytes=True)
        assert zstd_decompress(comp) == data


def test_concatenated_and_skippable_frames():
    codec = pa.Codec("zstd")
    a = codec.compress(b"first frame ", asbytes=True)
    b = codec.compress(b"second frame", asbytes=True)
    skip = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(4, "little") + b"xyz"
    assert zstd_decompress(a + skip + b) == b"first frame second frame"


def test_fuzz_valueerror_contract():
    random.seed(7)
    codec = pa.Codec("zstd")
    for _ in range(800):
        blob = os.urandom(random.randint(0, 200))
        try:
            zstd_decompress(blob)
        except ValueError:
            pass
    for _ in range(800):
        data = bytes(random.choices(b"abcdefgh ", k=random.randint(1, 3000)))
        comp = bytearray(codec.compress(data, asbytes=True))
        for _ in range(random.randint(1, 4)):
            comp[random.randrange(len(comp))] ^= 1 << random.randrange(8)
        try:
            zstd_decompress(bytes(comp))
        except ValueError:
            pass
    for _ in range(300):
        comp = codec.compress(b"hello world " * 200, asbytes=True)
        cut = comp[: random.randrange(len(comp))]
        try:
            zstd_decompress(cut)
        except ValueError:
            pass


def test_dictionary_frames_rejected():
    # a frame header declaring a dictionary id must be refused loudly
    payload = (0xFD2FB528).to_bytes(4, "little") + bytes([0x21, 7]) + b"\x01"
    with pytest.raises(ValueError, match="dictionar"):
        zstd_decompress(payload)


def test_content_size_guard():
    # declared content size above the decoder limit is rejected upfront
    codec = pa.Codec("zstd")
    comp = bytearray(codec.compress(b"x" * 1000, asbytes=True))
    with pytest.raises(ValueError):
        zstd_decompress(bytes(comp), max_output=10)


def test_xxh64_spec_vectors():
    from hainan_big_data_recommend_system_spark.operators.xxhash import (
        xxh64,
    )

    # canonical vectors from the xxHash specification
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(b"", 1) == 0xD5AFBA1336A3BE4B
    # >32-byte path (4-lane accumulation + merge)
    assert xxh64(bytes(range(101))) == 0xE99038495F85381E


def test_content_checksum_verified():
    from hainan_big_data_recommend_system_spark.operators.xxhash import (
        xxh64,
    )

    data = b"checksummed content " * 64
    comp = bytearray(pa.Codec("zstd").compress(data, asbytes=True))
    assert not (comp[4] & 0x04)
    comp[4] |= 0x04  # declare a content checksum
    tail = (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    assert zstd_decompress(bytes(comp) + tail) == data
    bad = ((xxh64(data) ^ 1) & 0xFFFFFFFF).to_bytes(4, "little")
    with pytest.raises(ValueError, match="checksum mismatch"):
        zstd_decompress(bytes(comp) + bad)


def test_crafted_huffman_weights_rejected_not_crash():
    """Round-8 self-review #3: weights past the RFC's 11-bit cap must
    raise ValueError before any table allocation."""
    from hainan_big_data_recommend_system_spark.operators.zstd import (
        _huf_build,
    )

    for w in (12, 30, 64, 255):
        with pytest.raises(ValueError):
            _huf_build([w])


def test_multi_frame_offsets_do_not_cross_frames():
    """Round-8 self-review #4: a frame's match offsets may only reach
    back within THAT frame."""
    codec = pa.Codec("zstd")
    a = codec.compress(b"AAAA first frame content", asbytes=True)
    b = codec.compress(b"xy" * 300, asbytes=True)
    # both frames valid -> concatenation decodes fine
    assert zstd_decompress(a + b) == (
        b"AAAA first frame content" + b"xy" * 300
    )


def test_max_output_enforced_inside_blocks():
    """Round-8 self-review #5: the caller's cap binds DURING sequence
    execution, not only between blocks."""
    codec = pa.Codec("zstd")
    comp = codec.compress(b"z" * 2_000_000, asbytes=True)
    with pytest.raises(ValueError, match="limit|large"):
        zstd_decompress(comp, max_output=10_000)


# ---------------------------------------------------------------------------
# dictionary frames (round 9, VERDICT r8 #9)
# ---------------------------------------------------------------------------

def _zstd_cli():
    import shutil

    return shutil.which("zstd")


def _train_and_compress(tmp_path, n_docs=120, picks=(3, 57, 119)):
    import random
    import subprocess

    random.seed(7)
    words = ["alpha", "beta", "gamma", "delta", "query", "spark",
             "lake", "shard", "tensor", "corpus"]
    samples = []
    for i in range(n_docs):
        txt = " ".join(random.choice(words) for _ in range(250))
        body = ('{"level":"INFO","service":"ingest","msg":"'
                + txt + f' doc={i}"}}').encode()
        p = tmp_path / f"s{i:03d}.txt"
        p.write_bytes(body)
        samples.append(p)
    dict_path = tmp_path / "dict.bin"
    subprocess.run(
        [_zstd_cli(), "--train", *map(str, samples), "-o",
         str(dict_path), "-f", "-q"],
        check=True, capture_output=True,
    )
    outs = []
    for i in picks:
        src = tmp_path / f"s{i:03d}.txt"
        dst = tmp_path / f"c{i:03d}.zst"
        subprocess.run(
            [_zstd_cli(), "-9", "-D", str(dict_path), str(src), "-o",
             str(dst), "-f", "-q"],
            check=True, capture_output=True,
        )
        outs.append((dst.read_bytes(), src.read_bytes()))
    return dict_path.read_bytes(), outs


def test_dictionary_frames_match_reference_cli(tmp_path):
    import pytest

    if not _zstd_cli():
        pytest.skip("zstd CLI unavailable")
    from hainan_big_data_recommend_system_spark.operators.zstd import (
        parse_zstd_dictionary,
        zstd_decompress,
    )

    dict_blob, outs = _train_and_compress(tmp_path)
    d = parse_zstd_dictionary(dict_blob)
    assert d["id"] != 0 and len(d["content"]) > 0
    for comp, want in outs:
        assert zstd_decompress(comp, dictionary=d) == want


def test_dictionary_id_mismatch_and_missing_rejected(tmp_path):
    import pytest

    if not _zstd_cli():
        pytest.skip("zstd CLI unavailable")
    from hainan_big_data_recommend_system_spark.operators.zstd import (
        parse_zstd_dictionary,
        zstd_decompress,
    )

    dict_blob, outs = _train_and_compress(tmp_path, picks=(3,))
    comp, _ = outs[0]
    with pytest.raises(ValueError, match="requires dictionary"):
        zstd_decompress(comp)
    d = parse_zstd_dictionary(dict_blob)
    d_wrong = dict(d, id=d["id"] ^ 1)
    with pytest.raises(ValueError, match="wants dictionary"):
        zstd_decompress(comp, dictionary=d_wrong)


def test_dictionary_parse_quarantines():
    import pytest

    from hainan_big_data_recommend_system_spark.operators.zstd import (
        parse_zstd_dictionary,
    )

    with pytest.raises(ValueError, match="magic"):
        parse_zstd_dictionary(b"\x00" * 32)
    with pytest.raises(ValueError, match="too short"):
        parse_zstd_dictionary(b"\x37\xa4\x30\xec")


def test_non_dictionary_frames_unchanged(tmp_path):
    # plain frames still decode with no dictionary argument
    import pyarrow as pa

    from hainan_big_data_recommend_system_spark.operators.zstd import (
        zstd_decompress,
    )

    data = b"plain frame after the dictionary change " * 100
    comp = pa.compress(data, codec="zstd", asbytes=True)
    assert zstd_decompress(comp) == data
